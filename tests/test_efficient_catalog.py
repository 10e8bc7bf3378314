"""Pre-projected catalog scoring must equal the direct L/LE/LEF forward,
and shard cleanly over the mesh model axis (the 100k open-vocab path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhance_cb_whisper_tpu.efficient_kws import EfficientKWSConfig, EfficientKWSModel
from enhance_cb_whisper_tpu.efficient_kws.catalog import (
    make_projected_score_fn,
    project_catalog,
)

L, D, U = 2, 16, 8


def _groups(rng, n_groups=2, g=4, tk=16):
    out = []
    for _ in range(n_groups):
        out.append(
            {
                "kwd": rng.standard_normal((g, L, tk, D), dtype=np.float32),
                "kwd_mask": (rng.random((g, L, tk)) > 0.1).astype(np.float32),
                "mask": np.ones((g,), np.float32),
            }
        )
    return out


@pytest.mark.parametrize("variant", ["LE", "LEF"])
def test_projected_scoring_matches_direct(variant):
    config = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, frames_conv=variant == "LEF", resnet_version="resnet-18",
    )
    model = EfficientKWSModel(config)
    rng = np.random.default_rng(0)
    groups = _groups(rng, tk=32)
    utt = rng.standard_normal((1, L, 64, D), dtype=np.float32)
    utt_mask = np.ones((1, L, 64), np.float32)

    variables = model.init(
        jax.random.PRNGKey(0), groups[0]["kwd"], utt, groups[0]["kwd_mask"], utt_mask
    )

    catalog = project_catalog(model, variables, groups, chunk=4)
    score = make_projected_score_fn(model, chunk=4)
    probs = np.asarray(score(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))

    # direct path per group
    want = []
    for g in groups:
        logits, _ = model.apply(
            variables, g["kwd"], utt, kwd_mask=g["kwd_mask"], utt_mask=utt_mask
        )
        want.append(np.asarray(jax.nn.softmax(logits, -1))[:, 1])
    want = np.concatenate(want)
    np.testing.assert_allclose(probs[: len(want)], want, rtol=1e-4, atol=1e-5)


def test_projected_catalog_sharded_over_model_axis():
    from enhance_cb_whisper_tpu.parallel import make_mesh, shard_catalog

    config = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, resnet_version="resnet-18",
    )
    model = EfficientKWSModel(config)
    rng = np.random.default_rng(1)
    groups = _groups(rng, n_groups=4, g=4, tk=16)
    utt = rng.standard_normal((1, L, 32, D), dtype=np.float32)
    utt_mask = np.ones((1, L, 32), np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), groups[0]["kwd"], utt, groups[0]["kwd_mask"], utt_mask
    )
    catalog = project_catalog(model, variables, groups, chunk=4)
    score = make_projected_score_fn(model, chunk=4)
    want = np.asarray(score(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))

    mesh = make_mesh({"data": 1, "model": 8})
    with mesh:
        arrays = {k: v for k, v in catalog.items() if k in ("kwd", "kwd_mask", "mask")}
        sharded = {**catalog, **shard_catalog(arrays, mesh, axis="model")}
        got = np.asarray(score(variables, sharded, jnp.asarray(utt), jnp.asarray(utt_mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_projected_score_fn_rejects_unpadded_catalog():
    """A catalog whose row count is not a chunk multiple must fail with the
    contract error, not a cryptic reshape TypeError."""
    import jax.numpy as jnp
    import pytest

    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_projected_score_fn
    from enhance_cb_whisper_tpu.efficient_kws.model import (
        EfficientKWSConfig,
        EfficientKWSModel,
    )

    cfg = EfficientKWSConfig(n_layers=2, embedding_dim=16, learn_features=True,
                             proj_mlp=True, resnet_version="resnet-18")
    model = EfficientKWSModel(cfg)
    rng = np.random.default_rng(0)
    utt = rng.standard_normal((1, 2, 40, 16)).astype(np.float32)
    variables = model.init(
        jax.random.PRNGKey(0),
        rng.standard_normal((1, 2, 10, 16)).astype(np.float32), utt,
        np.ones((1, 2, 10), np.float32), np.ones((1, 2, 40), np.float32),
    )
    catalog = {
        "kwd": jnp.zeros((10, 2, 10, 64)),  # 10 rows, chunk 4 -> not a multiple
        "kwd_mask": jnp.ones((10, 2, 10)),
        "mask": jnp.ones((10,)),
    }
    score = make_projected_score_fn(model, chunk=4)
    with pytest.raises(AssertionError, match="multiple of chunk"):
        score(variables, catalog, jnp.asarray(utt), jnp.ones((1, 2, 40)))
