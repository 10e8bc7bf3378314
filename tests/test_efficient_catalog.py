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


# ---------------------------------------------------------------------------
# Two-stage cascade scorer (MaxSim proxy -> exact classifier on the top-K)
# ---------------------------------------------------------------------------


def _cascade_fixture(variant="LE", n_groups=8, seed=3):
    config = EfficientKWSConfig(
        n_layers=L, embedding_dim=D, learn_features=True, proj_mlp=True,
        proj_mlp_units=U, frames_conv=variant == "LEF", resnet_version="resnet-18",
    )
    model = EfficientKWSModel(config)
    rng = np.random.default_rng(seed)
    groups = _groups(rng, n_groups=n_groups, g=4, tk=16)
    utt = rng.standard_normal((1, L, 64, D), dtype=np.float32)
    utt_mask = np.ones((1, L, 64), np.float32)
    variables = model.init(
        jax.random.PRNGKey(0), groups[0]["kwd"], utt, groups[0]["kwd_mask"], utt_mask
    )
    catalog = project_catalog(model, variables, groups, chunk=4)
    return model, variables, groups, catalog, utt, utt_mask


@pytest.mark.parametrize("variant", ["LE", "LEF"])
def test_cascade_full_shortlist_matches_full_scorer(variant):
    """shortlist == N_pad must reproduce the full scorer bit-for-bit (the
    scatter is a permutation, stage 2 is the same compiled chunk_fn)."""
    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_cascade_score_fn

    model, variables, _, catalog, utt, utt_mask = _cascade_fixture(variant)
    full = make_projected_score_fn(model, chunk=4)
    casc = make_cascade_score_fn(model, chunk=4, shortlist=catalog["kwd"].shape[0])
    want = np.asarray(full(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    got = np.asarray(casc(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    # exact, not allclose: stage 2 IS the full scorer's chunk program run on
    # gathered rows, and every per-row op is row-independent (ADVICE r4)
    np.testing.assert_array_equal(got, want)


def test_cascade_planted_match_survives_shortlist():
    """A keyword whose frames are embedded verbatim in the utterance must be
    shortlisted by the MaxSim proxy (projected cosine ~1 beats random noise)
    and carry the full scorer's exact probability; pruned rows are exactly 0;
    at most `shortlist` rows are nonzero."""
    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_cascade_score_fn

    model, variables, groups, catalog, utt, utt_mask = _cascade_fixture("LE")
    # plant keyword 5 (group 1, row 1) inside the utterance at frames 20:36
    planted = 5
    kwd_feats = groups[1]["kwd"][1]  # [L, 16, D]
    groups[1]["kwd_mask"][1] = 1.0
    utt = np.array(utt)
    utt[0, :, 20:36, :] = kwd_feats
    catalog = project_catalog(model, variables, groups, chunk=4)

    full = make_projected_score_fn(model, chunk=4)
    casc = make_cascade_score_fn(model, chunk=4, shortlist=8)
    want = np.asarray(full(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    got = np.asarray(casc(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))

    nonzero = np.flatnonzero(got)
    assert len(nonzero) <= 8
    assert planted in nonzero, "MaxSim proxy failed to shortlist the planted match"
    np.testing.assert_array_equal(got[nonzero], want[nonzero])
    assert np.all(got[np.setdiff1d(np.arange(len(got)), nonzero)] == 0.0)


def test_cascade_sharded_over_model_axis():
    """The cascade must compile and run with the catalog sharded over the
    mesh ``model`` axis (top_k over a sharded proxy vector + row gather +
    scatter under GSPMD), matching the unsharded path: machinery parity at
    shortlist == N_pad (membership-complete, so sharded reduction-order
    changes cannot move marginal rows), plus a planted clear-margin match
    at shortlist < N_pad."""
    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_cascade_score_fn
    from enhance_cb_whisper_tpu.parallel import make_mesh, shard_catalog

    model, variables, groups, _, utt, utt_mask = _cascade_fixture("LE", seed=11)
    planted = 5  # group 1, row 1 — embedded verbatim at frames 20:36
    groups[1]["kwd_mask"][1] = 1.0
    utt = np.array(utt)
    utt[0, :, 20:36, :] = groups[1]["kwd"][1]
    catalog = project_catalog(model, variables, groups, chunk=4)

    full = make_projected_score_fn(model, chunk=4)
    casc_full = make_cascade_score_fn(model, chunk=4, shortlist=catalog["kwd"].shape[0])
    casc_short = make_cascade_score_fn(model, chunk=4, shortlist=8)
    uj, mj = jnp.asarray(utt), jnp.asarray(utt_mask)
    want = np.asarray(full(variables, catalog, uj, mj))

    mesh = make_mesh({"data": 1, "model": 8})
    with mesh:
        arrays = {k: v for k, v in catalog.items() if k in ("kwd", "kwd_mask", "mask")}
        sharded = {**catalog, **shard_catalog(arrays, mesh, axis="model")}
        got_full = np.asarray(casc_full(variables, sharded, uj, mj))
        got_short = np.asarray(casc_short(variables, sharded, uj, mj))

    np.testing.assert_allclose(got_full, want, rtol=1e-4, atol=1e-6)
    nonzero = np.flatnonzero(got_short)
    assert 0 < len(nonzero) <= 8
    assert planted in nonzero, "sharded MaxSim proxy failed to shortlist the planted match"
    np.testing.assert_allclose(got_short[nonzero], want[nonzero], rtol=1e-4, atol=1e-6)


def test_cascade_int8_stage2_matches_full_int8():
    """Cascade with the int8 classifier: shortlisted rows must equal the full
    int8 scorer's probabilities (same quantized chunk_fn)."""
    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_cascade_score_fn
    from enhance_cb_whisper_tpu.efficient_kws.model import masked_sims
    from enhance_cb_whisper_tpu.models.quant import (
        calibrate_act_scales,
        quantize_efficient_classifier,
    )

    model, variables, _, catalog, utt, utt_mask = _cascade_fixture("LEF", seed=7)
    qparams = quantize_efficient_classifier(variables, model.config.resnet_config())
    utt_p, utt_mask_p = model.apply(
        variables, utt, utt_mask, train=False, method=EfficientKWSModel.project
    )
    sims = masked_sims(catalog["kwd"][:4], utt_p, catalog["kwd_mask"][:4], utt_mask_p)
    scales = calibrate_act_scales(model.config.resnet_config(), qparams, sims)["act_scales"]

    kw = dict(quantized_params=jax.device_put(qparams), act_scales=scales)
    full = make_projected_score_fn(model, chunk=4, **kw)
    casc = make_cascade_score_fn(model, chunk=4, shortlist=8, **kw)
    want = np.asarray(full(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    got = np.asarray(casc(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    nonzero = np.flatnonzero(got)
    assert 0 < len(nonzero) <= 8
    np.testing.assert_array_equal(got[nonzero], want[nonzero])


def test_fast_proxy_matches_exact_proxy_to_bf16_tolerance():
    """maxsim_proxy_fast (bf16 einsum, pre-normalized utterance) must agree
    with the precision='highest' f32 proxy to bf16 rounding — same reduction
    structure, only the einsum precision differs."""
    from enhance_cb_whisper_tpu.efficient_kws.catalog import (
        maxsim_proxy,
        maxsim_proxy_fast,
    )
    from enhance_cb_whisper_tpu.efficient_kws.model import _safe_normalize

    rng = np.random.default_rng(11)
    c, tk, tu = 16, 12, 40
    kwd = jnp.asarray(rng.standard_normal((c, L, tk, U)), jnp.float32)
    utt = jnp.asarray(rng.standard_normal((1, L, tu, U)), jnp.float32)
    kwd_mask = jnp.asarray((rng.random((c, L, tk)) > 0.2).astype(np.float32))
    utt_mask = jnp.asarray((rng.random((1, L, tu)) > 0.1).astype(np.float32))

    exact = np.asarray(maxsim_proxy(kwd, utt, kwd_mask, utt_mask))
    utt_n = _safe_normalize(utt, 1e-6)[0]
    fast = np.asarray(maxsim_proxy_fast(kwd, utt_n, kwd_mask, utt_mask))
    np.testing.assert_allclose(fast, exact, atol=2e-2, rtol=0)
    # ranking of well-separated scores is preserved
    order_e = np.argsort(exact)[::-1]
    order_f = np.argsort(fast)[::-1]
    assert order_e[0] == order_f[0]


def test_cascade_proxy_dtype_float32_planted_match():
    """proxy_dtype='float32' keeps the legacy exact-sims stage 1: planted
    match survives, shortlisted rows exactly match the full scorer."""
    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_cascade_score_fn

    model, variables, groups, catalog, utt, utt_mask = _cascade_fixture("LE")
    planted = 5
    kwd_feats = groups[1]["kwd"][1]
    groups[1]["kwd_mask"][1] = 1.0
    utt = np.array(utt)
    utt[0, :, 20:36, :] = kwd_feats
    catalog = project_catalog(model, variables, groups, chunk=4)

    full = make_projected_score_fn(model, chunk=4)
    casc = make_cascade_score_fn(model, chunk=4, shortlist=8,
                                 proxy_dtype="float32")
    want = np.asarray(full(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    got = np.asarray(casc(variables, catalog, jnp.asarray(utt), jnp.asarray(utt_mask)))
    nonzero = np.flatnonzero(got)
    assert planted in nonzero
    np.testing.assert_array_equal(got[nonzero], want[nonzero])


def test_cascade_rejects_bad_shortlist():
    from enhance_cb_whisper_tpu.efficient_kws.catalog import make_cascade_score_fn

    model, *_ = _cascade_fixture("LE", n_groups=2)
    with pytest.raises(AssertionError, match="multiple of chunk"):
        make_cascade_score_fn(model, chunk=4, shortlist=6)
