"""Catalog scoring parity: the one-launch batched path must reproduce the
reference's per-keyword loop (matmul → torchvision resize → ResNet,
src/data/dataset.py:311-317, src/model/cb_whisper.py:189-210)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from enhance_cb_whisper_tpu.catalog import (
    KeywordCatalog,
    device_put_catalog,
    make_catalog_score_fn,
)
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.kws import KWSModel

N_LAYERS = 3
DIM = 16
OUT = (32, 48)


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    keywords = [f"kw{i}" for i in range(7)]
    stacks = [
        _norm(rng.standard_normal((N_LAYERS, rng.integers(2, 9), DIM), dtype=np.float32))
        for _ in range(6)
    ]
    stacks.append(None)  # ghost keyword
    catalog = KeywordCatalog.from_arrays(keywords, stacks, group_size=4)

    cfg = ResNetConfig(
        num_channels=N_LAYERS,
        embedding_size=8,
        hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1),
        num_labels=2,
    )
    model = KWSModel(cfg)
    dummy = np.zeros((1, N_LAYERS, *OUT), dtype=np.float32)
    variables = model.init(jax.random.PRNGKey(0), dummy)
    return catalog, stacks, model, variables


def _reference_probs(stacks, utt, model, variables):
    """Reference-style loop: torch matmul + F.interpolate per keyword."""
    probs = []
    utt_t = torch.from_numpy(utt)
    for s in stacks:
        if s is None:
            probs.append(0.0)
            continue
        sim = torch.matmul(torch.from_numpy(s), utt_t.transpose(1, 2))  # [L, Tk, Tu]
        resized = F.interpolate(
            sim[None], size=OUT, mode="bilinear", align_corners=False, antialias=False
        )[0]
        out = model.apply(variables, np.asarray(resized)[None])
        p = jax.nn.softmax(out.logits, axis=-1)[0, 1]
        probs.append(float(p))
    return np.asarray(probs)


def test_catalog_scores_match_reference_loop(setup):
    catalog, stacks, model, variables = setup
    rng = np.random.default_rng(1)
    t_u = 37
    utt = _norm(rng.standard_normal((N_LAYERS, t_u, DIM), dtype=np.float32))

    want = _reference_probs(stacks, utt, model, variables)

    def kws_apply(vars_, images):
        return model.apply(vars_, images).logits

    score_fn = make_catalog_score_fn(kws_apply, out_size=OUT, chunk=4)
    catalog_dev = device_put_catalog(catalog, out_h=OUT[0], chunk=4)

    from enhance_cb_whisper_tpu.ops.resize import resize_matrix

    utt_w = jnp.asarray(resize_matrix(t_u, OUT[1], antialias=False))
    probs, logits = score_fn(variables, catalog_dev, jnp.asarray(utt), utt_w)
    probs = np.asarray(probs)
    assert logits.shape[-1] == 2

    got = probs[: len(stacks)]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_catalog_padding_and_masks(setup):
    catalog, stacks, _, _ = setup
    assert catalog.num_keywords == 7
    assert catalog.mask[6] == 0.0  # ghost
    assert catalog.mask[: 6].all()
    assert catalog.num_groups() == 2
    assert catalog.group_keywords(1) == ["kw4", "kw5", "kw6"]


def test_catalog_from_bin_dir(tmp_path, setup):
    _, stacks, _, _ = setup
    from enhance_cb_whisper_tpu.catalog import save_hidden_states

    for i, s in enumerate(stacks):
        if s is not None:
            save_hidden_states(str(tmp_path / f"{i}.npy"), s)
    cat = KeywordCatalog.from_bin_dir(
        [f"kw{i}" for i in range(7)], str(tmp_path), group_size=4
    )
    assert cat.num_keywords == 7
    assert cat.mask[6] == 0.0
    np.testing.assert_allclose(cat.hs[2, :, : stacks[2].shape[1]], stacks[2], rtol=1e-6)
