"""Tests for cosine-similarity primitives vs a torch re-derivation of the
reference math (src/efficient_kws/model.py:210-218, src/data/dataset.py:97)."""

import numpy as np
import torch

from enhance_cb_whisper_tpu.ops import cossim_matmul, l2_normalize, sim_matrix


def _torch_sim_matrix(a, b, eps=1e-6):
    a_n = a.norm(dim=-1)[..., None]
    b_n = b.norm(dim=-1)[..., None]
    a_norm = a / torch.clamp(a_n, min=eps)
    b_norm = b / torch.clamp(b_n, min=eps)
    return torch.matmul(a_norm, b_norm.transpose(-2, -1))


def test_sim_matrix_matches_reference_math():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((4, 9, 16), dtype=np.float32)
    b = rng.standard_normal((4, 13, 16), dtype=np.float32)
    got = np.asarray(sim_matrix(a, b))
    want = _torch_sim_matrix(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_sim_matrix_zero_rows_are_stable():
    a = np.zeros((1, 3, 8), dtype=np.float32)
    b = np.ones((1, 5, 8), dtype=np.float32)
    out = np.asarray(sim_matrix(a, b))
    assert np.all(np.isfinite(out))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_cossim_matmul_on_prenormalized_inputs():
    rng = np.random.default_rng(1)
    kwd = rng.standard_normal((12, 7, 32), dtype=np.float32)
    utt = rng.standard_normal((12, 50, 32), dtype=np.float32)
    kwd_n = np.asarray(l2_normalize(kwd))
    utt_n = np.asarray(l2_normalize(utt))
    got = np.asarray(cossim_matmul(kwd_n, utt_n))
    want = np.einsum("lkd,lud->lku", kwd_n, utt_n)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.max() <= 1.0 + 1e-5


def test_l2_normalize_unit_norm():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((5, 6, 24), dtype=np.float32)
    n = np.linalg.norm(np.asarray(l2_normalize(x)), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)


def test_l2_normalize_zero_vector_grad_finite():
    """The eps clamp must keep the GRADIENT finite at exactly-zero rows
    (zero-padded frames): jnp.linalg.norm backprops nan there even under a
    maximum clamp (CLAUDE.md) — the squared-norm clamp does not."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((3, 4)).at[0, 0].set(1.0)  # rows 1-2 exactly zero

    def loss(x):
        return jnp.sum(l2_normalize(x, eps=1e-6) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all()
    # value parity with the naive max(norm, eps) form
    naive = np.asarray(x) / np.maximum(
        np.linalg.norm(np.asarray(x), axis=-1, keepdims=True), 1e-6
    )
    np.testing.assert_allclose(np.asarray(l2_normalize(x, eps=1e-6)), naive,
                               rtol=1e-6)
