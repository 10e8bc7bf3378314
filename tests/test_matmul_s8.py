"""Pallas fused s8 matmul+requant kernel vs its XLA reference.

Interpret mode on CPU (same pattern as tests/test_mel_pallas.py); the
on-chip A/B lives in tools/bench_s8_matmul.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from enhance_cb_whisper_tpu.ops.matmul_s8 import (
    matmul_s8_requant,
    matmul_s8_requant_reference,
)


def _rand_case(rng, m, k, n):
    x = rng.integers(-127, 128, (m, k)).astype(np.int8)
    w = rng.integers(-127, 128, (k, n)).astype(np.int8)
    scale = (rng.uniform(0.5, 2.0, (n,)) * 1e-4).astype(np.float32)
    bias = rng.normal(0, 0.5, (n,)).astype(np.float32)
    return x, w, scale, bias


@pytest.mark.parametrize("relu", [True, False])
@pytest.mark.parametrize("m,k,n", [(256, 128, 128), (512, 256, 128)])
def test_matmul_s8_requant_matches_reference(relu, m, k, n):
    rng = np.random.default_rng(0)
    x, w, scale, bias = _rand_case(rng, m, k, n)
    got = matmul_s8_requant(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
        relu=relu, block_m=128, interpret=True,
    )
    want = matmul_s8_requant_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
        relu=relu,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matmul_s8_requant_residual():
    rng = np.random.default_rng(1)
    m, k, n = 256, 128, 128
    x, w, scale, bias = _rand_case(rng, m, k, n)
    r = rng.integers(-127, 128, (m, n)).astype(np.int8)
    rs = (rng.uniform(0.5, 2.0, (n,)) * 1e-3).astype(np.float32)
    got = matmul_s8_requant(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
        residual=jnp.asarray(r), res_scale=jnp.asarray(rs),
        relu=True, block_m=128, interpret=True,
    )
    want = matmul_s8_requant_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
        residual=jnp.asarray(r), res_scale=jnp.asarray(rs), relu=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_matmul_s8_requant_uneven_block():
    # m not divisible by the default block: bm halves until it divides
    rng = np.random.default_rng(2)
    x, w, scale, bias = _rand_case(rng, 24, 128, 128)
    got = matmul_s8_requant(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
        interpret=True,
    )
    want = matmul_s8_requant_reference(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias),
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
