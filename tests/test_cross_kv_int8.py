"""int8 cross-attention K/V (serving approximation).

``precompute_cross_kv(int8=True)`` stores the per-segment cross K/V as
int8 with per-(layer, row, token) scales; the scale factors out of the
attention contractions exactly (models/whisper.py:_attention), so the
ONLY error source is the 8-bit rounding of K/V.  Halves the dominant
per-step cross-K/V slab read (1500 encoder frames × D × 2 × L per batch
item per decode step at flagship dims).  These tests pin (a) transcript
equality on tiny random models across greedy/beam/longform (8-bit K/V
error is far below random-logit decision gaps), (b) the exactness of the
scale factoring (int8 codes + scales attend identically to their
dequantized floats), (c) fallback-ladder row slicing of the scale
leaves, (d) the guard rails (unrolled layout rejected).

Reference behavior being approximated: the cross-attention K/V of
src/model/pba_whisper.py's inherited HF decoder (encoder_attn K/V are
position-independent per segment).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import (
    WhisperConfig,
    _attention,
    precompute_cross_kv,
)
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


def _make(seed=0):
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=3, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    return config, params


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=100, prev_sot_token_id=101, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_initial_timestamp_index=10, max_target_positions=40,
    )
    base.update(kw)
    return GenerationOptions(**base)


@pytest.mark.parametrize("num_beams", [1, 3])
def test_int8_cross_kv_matches_transcripts(num_beams):
    config, params = _make()
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    gen8 = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            cross_kv_int8=True)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    opts = _opts(num_beams=num_beams, return_timestamps=True,
                 condition_on_prev_tokens=True)
    out = gen.generate(mel, opts)
    out8 = gen8.generate(mel, opts)
    np.testing.assert_array_equal(out, out8)


def test_int8_cross_kv_with_int8_self_cache():
    """The two serving approximations compose (the beam-serving config).

    Short prompted decode (the test_int8_cache_logits_close protocol):
    with BOTH approximations on, quantization noise doubles, so a full
    448-token longform beam decode on a RANDOM model can legitimately
    flip a near-tie late in the sequence (observed: a 2-token length
    drift at step ~100) — real-corpus qualification is
    tools/validate_approx.py's job.  Here we pin the mechanism: short
    sequences identical, scores within stacked-8-bit tolerance."""
    config, params = _make(seed=4)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    gen8 = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            cross_kv_int8=True, kv_cache_int8=True)
    rng = np.random.default_rng(4)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    prompt = np.asarray([[3, 9, 5, 7]], np.int64)
    opts = _opts(num_beams=1, max_target_positions=24)

    def run(g):
        ckv = g._cross_kv_fn(g._encode(jnp.asarray(mel)))
        seqs, scores, _ = g._decode_prompted(
            ckv, prompt, None, opts, return_timestamps=False
        )
        return np.asarray(seqs), np.asarray(scores)

    s, sc = run(gen)
    s8, sc8 = run(gen8)
    np.testing.assert_array_equal(s, s8)
    np.testing.assert_allclose(sc, sc8, atol=5e-2)


def test_int8_cross_kv_scale_factoring_exact():
    """int8 codes + per-token scales must attend EXACTLY like their
    dequantized floats: the scale multiplies scores before the softmax on
    the K side and the softmax weights on the V side — same reals, so any
    difference is pure f32 evaluation-order noise."""
    rng = np.random.default_rng(0)
    B, Tq, Tk, H, Dh = 2, 3, 7, 4, 8
    q = jnp.asarray(rng.standard_normal((B, Tq, H, Dh)).astype(np.float32))
    k8 = jnp.asarray(rng.integers(-127, 128, (B, Tk, H, Dh)).astype(np.int8))
    v8 = jnp.asarray(rng.integers(-127, 128, (B, Tk, H, Dh)).astype(np.int8))
    ks = jnp.asarray(rng.uniform(0.01, 0.1, (B, Tk)).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.01, 0.1, (B, Tk)).astype(np.float32))

    out8 = _attention(q, k8, v8, k_scale=ks, v_scale=vs)
    k_f = k8.astype(jnp.float32) * ks[:, :, None, None]
    v_f = v8.astype(jnp.float32) * vs[:, :, None, None]
    out_f = _attention(q, k_f, v_f)
    np.testing.assert_allclose(
        np.asarray(out8), np.asarray(out_f), rtol=1e-5, atol=1e-5
    )


def test_precompute_cross_kv_int8_roundtrip():
    """The stacked int8 cross K/V dequantizes back to the exact layout
    within the per-token scale bound."""
    config, params = _make(seed=5)
    from enhance_cb_whisper_tpu.models.whisper import stack_whisper_params

    sp = stack_whisper_params(jax.tree.map(jnp.asarray, params))
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal((2, 12, 32)).astype(np.float32))
    exact = precompute_cross_kv(sp, enc, config)
    q8 = precompute_cross_kv(sp, enc, config, int8=True)
    assert q8["k"].dtype == jnp.int8 and q8["v"].dtype == jnp.int8
    l, b, t = q8["k_scale"].shape
    assert (l, b, t) == exact["k"].shape[:3]
    for name in ("k", "v"):
        deq = np.asarray(q8[name], np.float32) * np.asarray(
            q8[f"{name}_scale"]
        )[:, :, :, None, None]
        err = np.abs(deq - np.asarray(exact[name], np.float32))
        bound = np.asarray(q8[f"{name}_scale"])[:, :, :, None, None] * 0.5 + 1e-6
        assert (err <= bound).all()


def test_int8_cross_kv_fallback_row_slicing():
    """_take_rows must slice the [L, B, T] scale leaves at their batch
    axis (axis 1) alongside the rank-5 K/V leaves."""
    config, params = _make(seed=6)
    gen8 = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            cross_kv_int8=True)
    rng = np.random.default_rng(6)
    mel = rng.standard_normal((3, 8, 48), dtype=np.float32)
    ckv = gen8._cross_kv_fn(gen8._encode(jnp.asarray(mel)))
    rows = [2, 0]
    sub = gen8._take_rows(ckv, rows)
    for name in ("k", "v", "k_scale", "v_scale"):
        np.testing.assert_array_equal(
            np.asarray(sub[name])[:, 0], np.asarray(ckv[name])[:, 2]
        )
        np.testing.assert_array_equal(
            np.asarray(sub[name])[:, 1], np.asarray(ckv[name])[:, 0]
        )


def test_int8_cross_kv_rejects_unrolled():
    config, params = _make(seed=7)
    with pytest.raises(ValueError, match="scan_layers"):
        WhisperGenerator(config, params, cross_kv_int8=True, scan_layers=False)
    with pytest.raises(ValueError, match="stacked"):
        precompute_cross_kv(
            jax.tree.map(jnp.asarray, params),
            jnp.zeros((1, 4, 32)), config, int8=True,
        )
