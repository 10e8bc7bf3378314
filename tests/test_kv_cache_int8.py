"""int8 self-attention KV cache (serving approximation).

The cache stores K/V as int8 with per-token scales
(models/whisper.py:init_cache kv_int8 / _quantize_kv); the per-token
scale factors out of the attention contractions exactly, so the ONLY
error source is the 8-bit rounding of K/V.  These tests pin (a) numeric
closeness of decode logits vs the bf16 cache, (b) transcript equality on
tiny random models across greedy/beam/longform (8-bit K/V error is far
below random-logit decision gaps), (c) the guard rails (
unrolled-layout rejection).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig, init_cache
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
def test_int8_cache_matches_bf16_transcripts(num_beams):
    config, params = _make()
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    gen8 = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            kv_cache_int8=True)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    opts = _opts(num_beams=num_beams, return_timestamps=True,
                 condition_on_prev_tokens=True)
    out = gen.generate(mel, opts)
    out8 = gen8.generate(mel, opts)
    np.testing.assert_array_equal(out, out8)


def test_int8_cache_logits_close():
    """Per-step processed decode path: logits with the int8 cache must be
    within 8-bit-rounding distance of the exact cache's."""
    config, params = _make(seed=2)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    gen8 = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            kv_cache_int8=True)
    rng = np.random.default_rng(2)
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
    np.testing.assert_allclose(sc, sc8, atol=2e-2)


def test_int8_cache_rejects_unrolled():
    config, params = _make(seed=3)
    with pytest.raises(ValueError, match="scan_layers"):
        WhisperGenerator(config, params, kv_cache_int8=True, scan_layers=False)
    with pytest.raises(ValueError, match="stacked"):
        init_cache(config, 1, 8, kv_int8=True, stacked=False)


def test_quantize_kv_roundtrip():
    from enhance_cb_whisper_tpu.models.whisper import _quantize_kv

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 5, 4, 8)).astype(np.float32) * 7)
    q, s = _quantize_kv(x)
    assert q.dtype == jnp.int8 and s.shape == (3, 5)
    deq = np.asarray(q, np.float32) * np.asarray(s)[:, :, None, None]
    # per-token max-abs scale: error bounded by scale/2 per element
    err = np.abs(deq - np.asarray(x))
    bound = np.asarray(s)[:, :, None, None] * 0.5 + 1e-6
    assert (err <= bound).all()
    # zero rows stay exactly zero
    q0, s0 = _quantize_kv(jnp.zeros((1, 2, 4, 8)))
    assert np.all(np.asarray(q0) == 0)
