"""Staged KV-cache writes (serving mode, round 5).

The attention dot forces the decode KV cache into a position-on-lanes
layout where every single-token in-carry dynamic-update-slice pays a
full-slab read-modify-write — measured at 47% of beam-decode device time
at whisper-medium (docs/PERF.md round-5 attribution, r5_med_beam5
profile).  ``kv_staging=W`` keeps the last ≤W tokens in a small window
buffer that the attention reads as an extra score block
(models/whisper.py:_attention_split/_ancestry_attention_split) and
flushes into the big slab once every W steps.

Exactness contract: for f32/bf16 caches the attended key set is identical
to the unstaged path — only the softmax concat order differs (f32
rounding level), so transcripts must match exactly and scores to ~1e-5.
With ``kv_cache_int8`` the staged tokens are attended unquantized until
the flush (at most MORE accurate); transcripts still match on tiny random
models whose logit decision gaps dwarf 8-bit noise.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import (
    WhisperConfig,
    decoder_forward,
    flush_staging,
    init_cache,
    init_whisper_params,
    precompute_cross_kv,
    stack_whisper_params,
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


# W=4 forces many flushes in a 40-position decode; W=32 exercises the
# never-flushes path (window larger than the whole generation)
@pytest.mark.parametrize("num_beams", [1, 3])
@pytest.mark.parametrize("window", [4, 32])
def test_staged_matches_unstaged_transcripts(num_beams, window):
    config, params = _make()
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    gens = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            kv_staging=window)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    opts = _opts(num_beams=num_beams, return_timestamps=True,
                 condition_on_prev_tokens=True)
    out = gen.generate(mel, opts)
    outs = gens.generate(mel, opts)
    np.testing.assert_array_equal(out, outs)


@pytest.mark.parametrize("num_beams", [1, 3])
def test_staged_int8_matches_int8_transcripts(num_beams):
    config, params = _make(seed=4)
    gen8 = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            kv_cache_int8=True)
    gen8s = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                             kv_cache_int8=True, kv_staging=4)
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    opts = _opts(num_beams=num_beams, return_timestamps=True,
                 condition_on_prev_tokens=True)
    np.testing.assert_array_equal(gen8.generate(mel, opts),
                                  gen8s.generate(mel, opts))


def test_staged_scores_close():
    config, params = _make(seed=2)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    gens = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32),
                            kv_staging=4)
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
    ss, scs = run(gens)
    np.testing.assert_array_equal(s, ss)
    # identical exponential set; only softmax concat order differs (f32)
    np.testing.assert_allclose(sc, scs, atol=1e-4)


@pytest.mark.parametrize("kv_int8", [False, True])
def test_staged_decoder_forward_state_and_logits(kv_int8):
    """Step the raw decoder loop and pin (a) per-step logits against the
    unstaged path and (b) the flushed big-slab contents after each flush
    boundary (exact for f32; int8 codes equal because the flush quantizes
    the same bf16 values per token with the same per-token scales)."""
    config = WhisperConfig(
        vocab_size=64, num_mel_bins=8, d_model=16,
        encoder_layers=1, encoder_attention_heads=2,
        decoder_layers=2, decoder_attention_heads=2,
        encoder_ffn_dim=32, decoder_ffn_dim=32,
        max_source_positions=12, max_target_positions=24,
    )
    rng = np.random.default_rng(0)
    params = stack_whisper_params(init_whisper_params(rng, config))
    enc = jnp.asarray(rng.standard_normal((2, 12, 16), dtype=np.float32))
    ckv = precompute_cross_kv(params, enc, config)
    W, max_len = 4, 24

    cache = init_cache(config, 2, max_len, stacked=True, kv_int8=kv_int8)
    cache_s = init_cache(config, 2, max_len, stacked=True, kv_int8=kv_int8,
                         staging_window=W)

    # prompt prefill (multi-token path writes the big slab directly)
    prompt = jnp.asarray(rng.integers(4, 60, (2, 3)), jnp.int32)
    logits, cache = decoder_forward(params, prompt, ckv, config, cache=cache)
    logits_s, cache_s = decoder_forward(params, prompt, ckv, config,
                                        cache=cache_s)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits_s),
                               rtol=1e-6, atol=1e-6)
    cache["index"] = jnp.asarray(2, jnp.int32)  # re-feed the last token
    cache_s["index"] = jnp.asarray(2, jnp.int32)
    cache_s["base"] = jnp.asarray(2, jnp.int32)

    tok = prompt[:, -1:]
    # int8: the staged path attends the window tokens UNQUANTIZED until the
    # flush (at most more accurate), so logits differ by 8-bit noise; f32
    # paths attend the identical key set (concat-order rounding only)
    tol = dict(atol=5e-2, rtol=0) if kv_int8 else dict(rtol=1e-5, atol=1e-5)
    for step in range(12):
        logits, cache = decoder_forward(params, tok, ckv, config, cache=cache)
        logits_s, cache_s = decoder_forward(params, tok, ckv, config,
                                            cache=cache_s)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(logits_s),
            err_msg=f"step {step}", **tol,
        )
        tok = jnp.argmax(logits[:, -1:], axis=-1).astype(jnp.int32)
        if (step + 1) % W == 0:
            # the flush is the decode loop's job (beam.py window bodies);
            # raw decoder_forward callers flush at the window boundary
            cache_s = flush_staging(cache_s)

        base = int(cache_s["base"])
        assert base == 2 + ((step + 1) // W) * W  # advances only on flush
        if kv_int8:
            np.testing.assert_allclose(
                np.asarray(cache["layers"]["k"][:, :, :base]),
                np.asarray(cache_s["layers"]["k"][:, :, :base]),
                atol=1,  # int8 codes: scale comes from bf16-roundtripped kv
            )
            np.testing.assert_allclose(
                np.asarray(cache["layers"]["k_scale"][:, :, :base]),
                np.asarray(cache_s["layers"]["k_scale"][:, :, :base]),
                rtol=1e-2,
            )
        else:
            np.testing.assert_allclose(
                np.asarray(cache["layers"]["k"][:, :, :base]),
                np.asarray(cache_s["layers"]["k"][:, :, :base]),
                rtol=1e-5, atol=1e-6,
            )


def test_staging_guards():
    config, params = _make(seed=3)
    with pytest.raises(ValueError, match="scan_layers"):
        WhisperGenerator(config, params, kv_staging=8, scan_layers=False)
    with pytest.raises(ValueError, match="stacked"):
        init_cache(config, 1, 8, staging_window=4, stacked=False)
    with pytest.raises(ValueError, match="staging_window"):
        init_cache(config, 1, 8, staging_window=8, stacked=True)
