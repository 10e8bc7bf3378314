"""Ancestry (gather-free) beam KV cache vs the legacy gathered cache.

The beam loop normally reorders the whole self-attention KV cache with the
beam permutation every step (HF `_reorder_cache`); the ancestry mode keeps
the K/V rows in place and selects the right physical row inside the
attention contraction via an exactly-one-hot einsum
(models/whisper.py:_ancestry_attention).  The two must be token- and
score-identical — the one-hot selection picks the same dot products a
gathered cache would produce.  `ECW_BEAM_CACHE=gather` forces the legacy
path (decoding/generate.py)."""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny():
    hf_config = transformers.WhisperConfig(
        vocab_size=64, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=3, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=48,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(1)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    return WhisperGenerator(config, params, prompt_buckets=(8, 16))


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=50, prev_sot_token_id=None, eos_token_id=2,
        pad_token_id=0, suppress_tokens=(), begin_suppress_tokens=(),
        max_target_positions=48,
    )
    base.update(kw)
    return GenerationOptions(**base)


def _run(gen, mel, prompt, opts, monkeypatch, mode, **decode_kw):
    monkeypatch.setenv("ECW_BEAM_CACHE", mode)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    seqs, scores, _ = gen._decode_prompted(
        cross_kv, prompt, None, opts, return_timestamps=False, **decode_kw
    )
    return np.asarray(seqs), np.asarray(scores)


@pytest.mark.parametrize("num_beams", [2, 5])
@pytest.mark.parametrize("batch", [1, 3])
def test_ancestry_matches_gathered_cache(tiny, monkeypatch, num_beams, batch):
    rng = np.random.default_rng(42 + num_beams + batch)
    mel = rng.standard_normal((batch, 8, 48), dtype=np.float32)
    prompt = np.full((batch, 1), 3, dtype=np.int64)
    opts = _opts(num_beams=num_beams, max_target_positions=30)

    seqs_a, scores_a = _run(tiny, mel, prompt, opts, monkeypatch, "ancestry")
    seqs_g, scores_g = _run(tiny, mel, prompt, opts, monkeypatch, "gather")

    np.testing.assert_array_equal(seqs_a, seqs_g)
    np.testing.assert_allclose(scores_a, scores_g, rtol=1e-5, atol=1e-6)


def test_ancestry_matches_gathered_cache_sampling(tiny, monkeypatch):
    """Beam-sample (temperature fallback rungs) rides the same loop; the
    same PRNG key must draw the same candidates in both cache layouts."""
    import jax

    rng = np.random.default_rng(7)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
    prompt = np.full((2, 1), 3, dtype=np.int64)
    opts = _opts(num_beams=4, max_target_positions=26)

    kw = dict(temperature=0.7, rng=jax.random.PRNGKey(123))
    seqs_a, _ = _run(tiny, mel, prompt, opts, monkeypatch, "ancestry", **kw)
    seqs_g, _ = _run(tiny, mel, prompt, opts, monkeypatch, "gather", **kw)
    np.testing.assert_array_equal(seqs_a, seqs_g)
