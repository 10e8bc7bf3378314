"""Temperature-fallback ladder parity vs HF, with the quality thresholds
active (compression ratio / logprob) — the decision machinery of
``generate_with_fallback`` (reference src/model/pba_whisper.py:425-442).

The compression-ratio byte width comes from the VOCAB SIZE
(``int(log2(V)/8)+1``), not the per-sequence max token: for real Whisper
(vocab 51865 → width 2) a segment whose tokens are all < 256 must still be
2-byte encoded or the ratio (and the fallback decision) changes.  The fuzz
below runs ours against the installed HF implementation directly, including
exactly that divergent regime.
"""

import dataclasses

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.decoding.generate import _compression_ratio
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


def _hf_compression_ratio(tokens, vocab_size):
    from transformers.models.whisper.generation_whisper import (
        WhisperGenerationMixin,
    )

    return WhisperGenerationMixin._retrieve_compression_ratio(
        torch.tensor(list(tokens)), vocab_size
    )


@pytest.mark.parametrize("vocab_size", [128, 256, 512, 8192, 51865, 51866])
def test_compression_ratio_matches_hf_fuzz(vocab_size):
    rng = np.random.default_rng(vocab_size)
    cases = []
    for _ in range(40):
        n = int(rng.integers(1, 120))
        cases.append(rng.integers(0, vocab_size, n).tolist())
        # the regression regime: all tokens < 256 at a wide vocab (the old
        # per-sequence-max width would shrink to 1 byte here)
        cases.append(rng.integers(0, min(256, vocab_size), n).tolist())
        # highly repetitive (the "junk" signal the threshold exists for)
        tok = int(rng.integers(0, vocab_size))
        cases.append([tok] * n)
    for toks in cases:
        ours = _compression_ratio(toks, vocab_size)
        want = _hf_compression_ratio(toks, vocab_size)
        assert ours == pytest.approx(want, rel=1e-9), (vocab_size, toks[:8])


def test_compression_ratio_width_regression():
    """Tokens all < 256 at vocab 51865: width must be 2 (from vocab), and
    the resulting ratio differs from a width-1 encoding."""
    toks = [17, 42, 42, 42, 99, 101, 101, 200] * 8
    want = _hf_compression_ratio(toks, 51865)
    assert _compression_ratio(toks, 51865) == pytest.approx(want, rel=1e-9)
    import zlib

    width1 = len(bytes(toks)) / len(zlib.compress(bytes(toks)))
    assert abs(width1 - want) > 1e-3  # the old bug was observable here


# ---------------------------------------------------------------------------
# longform ladder decisions vs HF (deterministic single-rung ladder: the
# fallback DECISION and its side effect — disabling condition_on_prev for
# the rest of the utterance — are exercised without sampling divergence)


def _tiny(seed, vocab_size=512, max_len=32):
    hf_config = transformers.WhisperConfig(
        vocab_size=vocab_size, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=max_len,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    return hf, config, params, gen


@pytest.mark.parametrize("seed", [21, 22, 23])
@pytest.mark.parametrize("cr_threshold", [1.0, 1.6, 2.4])
def test_longform_thresholds_match_hf(seed, cr_threshold):
    hf, config, params, gen = _tiny(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 150), dtype=np.float32)

    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 10
    gc.max_length = 32
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            return_timestamps=True, condition_on_prev_tokens=True,
            return_segments=True,
            temperature=(0.0,),
            compression_ratio_threshold=cr_threshold,
            logprob_threshold=-10.0,
        )

    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=400, prev_sot_token_id=None,
        eos_token_id=2, pad_token_id=0,
        suppress_tokens=(), begin_suppress_tokens=(),
        max_initial_timestamp_index=10, num_beams=1,
        return_timestamps=True, condition_on_prev_tokens=True,
        temperature=(0.0,),
        compression_ratio_threshold=cr_threshold,
        logprob_threshold=-10.0,
        max_target_positions=32,
    )
    got = gen.generate(mel, opts, return_segments=True)

    want_seq = [t for t in want["sequences"][0].numpy().tolist() if t != 0]
    got_seq = [t for t in got["sequences"][0].tolist() if t != 0]
    assert got_seq == want_seq, (
        f"seed={seed} cr={cr_threshold}\nours: {got_seq}\nhf:   {want_seq}"
    )
