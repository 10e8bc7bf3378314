"""Temperature-fallback ladder behavior when fallback ACTUALLY triggers.

The older fallback tests never tripped the ladder (random-token streams
EXPAND under zlib, so every ratio sat below the tested thresholds).  These
tests force failures and pin the HF `generate_with_fallback` semantics the
round-3 review found divergent (docs/PARITY.md #15):

* per-segment conditioning rule `condition_on_prev and temperature < 0.5`
  — a failing temp-0 segment keeps conditioning ON (the old code turned it
  off for the rest of the utterance);
* eos-inclusive compression ratio and avg-logprob denominator;
* avg logprob from PROCESSED scores (HF `_retrieve_avg_logprobs`);
* per-row retries: rows that pass keep their earlier (deterministic)
  result while failing rows re-decode at higher temperature.
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
    return hf, gen


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=400, prev_sot_token_id=None,
        eos_token_id=2, pad_token_id=0,
        suppress_tokens=(), begin_suppress_tokens=(),
        max_initial_timestamp_index=10, num_beams=1,
        return_timestamps=True, condition_on_prev_tokens=True,
        max_target_positions=32,
    )
    base.update(kw)
    return GenerationOptions(**base)


def _hf_generate(hf, mel, **kw):
    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 400
    gc.max_initial_timestamp_index = 10
    gc.max_length = 32
    with torch.no_grad():
        return hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            return_timestamps=True, condition_on_prev_tokens=True,
            return_segments=True, **kw,
        )


def _strip(seq):
    return [int(t) for t in np.asarray(seq).tolist() if t != 0]


@pytest.mark.parametrize("seed", [31, 32, 33])
def test_always_fallback_single_rung_matches_hf(seed):
    """cr_threshold=0.5 trips on EVERY segment (random tokens expand under
    zlib → ratio ≈0.8-1.0 > 0.5).  Single-rung ladder keeps the temp-0
    result, and — per HF — conditioning stays ON (temperature 0 < 0.5);
    the old implementation disabled conditioning after the first failing
    segment and diverged from the second segment onward."""
    hf, gen = _tiny(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 150), dtype=np.float32)

    want = _hf_generate(hf, mel, temperature=(0.0,),
                        compression_ratio_threshold=0.5)
    opts = _opts(temperature=(0.0,), compression_ratio_threshold=0.5)
    got = gen.generate(mel, opts, return_segments=True)

    assert _strip(got["sequences"][0]) == _strip(want["sequences"][0])


@pytest.mark.parametrize("seed", [41, 42])
def test_logprob_always_fallback_matches_hf(seed):
    """logprob_threshold=0.0 is above any real avg logprob → every segment
    falls back; exercises the avg-logprob path end-to-end."""
    hf, gen = _tiny(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 120), dtype=np.float32)

    want = _hf_generate(hf, mel, temperature=(0.0,), logprob_threshold=0.0)
    opts = _opts(temperature=(0.0,), logprob_threshold=0.0)
    got = gen.generate(mel, opts, return_segments=True)

    assert _strip(got["sequences"][0]) == _strip(want["sequences"][0])


def _hf_avg_logprob_shortform(hf, mel, max_len=32):
    """HF greedy shortform with scores, reduced by _retrieve_avg_logprobs."""
    from transformers.models.whisper.generation_whisper import (
        WhisperGenerationMixin,
    )

    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    with torch.no_grad():
        out = hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            max_length=max_len, return_dict_in_generate=True,
            output_scores=True, return_timestamps=False,
        )
    seq = out.sequences[0]
    # strip the decoder prompt (everything generate_with_fallback sees is
    # prompt-relative) and trailing pads, eos kept (HF keeps it for avg lp)
    n_prompt = seq.shape[0] - len(out.scores)
    seek = seq[n_prompt:]
    if seek.numel() and seek[-1] == hf.config.pad_token_id:
        n_pad = int((seek == hf.config.pad_token_id).sum())
        if hf.config.pad_token_id == hf.config.eos_token_id:
            n_pad -= 1
        if n_pad:
            seek = seek[:-n_pad]
    # _need_fallback passes per-ROW score tensors ([V] each, from the
    # postprocessed seek_outputs), not the batched [B, V] tuples
    row_scores = [s[0] for s in out.scores]
    avg = WhisperGenerationMixin._retrieve_avg_logprobs(row_scores, seek, 0.0)
    return float(avg), seek


@pytest.mark.parametrize("seed", [51, 52, 53])
def test_avg_logprob_matches_hf(seed):
    """Our greedy score (sum of PROCESSED log-softmax over generated tokens
    incl. eos) divided by the eos-inclusive length must equal HF's
    _retrieve_avg_logprobs — the logprob_threshold operand."""
    hf, gen = _tiny(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)

    want_avg, _ = _hf_avg_logprob_shortform(hf, mel)

    opts = _opts(return_timestamps=False, condition_on_prev_tokens=False)
    enc = gen._encode(mel)
    cross_kv = gen._cross_kv_fn(enc)
    prompt = np.full((1, 1), 3, dtype=np.int64)
    seqs, scores, _ = gen._decode_prompted(
        cross_kv, prompt, None, opts, return_timestamps=False,
    )
    gen_eos = gen._trim_generated(seqs[0, 1:], opts, keep_eos=True)
    ours_avg = float(scores[0]) / max(len(gen_eos), 1)
    assert ours_avg == pytest.approx(want_avg, rel=1e-4), (ours_avg, want_avg)


def test_logprob_threshold_boundary_matches_hf():
    """Thresholds bracketing the segment's true avg logprob must flip the
    fallback decision identically on both sides."""
    seed = 61
    hf, gen = _tiny(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((1, 8, 120), dtype=np.float32)

    # probe one segment's avg logprob via the shortform helper
    probe_avg, _ = _hf_avg_logprob_shortform(hf, mel[:, :, :48])
    for thr in (probe_avg - 0.05, probe_avg + 0.05):
        want = _hf_generate(hf, mel, temperature=(0.0,), logprob_threshold=thr)
        got = gen.generate(
            mel, _opts(temperature=(0.0,), logprob_threshold=thr),
            return_segments=True,
        )
        assert _strip(got["sequences"][0]) == _strip(want["sequences"][0]), thr


def test_per_row_retry_keeps_passing_rows():
    """Batch where one row passes at temperature 0 and the other falls back
    to a sampled rung: the passing row's final tokens must be its
    deterministic temp-0 output (HF re-generates only fallback_index_map
    rows; wholesale re-decode would overwrite the passing row with a
    sampled transcript).  Drives _generate_with_fallback directly — one
    segment, one decision per row — which also exercises the per-row
    cross-KV slicing on the retry rung."""
    seed = 71
    hf, gen = _tiny(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)

    cross_kv = gen._cross_kv_fn(gen._encode(mel))
    decoder_ids = np.full((2, 1), 3, dtype=np.int64)

    def ladder(opts):
        flags = [True, True]
        seqs, scores, skip = gen._generate_with_fallback(
            cross_kv, decoder_ids, None, opts, flags, [0, 1], segment_idx=1
        )
        return seqs, scores, flags

    # probe without thresholds → per-row temp-0 outputs and avg logprobs
    # (continuous, so the two rows always discriminate — equal-length
    # incompressible token streams share one zlib ratio, which is why the
    # compression threshold cannot split random-weight rows)
    base_opts = _opts(temperature=(0.0,))
    base_seqs, base_scores, base_flags = ladder(base_opts)
    avgs = [
        float(base_scores[i])
        / max(len(gen._trim_generated(base_seqs[i, 1:], base_opts,
                                      keep_eos=True)), 1)
        for i in range(2)
    ]
    assert base_flags == [True, True]  # temp 0 < 0.5 keeps conditioning
    assert abs(avgs[0] - avgs[1]) > 1e-6
    thr = (avgs[0] + avgs[1]) / 2
    passing = int(np.argmax(avgs))  # avg >= thr → passes

    got_seqs, _, got_flags = ladder(
        _opts(temperature=(0.0, 1.0), logprob_threshold=thr)
    )
    # passing row must keep its deterministic temp-0 transcript
    np.testing.assert_array_equal(got_seqs[passing], base_seqs[passing])
    # the failing row's kept result came from the 1.0 rung → conditioning
    # for the next segment is disabled for it, kept for the passing row
    assert got_flags[passing] is True
    assert got_flags[1 - passing] is False


def test_eos_inclusive_ratio_vs_stripped():
    """The ratio operand keeps the eos token (HF strips eos only AFTER
    _need_fallback) — regression guard for the eos-stripped variant."""
    toks = [17, 42, 42, 42, 99, 101, 101, 200] * 4
    with_eos = _compression_ratio(toks + [2], 512)
    without = _compression_ratio(toks, 512)
    assert with_eos != pytest.approx(without, rel=1e-6)
