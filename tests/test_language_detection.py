"""Language auto-detection (`language=None`) differential vs HF.

The reference inherits HF's `language=None` path — `_set_language_and_task`
+ `detect_language` (/root/reference/src/model/pba_whisper.py:27,276-291):
one decoder forward from [sot] over the first 30 s window, logits masked to
`generation_config.lang_to_id` values, argmax per batch row, detected ONCE
per generate() call and used for every segment.  These tests pin (a) the
raw detector against HF's `detect_language`, (b) longform generate
token-parity with `language=None`, and (c) per-row independence (two rows
detecting different languages).
"""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")

LANG_IDS = (90, 91, 92, 93)  # <|l0|>..<|l3|> stand-ins inside the tiny vocab


def _make(seed: int):
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(seed)
    hf = transformers.WhisperForConditionalGeneration(hf_config).eval()
    gc = hf.generation_config
    gc.suppress_tokens = None
    gc.begin_suppress_tokens = None
    gc.forced_decoder_ids = None
    gc.no_timestamps_token_id = 100
    gc.max_initial_timestamp_index = 10
    gc.max_length = 40
    gc.is_multilingual = True
    gc.lang_to_id = {f"<|l{i}|>": t for i, t in enumerate(LANG_IDS)}
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    gen = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    return hf, gen


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3,
        language_token_id=None,
        lang_token_ids=LANG_IDS,
        task_token_id=None,
        no_timestamps_token_id=100,
        prev_sot_token_id=None,
        eos_token_id=2,
        pad_token_id=0,
        suppress_tokens=(),
        begin_suppress_tokens=(),
        max_initial_timestamp_index=10,
        max_target_positions=40,
    )
    base.update(kw)
    return GenerationOptions(**base)


@pytest.mark.parametrize("seed", [0, 1])
def test_detect_language_matches_hf(seed):
    """Raw detector vs HF `model.detect_language` on a 3-row batch."""
    hf, gen = _make(seed)
    rng = np.random.default_rng(seed)
    mel = rng.standard_normal((3, 8, 48), dtype=np.float32)
    want = hf.detect_language(
        input_features=torch.from_numpy(mel), num_segment_frames=48
    ).numpy()
    got = gen.detect_language(mel, _opts())
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [0, 2, 3])
def test_longform_language_none_matches_hf(seed):
    """`language=None` longform generate is token-exact vs HF (detection +
    init tokens [sot, lang, no_ts? per return_timestamps] + seek loop)."""
    hf, gen = _make(seed)
    rng = np.random.default_rng(10 + seed)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            language=None, return_timestamps=True,
            condition_on_prev_tokens=True, return_segments=True,
        )
    opts = _opts(
        num_beams=1, return_timestamps=True, condition_on_prev_tokens=True,
    )
    got = gen.generate(mel, opts, return_segments=True)
    assert got["sequences"][0].tolist() == want["sequences"][0].numpy().tolist()


def test_longform_language_none_batch_rows_independent():
    """A 2-row batch where rows detect DIFFERENT languages must equal the
    HF batch run (per-row init tokens) AND each row's own batch-1 run."""
    hf, gen = _make(4)
    rng = np.random.default_rng(40)
    mel = rng.standard_normal((2, 8, 130), dtype=np.float32)
    # random tiny models detect one dominant language regardless of audio
    # (the raw detector is pinned vs HF above), so force DISTINCT per-row
    # languages through both stacks: HF takes an explicit per-row language
    # list; ours gets the detector monkeypatched to the same answer —
    # everything downstream of detection (per-row init tokens, prompt
    # assembly, seek loops) must then agree token-exact.
    forced = np.asarray([LANG_IDS[0], LANG_IDS[3]], dtype=np.int64)
    orig = WhisperGenerator._detect_language_ids
    WhisperGenerator._detect_language_ids = (
        lambda self, cross_kv, batch, opts: forced[:batch]
    )
    try:
        opts = _opts(
            num_beams=1, return_timestamps=True, condition_on_prev_tokens=True,
        )
        got = gen.generate(mel, opts, return_segments=True)
        # row-1 alone (batch 1; forced[:1] would give the wrong language, so
        # re-point the stub) — packed/batched rows must match their own solo run
        WhisperGenerator._detect_language_ids = (
            lambda self, cross_kv, batch, opts: forced[1:]
        )
        got_solo = gen.generate(mel[1:2], opts, return_segments=True)
    finally:
        WhisperGenerator._detect_language_ids = orig
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            language=["<|l0|>", "<|l3|>"], return_timestamps=True,
            condition_on_prev_tokens=True, return_segments=True,
            attention_mask=torch.ones((2, 130), dtype=torch.long),
        )
    for r in range(2):
        assert got["sequences"][r].tolist() == want["sequences"][r].numpy().tolist()
    want_solo = [t for s in got["segments"][1] for t in s["tokens"]]
    got_solo_t = [t for s in got_solo["segments"][0] for t in s["tokens"]]
    assert got_solo_t == want_solo


def test_explicit_language_still_wins():
    """language_token_id set → no detection launch, token unchanged."""
    hf, gen = _make(5)
    rng = np.random.default_rng(50)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)
    opts_exp = _opts(
        language_token_id=LANG_IDS[2], num_beams=1, return_timestamps=True,
        condition_on_prev_tokens=True,
    )
    assert not opts_exp.needs_lang_detection
    got = gen.generate(mel, opts_exp, return_segments=True)
    assert got["segments"][0][0]["tokens"]  # decoded fine
    with torch.no_grad():
        want = hf.generate(
            torch.from_numpy(mel), num_beams=1, do_sample=False,
            language="<|l2|>", return_timestamps=True,
            condition_on_prev_tokens=True, return_segments=True,
        )
    assert got["sequences"][0].tolist() == want["sequences"][0].numpy().tolist()
