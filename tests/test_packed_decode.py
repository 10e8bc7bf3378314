"""Continuous-batching (packed) longform decode: parity + scheduling.

``WhisperGenerator.generate_packed`` streams utterances through a fixed
number of batch slots, refilling finished slots — a serving-throughput
scheduler beyond the reference's batch-1 eval (src/model/cb_whisper.py:212-289).

Contract (schedule independence): every utterance's tokens are identical
whatever the slot count / co-scheduling — ``slots=N`` equals ``slots=1`` —
because packed mode conditions per row and uses the fixed-width prompt
layout (prompt.py).  Without spotting/conditioning the prompt is the bare
init and the output ALSO equals the plain batch-1 ``generate``.
"""

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.decoding import GenerationOptions, WhisperGenerator
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")


def _tiny_hf_config():
    return transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )


@pytest.fixture(scope="module")
def built():
    hf_config = _tiny_hf_config()
    torch.manual_seed(0)
    hf = transformers.WhisperModel(hf_config)
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)
    return config, params


@pytest.fixture(scope="module")
def gen(built):
    config, params = built
    return WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))


def _opts(**kw):
    base = dict(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=100, prev_sot_token_id=99,
        eos_token_id=2, pad_token_id=0,
        max_initial_timestamp_index=10, return_timestamps=True,
        max_target_positions=40,
    )
    base.update(kw)
    return GenerationOptions(**base)


def _mels(lengths, seed=0):
    rng = np.random.default_rng(seed)
    return [
        rng.standard_normal((1, 8, t), dtype=np.float32) for t in lengths
    ]


def _batch1_tokens(gen, mel, opts):
    """Plain (HF-layout) batch-1 longform decode."""
    res = gen.generate(mel, opts, return_segments=True)
    return [t for s in res["segments"][0] for t in s["tokens"]]


def _run_packed(gen, mels, opts, slots, **kw):
    stream = ((m, None) for m in mels)
    out = dict(gen.generate_packed(stream, opts, slots=slots, **kw))
    assert set(out) == set(range(len(mels)))
    return out


def _spotter(seed=0):
    """Deterministic fake keyword spotting: per-row token lists whose
    LENGTH varies with the mel content — the co-scheduling hazard the
    fixed-width layout must neutralize."""

    def keyword_spotting(input_features, start_of_prev=False):
        out = []
        for row in np.asarray(input_features):
            h = int(np.abs(row).sum() * 997) % 5
            out.append([99] * 0 + [20 + (h + j) % 30 for j in range(h)])
        return out

    return keyword_spotting


@pytest.mark.parametrize("num_beams", [1, 2])
def test_packed_no_context_matches_plain_batch1(gen, num_beams):
    """No spotting, no conditioning: prompts are the bare init, and packed
    output equals the plain batch-1 generate exactly."""
    opts = _opts(num_beams=num_beams, condition_on_prev_tokens=False)
    mels = _mels([60, 130, 200, 90, 130], seed=1)
    packed = _run_packed(gen, mels, opts, slots=2)
    for i, mel in enumerate(mels):
        assert packed[i].tolist() == _batch1_tokens(gen, mel, opts), f"utt {i}"


@pytest.mark.parametrize("num_beams", [1, 2])
def test_packed_schedule_independent_conditioning(gen, num_beams):
    """Conditioning on: slots=2 and slots=3 must give every utterance the
    same tokens as slots=1 (per-row conditioning + fixed prompt layout)."""
    opts = _opts(num_beams=num_beams, condition_on_prev_tokens=True)
    mels = _mels([60, 130, 200, 90, 130], seed=2)
    solo = {
        i: _run_packed(gen, [mel], opts, slots=1)[0].tolist()
        for i, mel in enumerate(mels)
    }
    for slots in (2, 3):
        packed = _run_packed(gen, mels, opts, slots=slots)
        for i in range(len(mels)):
            assert packed[i].tolist() == solo[i], f"utt {i} slots {slots}"


def test_packed_schedule_independent_with_spotting(gen):
    """Variable-length keyword prompts (the composition hazard): slots=2
    still equals slots=1 per utterance."""
    opts = _opts(num_beams=1, condition_on_prev_tokens=True)
    mels = _mels([130, 60, 200], seed=3)
    spot = _spotter()
    solo = {
        i: _run_packed(
            gen, [mel], opts, slots=1, keyword_spotting=spot
        )[0].tolist()
        for i, mel in enumerate(mels)
    }
    packed = _run_packed(gen, mels, opts, slots=2, keyword_spotting=spot)
    for i in range(len(mels)):
        assert packed[i].tolist() == solo[i], f"utt {i}"


def test_packed_more_slots_than_stream(gen):
    """Vacant (zero-mel padding) slots from the first window: excluded from
    results and from the fallback ladder."""
    opts = _opts(
        num_beams=1,
        condition_on_prev_tokens=True,
        # always-fallback thresholds with a DETERMINISTIC ladder (two
        # temperature-0 rungs): vacant-row exclusion must not change the
        # real rows' outcome vs their solo decode
        logprob_threshold=0.0,
        temperature=(0.0, 0.0),
    )
    mels = _mels([60, 130], seed=4)
    solo = {
        i: _run_packed(gen, [mel], opts, slots=1)[0].tolist()
        for i, mel in enumerate(mels)
    }
    packed = _run_packed(gen, mels, opts, slots=4)
    for i in range(len(mels)):
        assert packed[i].tolist() == solo[i], f"utt {i}"


def test_packed_zero_length_utterance(gen):
    """A zero-frame utterance completes immediately with an empty sequence
    and never occupies a slot."""
    opts = _opts(num_beams=1, condition_on_prev_tokens=False)
    mels = _mels([60, 130], seed=5)
    stream = [
        (mels[0], None),
        (np.zeros((1, 8, 50), np.float32), np.zeros((1, 50), np.int32)),
        (mels[1], None),
    ]
    out = dict(gen.generate_packed(iter(stream), opts, slots=2))
    assert set(out) == {0, 1, 2}
    assert out[1].size == 0
    assert out[0].tolist() == _batch1_tokens(gen, mels[0], opts)
    assert out[2].tolist() == _batch1_tokens(gen, mels[1], opts)


def test_packed_attention_mask_prefix(gen):
    """A prefix attention mask bounds the seek loop exactly like the
    fixed-batch path (forward_batch's right-padded mels)."""
    opts = _opts(num_beams=2, condition_on_prev_tokens=False)
    [mel] = _mels([130], seed=6)
    padded = np.zeros((1, 8, 200), np.float32)
    padded[:, :, :130] = mel
    mask = np.zeros((1, 200), np.int32)
    mask[:, :130] = 1
    out = dict(gen.generate_packed(iter([(padded, mask)]), opts, slots=2))
    assert out[0].tolist() == _batch1_tokens(gen, mel, opts)


def test_packed_return_segments(gen):
    """return_segments yields the per-utterance segment dicts (same
    timestamps/tokens as the plain batch-1 decode when context-free)."""
    opts = _opts(num_beams=1, condition_on_prev_tokens=False)
    mels = _mels([130, 60], seed=7)
    out = dict(
        gen.generate_packed(
            ((m, None) for m in mels), opts, slots=2, return_segments=True
        )
    )
    for i, mel in enumerate(mels):
        ref = gen.generate(mel, opts, return_segments=True)["segments"][0]
        got = out[i]["segments"]
        assert len(got) == len(ref)
        for a, b in zip(got, ref):
            assert a["tokens"] == b["tokens"]
            assert a["start"] == b["start"] and a["end"] == b["end"]
        flat = [t for s in got for t in s["tokens"]]
        assert out[i]["sequences"].tolist() == flat


def test_packed_slot_refill_keeps_width(gen, monkeypatch):
    """The scheduler refills finished slots: every window launches with the
    full slot width (the compile-footprint invariant), and short utterances
    hand their slot to the next one instead of shrinking the batch."""
    opts = _opts(num_beams=1, condition_on_prev_tokens=False)
    mels = _mels([60, 200, 60, 60, 60], seed=8)
    widths = []
    orig = WhisperGenerator._run_longform_window

    def spy(self, rows, *a, **kw):
        widths.append(len(rows))
        return orig(self, rows, *a, **kw)

    monkeypatch.setattr(WhisperGenerator, "_run_longform_window", spy)
    packed = _run_packed(gen, mels, opts, slots=2)
    assert widths and all(w == 2 for w in widths)
    for i, mel in enumerate(mels):
        assert packed[i].tolist() == _batch1_tokens(gen, mel, opts), f"utt {i}"


def test_packed_one_prompt_bucket(gen):
    """With context (fixed prompt layout) every window's prompt has the
    same width — the whole run compiles one prefill/decode program family."""
    opts = _opts(num_beams=1, condition_on_prev_tokens=True)
    mels = _mels([130, 200, 60], seed=9)
    plens = []
    orig = WhisperGenerator._generate_with_fallback

    def spy(self, cross_kv, decoder_ids, *a, **kw):
        plens.append(decoder_ids.shape[1])
        return orig(self, cross_kv, decoder_ids, *a, **kw)

    import pytest as _pytest  # noqa: F401  (monkeypatch via context)
    from unittest import mock

    with mock.patch.object(
        WhisperGenerator, "_generate_with_fallback", spy
    ):
        _run_packed(gen, mels, opts, slots=2, keyword_spotting=_spotter())
    assert len(set(plens)) == 1, plens


def test_packed_composes_with_int8_decoder(built):
    """Packed scheduling × weight-only int8 serving decode: schedule
    independence (slots=2 == slots=1) holds under quantized weights."""
    config, params = built
    q = WhisperGenerator(
        config,
        params,
        prompt_buckets=(8, 16, 32),
        vocab_int8=True,
        decoder_int8=True,
    )
    opts = _opts(num_beams=1, condition_on_prev_tokens=True)
    mels = _mels([130, 60], seed=12)
    solo = {
        i: _run_packed(q, [mel], opts, slots=1)[0].tolist()
        for i, mel in enumerate(mels)
    }
    packed = _run_packed(q, mels, opts, slots=2)
    for i in range(len(mels)):
        assert packed[i].tolist() == solo[i], f"utt {i}"


def test_fixed_batch_longform_unchanged(gen):
    """The refactored fixed-batch driver (shared window executor) keeps the
    HF prompt layout and row-0 conditioning gate: batched output still
    matches per-utterance batch-1 in the conditioning-off case, and the
    batch dim shrinks as utterances finish (reference semantics)."""
    opts = _opts(num_beams=2, condition_on_prev_tokens=False)
    mels = _mels([200, 60], seed=10)
    t_max = max(m.shape[-1] for m in mels)
    batch = np.zeros((2, 8, t_max), np.float32)
    attn = np.zeros((2, t_max), np.int32)
    for i, m in enumerate(mels):
        batch[i, :, : m.shape[-1]] = m[0]
        attn[i, : m.shape[-1]] = 1
    res = gen.generate(batch, opts, attention_mask=attn, return_segments=True)
    for i, mel in enumerate(mels):
        flat = [t for s in res["segments"][i] for t in s["tokens"]]
        assert flat == _batch1_tokens(gen, mel, opts), f"utt {i}"


def test_swap_params_no_recompile(built):
    """Hot checkpoint swap (serving): swapping same-architecture weights
    reuses every compiled program (weights are traced arguments, never HLO
    literals) — output matches a fresh generator built on the new
    checkpoint, and the encode jit cache stays at one entry."""
    config, params = built
    hf2 = None
    torch.manual_seed(42)
    hf2 = transformers.WhisperModel(_tiny_hf_config())
    params2 = load_hf_whisper(hf2.state_dict(), config)

    opts = _opts(num_beams=2, condition_on_prev_tokens=True)
    [mel] = _mels([130], seed=13)

    g = WhisperGenerator(config, params, prompt_buckets=(8, 16, 32))
    _ = _batch1_tokens(g, mel, opts)
    fresh2 = _batch1_tokens(
        WhisperGenerator(config, params2, prompt_buckets=(8, 16, 32)), mel, opts
    )
    g.swap_params(params2)
    assert _batch1_tokens(g, mel, opts) == fresh2
    assert g._encode_jit._cache_size() == 1

    # architecture mismatch is refused (a silent recompile otherwise)
    bad = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=16,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=32, decoder_ffn_dim=32,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(7)
    bad_params = load_hf_whisper(
        transformers.WhisperModel(bad).state_dict(), WhisperConfig.from_hf(bad)
    )
    with pytest.raises(ValueError, match="architecture mismatch"):
        g.swap_params(bad_params)


def test_swap_params_int8_requantizes(built):
    """swap_params replays the constructor's serving preprocessing: an
    int8-decoder generator swapped to a new checkpoint matches a fresh
    int8 generator built on that checkpoint."""
    config, params = built
    torch.manual_seed(43)
    params2 = load_hf_whisper(
        transformers.WhisperModel(_tiny_hf_config()).state_dict(), config
    )
    opts = _opts(num_beams=1, condition_on_prev_tokens=False)
    [mel] = _mels([60], seed=14)
    g = WhisperGenerator(
        config, params, prompt_buckets=(8, 16, 32),
        vocab_int8=True, decoder_int8=True,
    )
    _ = _batch1_tokens(g, mel, opts)
    fresh = _batch1_tokens(
        WhisperGenerator(
            config, params2, prompt_buckets=(8, 16, 32),
            vocab_int8=True, decoder_int8=True,
        ),
        mel, opts,
    )
    g.swap_params(params2)
    assert _batch1_tokens(g, mel, opts) == fresh


def test_single_window_utterances(gen):
    """<=1-window utterances: packed processes them on the longform segment
    surface, schedule-independently; and a BATCH of short utterances takes
    the longform driver instead of the (batch-1-only) shortform refusal —
    token-identical to the packed solo decode."""
    opts = _opts(num_beams=1, condition_on_prev_tokens=False)
    mels = _mels([30, 40], seed=15)  # both fit the 48-frame window
    solo = {
        i: _run_packed(gen, [m], opts, slots=1)[0].tolist()
        for i, m in enumerate(mels)
    }
    packed = _run_packed(gen, mels, opts, slots=2)
    for i in range(2):
        assert packed[i].tolist() == solo[i], f"utt {i}"

    # batched mels with t_max <= one window: previously raised
    # "shortform biased generation is single-utterance"
    t_max = 40
    batch = np.zeros((2, 8, t_max), np.float32)
    attn = np.zeros((2, t_max), np.int32)
    for i, m in enumerate(mels):
        batch[i, :, : m.shape[-1]] = m[0]
        attn[i, : m.shape[-1]] = 1
    res = gen.generate(batch, opts, attention_mask=attn, return_segments=True)
    for i in range(2):
        flat = [t for s in res["segments"][i] for t in s["tokens"]]
        assert flat == solo[i], f"utt {i} batched"


def test_packed_no_spotter_uses_full_prev_budget(gen):
    """Conditioning without a spotter: the fixed layout drops the keyword
    field (it could never be filled) so prev history gets the FULL
    reference budget — the prompt width must be smaller than the
    with-spotter layout while staying constant across windows."""
    from unittest import mock

    opts = _opts(num_beams=1, condition_on_prev_tokens=True)
    mels = _mels([130], seed=16)
    orig = WhisperGenerator._generate_with_fallback

    def run(**kw):
        plens = []

        def spy(self, cross_kv, decoder_ids, *a, **k):
            plens.append(decoder_ids.shape[1])
            return orig(self, cross_kv, decoder_ids, *a, **k)

        with mock.patch.object(WhisperGenerator, "_generate_with_fallback", spy):
            _run_packed(gen, mels, opts, slots=1, **kw)
        return plens

    no_spot = run()
    with_spot = run(keyword_spotting=_spotter())
    assert len(set(no_spot)) == 1 and len(set(with_spot)) == 1
    cut = 40 // 2 - 1  # max_target_positions // 2 - 1 = 19
    w_kw = (cut * 3) // 4 - 1
    init = 1  # [decoder_start] (return_timestamps drops <|notimestamps|>)
    # no spotter: sot + FULL prev budget + init (no dead keyword field)
    assert no_spot[0] == 1 + cut + init
    # with spotter: sot + kw budget + remaining prev budget + init
    assert with_spot[0] == 1 + w_kw + (cut - w_kw - 1) + init
