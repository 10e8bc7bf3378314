"""End-to-end CBWhisper pipeline test on tiny random models: on-the-fly
keyword spotting → biased prompts → longform/shortform decode → entity
recall with bootstrap CIs (reference src/model/cb_whisper.py)."""

import jax
import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.catalog import KeywordCatalog
from enhance_cb_whisper_tpu.decoding import GenerationOptions
from enhance_cb_whisper_tpu.models import ResNetConfig
from enhance_cb_whisper_tpu.models.cb_whisper import CBWhisper, CBWhisperConfig
from enhance_cb_whisper_tpu.models.kws import KWSModel
from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
from enhance_cb_whisper_tpu.models.whisper_loader import load_hf_whisper

transformers = pytest.importorskip("transformers")

N_KW_LAYERS = 2
OUT = (32, 48)


@pytest.fixture(scope="module")
def cb():
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    hf = transformers.WhisperModel(hf_config)
    config = WhisperConfig.from_hf(hf_config)
    params = load_hf_whisper(hf.state_dict(), config)

    rng = np.random.default_rng(0)
    keywords = ["alpha", "beta", "gamma"]
    stacks = [
        rng.standard_normal((N_KW_LAYERS, rng.integers(2, 6), 32), dtype=np.float32)
        for _ in keywords
    ]
    stacks = [s / np.linalg.norm(s, axis=-1, keepdims=True) for s in stacks]
    catalog = KeywordCatalog.from_arrays(keywords, stacks, group_size=2)

    kws_cfg = ResNetConfig(
        num_channels=N_KW_LAYERS, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )
    kws = KWSModel(kws_cfg)
    kws_vars = kws.init(jax.random.PRNGKey(0), np.zeros((1, N_KW_LAYERS, *OUT), np.float32))

    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=100, prev_sot_token_id=99, eos_token_id=2, pad_token_id=0,
        max_initial_timestamp_index=10, num_beams=2, return_timestamps=True,
        condition_on_prev_tokens=True, max_target_positions=40,
    )

    def prompt_ids_fn(text):
        return [99] + [10 + (ord(c) % 50) for c in text][:6]

    def decode_fn(tokens):
        return " ".join(f"w{t}" for t in tokens if 4 < t < 99)

    module = CBWhisper(
        config=CBWhisperConfig(kws_features_size=OUT, keywords_per_group=2),
        whisper_config=config,
        whisper_params=params,
        kws_model=kws,
        kws_variables=kws_vars,
        catalog=catalog,
        generation_options=opts,
        prompt_ids_fn=prompt_ids_fn,
        decode_fn=decode_fn,
        kws_layer_slice=(1, 3),
    )
    return module


def test_spot_keywords_shapes(cb):
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
    spotted = cb.spot_keywords(mel)
    assert len(spotted) == 2
    for kwds in spotted:
        assert set(kwds) <= {"alpha", "beta", "gamma"}
        assert len(kwds) == len(set(kwds))


def test_keyword_spotting_prompt_ids(cb):
    rng = np.random.default_rng(2)
    mel = rng.standard_normal((1, 8, 48), dtype=np.float32)
    with_prev = cb.keyword_spotting(mel, start_of_prev=True)
    without = cb.keyword_spotting(mel, start_of_prev=False)
    assert len(with_prev) == len(without) == 1
    if with_prev[0]:
        assert with_prev[0][0] == 99
        assert without[0] == with_prev[0][1:]


def test_oracle_buffer_path(cb):
    cb.oracle_buffer = ["alpha"]
    old = cb.config.oracle
    cb.config.oracle = "gold"
    ids = cb.keyword_spotting(np.zeros((1, 8, 48), np.float32), start_of_prev=True)
    cb.config.oracle = old
    assert ids[0][0] == 99 and len(ids[0]) > 1


def test_forward_shortform_and_longform(cb):
    rng = np.random.default_rng(3)
    short = cb.forward(rng.standard_normal((1, 8, 48), dtype=np.float32))
    assert isinstance(short, str)
    long = cb.forward(rng.standard_normal((1, 8, 130), dtype=np.float32))
    assert isinstance(long, str)


def test_run_test_entity_recall(cb):
    rng = np.random.default_rng(4)
    dataset = [
        {
            "transcript": "w10 w20 w30",
            "hotword_labels": np.array([1, 0, 0]),
            "speaker": f"s{i % 2}",
            "keywords": [{"mention": "w10", "total_offset": 0, "end_offset": 3}],
        }
        for i in range(3)
    ]

    def mel_fn(item):
        return rng.standard_normal((1, 8, 48), dtype=np.float32), None

    results = cb.run_test(dataset, mel_fn, num_bootstraps=20)
    assert 0.0 <= results["Entity Recall"] <= 1.0
    assert results["Entity Recall LB"] <= results["Entity Recall UB"]


def test_temperature_fallback_ladder(cb):
    """A very low compression-ratio threshold forces retries up the ladder
    (HF generate_with_fallback semantics); the driver must still terminate
    and produce a transcript."""
    import dataclasses

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)
    opts = dataclasses.replace(
        cb.opts,
        num_beams=1,
        temperature=(0.0, 0.7),
        compression_ratio_threshold=0.01,  # everything "too repetitive"
    )
    out = cb.generator.generate(mel, opts, keyword_spotting=None, return_segments=True)
    assert isinstance(out, dict) and out["sequences"].shape[0] == 1


def test_no_speech_skip(cb):
    """no_speech_threshold=-1 with no logprob threshold skips every segment:
    the transcript comes back empty."""
    import dataclasses

    rng = np.random.default_rng(6)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)
    opts = dataclasses.replace(
        cb.opts, num_beams=1, no_speech_threshold=-1.0, no_speech_token_id=50
    )
    out = cb.generator.generate(mel, opts, return_segments=True)
    assert out["segments"][0] == []
    assert out["sequences"].shape[1] == 0


def test_run_test_oracle_gold_and_random(cb):
    """Oracle modes (cb_whisper.py:221-226): gold injects the labeled
    keywords; random samples the same COUNT from the negatives."""
    rng = np.random.default_rng(7)
    dataset = [
        {
            "transcript": "w10 w20",
            "hotword_labels": np.array([1, 0, 0]),
            "speaker": "s0",
            "keywords": [{"mention": "w10", "total_offset": 0, "end_offset": 3}],
        }
        for _ in range(2)
    ]

    def mel_fn(item):
        return rng.standard_normal((1, 8, 48), dtype=np.float32), None

    captured = []
    orig = cb.keyword_spotting

    def spy(input_features, start_of_prev=False):
        captured.append(list(cb.oracle_buffer))
        return orig(input_features, start_of_prev=start_of_prev)

    cb.keyword_spotting = spy
    old = cb.config.oracle
    try:
        cb.config.oracle = "gold"
        cb.run_test(dataset, mel_fn, num_bootstraps=5)
        assert captured and all(b == ["alpha"] for b in captured)

        captured.clear()
        cb.config.oracle = "random"
        cb.run_test(dataset, mel_fn, num_bootstraps=5)
        # random mode: as many keywords as gold positives, all from negatives
        assert captured and all(len(b) == 1 and b[0] in ("beta", "gamma") for b in captured)
    finally:
        cb.config.oracle = old
        cb.keyword_spotting = orig


def test_spot_keywords_batched_matches_per_segment(cb):
    """One vmapped launch over the segment axis must reproduce the
    per-segment results (VERDICT r1 weak #2: host loop -> batched)."""
    rng = np.random.default_rng(7)
    mel = rng.standard_normal((3, 8, 48), dtype=np.float32)
    batched = cb.spot_keywords(mel)
    singles = [cb.spot_keywords(mel[i : i + 1])[0] for i in range(3)]
    assert batched == singles


def test_oracle_multi_segment_batch(cb):
    """oracle != kws with a multi-segment batch: every active segment gets
    the utterance-level oracle keywords (VERDICT r1 weak #3 — was a
    length-1 list regardless of batch size)."""
    cb.oracle_buffer = ["alpha", "beta"]
    old = cb.config.oracle
    cb.config.oracle = "gold"
    try:
        ids = cb.keyword_spotting(np.zeros((3, 8, 48), np.float32), start_of_prev=True)
    finally:
        cb.config.oracle = old
    assert len(ids) == 3
    assert ids[0] == ids[1] == ids[2]
    assert ids[0][0] == 99 and len(ids[0]) > 1


def test_forward_batched_longform_oracle_gold(cb):
    """Batched longform decode with oracle='gold' (the combination that
    mis-sized keyword lists in round 1)."""
    rng = np.random.default_rng(11)
    old = cb.config.oracle
    cb.config.oracle = "gold"
    try:
        out = cb.forward(
            rng.standard_normal((1, 8, 130), dtype=np.float32), oracle=["beta"]
        )
    finally:
        cb.config.oracle = old
    assert isinstance(out, str)


def test_run_test_batched_matches_sequential(cb):
    """batch_size>1 longform eval (one launch, attention-masked mels) must
    produce the same transcripts as the sequential batch-1 path."""
    dataset = [
        {
            "transcript": "w10 w20 w30",
            "hotword_labels": np.array([1, 0, 0]),
            "speaker": f"s{i % 2}",
            "keywords": [{"mention": "w10", "total_offset": 0, "end_offset": 3}],
        }
        for i in range(4)
    ]
    # deterministic per-item mels, mixed lengths (two longform, two short)
    mels = {
        i: np.random.default_rng(100 + i).standard_normal(
            (1, 8, 130 if i % 2 else 90), dtype=np.float32
        )
        for i in range(4)
    }

    def make_mel_fn():
        state = {"i": 0}

        def mel_fn(item):
            m = mels[state["i"]]
            state["i"] += 1
            return m, None

        return mel_fn

    seq = cb.run_test(dataset, make_mel_fn(), num_bootstraps=10)
    seq_preds = [
        cb.forward(mels[i]) for i in range(4)
    ]
    batched_preds = cb.forward_batch(
        [mels[i] for i in range(4)], [None] * 4
    )
    assert batched_preds == seq_preds

    batched = cb.run_test(dataset, make_mel_fn(), num_bootstraps=10, batch_size=2)
    assert batched["Entity Recall"] == seq["Entity Recall"]


def test_run_test_packed_matches_slots1(cb):
    """Continuous-batching eval (packed=True): schedule-independent — the
    full spotting+biased-decode pipeline gives every utterance the same
    transcript at slots=2 as at slots=1, and the same entity recall."""
    dataset = [
        {
            "transcript": "w10 w20 w30",
            "hotword_labels": np.array([1, 0, 0]),
            "speaker": f"s{i % 2}",
            "keywords": [{"mention": "w10", "total_offset": 0, "end_offset": 3}],
        }
        for i in range(5)
    ]
    lengths = [130, 90, 200, 90, 130]
    mels = {
        i: np.random.default_rng(300 + i).standard_normal(
            (1, 8, t), dtype=np.float32
        )
        for i, t in enumerate(lengths)
    }

    def make_mel_fn():
        state = {"i": 0}

        def mel_fn(item):
            m = mels[state["i"]]
            state["i"] += 1
            return m, None

        return mel_fn

    solo = {
        i: dict(cb.forward_packed(iter([(mels[i], None)]), slots=1))[0]
        for i in range(5)
    }
    packed = dict(
        cb.forward_packed(((mels[i], None) for i in range(5)), slots=2)
    )
    assert packed == solo

    # run_test(packed=True) must align each prediction with its item —
    # capture the preds the metric consumes and pin them to the solo decodes
    captured = {}
    orig_finalize = CBWhisper._finalize_test

    def spy(self, preds, refs, mentions, speakers, num_bootstraps, meter):
        captured["preds"] = list(preds)
        return orig_finalize(
            self, preds, refs, mentions, speakers, num_bootstraps, meter
        )

    import pytest as _pytest  # noqa: F401

    from unittest import mock

    with mock.patch.object(CBWhisper, "_finalize_test", spy):
        res = cb.run_test(
            dataset, make_mel_fn(), num_bootstraps=10, batch_size=2,
            packed=True,
        )
    assert captured["preds"] == [solo[i] for i in range(5)]
    assert isinstance(res["Entity Recall"], float)
    assert res["RTFx"] > 0


def test_forward_packed_requires_kws_oracle(cb):
    old = cb.config.oracle
    cb.config.oracle = "gold"
    try:
        import pytest as _pytest

        with _pytest.raises(AssertionError, match="oracle='kws'"):
            list(cb.forward_packed(iter([(np.zeros((1, 8, 130), np.float32), None)])))
    finally:
        cb.config.oracle = old


def test_forward_batch_requires_kws_oracle(cb):
    old = cb.config.oracle
    cb.config.oracle = "gold"
    try:
        import pytest as _pytest

        with _pytest.raises(AssertionError, match="oracle='kws'"):
            cb.forward_batch([np.zeros((1, 8, 48), np.float32)], [None])
    finally:
        cb.config.oracle = old


def test_single_encode_fusion_matches_unfused(cb):
    """Single-encode fusion (SURVEY.md §7 "two encoders per segment"): when
    the KWS encoder shares the ASR checkpoint, each segment is encoded ONCE
    and the generator's own encoder is never invoked; transcripts must be
    identical to the unfused two-encoder path."""
    import dataclasses as _dc

    assert cb.encode_fused  # fixture shares the checkpoint -> fusion active

    # an explicit encoder_ckpt (even with identical weights) disables fusion
    unfused = CBWhisper(
        config=_dc.replace(cb.config),
        whisper_config=cb.whisper_config,
        whisper_params=cb.generator.params,
        kws_model=cb.kws_model,
        kws_variables=cb.kws_variables,
        catalog=cb.catalog,
        generation_options=cb.opts,
        prompt_ids_fn=cb.prompt_ids_fn,
        decode_fn=cb.decode_fn,
        encoder_params=cb.generator.params,
        encoder_config=cb.whisper_config,
        kws_layer_slice=cb.kws_layer_slice,
    )
    assert not unfused.encode_fused

    calls = {"n": 0}
    orig_encode = cb.generator._encode

    def counting_encode(mel):
        calls["n"] += 1
        return orig_encode(mel)

    cb.generator._encode = counting_encode
    try:
        rng = np.random.default_rng(21)
        short = rng.standard_normal((1, 8, 48), dtype=np.float32)
        long = rng.standard_normal((1, 8, 130), dtype=np.float32)
        # SUB-segment-length shortform input: the non-fused spotting path
        # must receive the PADDED mel — an unpadded one breaks inside the
        # fixed-shape KWS encoder, gets swallowed by the spotting fallback,
        # and silently disables biasing (found by review; exactly-full
        # segments masked it)
        sub = rng.standard_normal((1, 8, 30), dtype=np.float32)
        assert cb.forward(short) == unfused.forward(short)
        assert cb.forward(long) == unfused.forward(long)
        assert cb.forward(sub) == unfused.forward(sub)
        assert calls["n"] == 0  # fused path never ran the second encoder
    finally:
        cb.generator._encode = orig_encode

    captured = {}

    def spy(input_features, start_of_prev=False):
        captured["frames"] = input_features.shape[-1]
        return [[]]

    unfused.generator.generate(sub, unfused.opts, keyword_spotting=spy)
    assert captured["frames"] == unfused.generator.n_segment_frames


def test_encode_spot_failure_falls_back_to_generator_encoder(cb):
    """A spotting-encoder failure in the fused path returns (no keywords,
    None); the generator must fall back to its own encoder and still
    transcribe (reference guard: cb_whisper.py:99-108)."""
    rng = np.random.default_rng(22)
    mel = rng.standard_normal((1, 8, 130), dtype=np.float32)
    want = cb.forward(mel)

    orig = cb._kws_stack_enc
    cb._kws_stack_enc = lambda *_: (_ for _ in ()).throw(RuntimeError("boom"))
    try:
        out = cb.forward(mel)
    finally:
        cb._kws_stack_enc = orig
    assert isinstance(out, str)
    # no keywords spotted -> same as prompt-less decode of the same audio
    old_prompt = cb.config.prompt
    cb.config.prompt = False
    try:
        promptless = cb.forward(mel)
    finally:
        cb.config.prompt = old_prompt
    assert out == promptless
    assert isinstance(want, str)


def test_int8_spotting_matches_fp32(cb):
    """enable_int8_spotting (lazy accumulate-then-calibrate) must reproduce
    the fp32 spotter's keyword decisions."""
    rng = np.random.default_rng(9)
    mel = rng.standard_normal((2, 8, 48), dtype=np.float32)
    ref = cb.spot_keywords(mel)
    saved = (cb._score_fn, cb._batched_score, cb.kws_variables)
    try:
        cb.enable_int8_spotting(calibration_batches=2)
        assert cb._int8_pending
        got = cb.spot_keywords(mel)
        assert not cb._int8_pending  # 2 segments filled the calibration set
        again = cb.spot_keywords(mel)  # swapped scorer stays in place
    finally:
        cb._score_fn, cb._batched_score, cb.kws_variables = saved
        cb._int8_pending = False
    assert got == ref
    assert again == ref


def test_int8_spotting_accumulates_calibration_batches(cb):
    """With calibration_batches > first batch, early segments score fp32
    while calibration stacks accumulate; the quantized scorer takes over
    once the set is full — decisions stay identical throughout."""
    rng = np.random.default_rng(10)
    mel_a = rng.standard_normal((2, 8, 48), dtype=np.float32)
    mel_b = rng.standard_normal((2, 8, 48), dtype=np.float32)
    ref_a, ref_b = cb.spot_keywords(mel_a), cb.spot_keywords(mel_b)
    saved = (cb._score_fn, cb._batched_score, cb.kws_variables)
    try:
        cb.enable_int8_spotting(calibration_batches=4)
        got_a = cb.spot_keywords(mel_a)
        assert cb._int8_pending  # only 2 of 4 segments seen: still fp32
        got_b = cb.spot_keywords(mel_b)
        assert not cb._int8_pending  # set full: calibrated over 4 segments
        again_b = cb.spot_keywords(mel_b)
    finally:
        cb._score_fn, cb._batched_score, cb.kws_variables = saved
        cb._int8_pending = False
    assert got_a == ref_a
    assert got_b == ref_b
    assert again_b == ref_b


def test_int8_kws_encoder_requires_separate_encoder(cb):
    with pytest.raises(ValueError, match="separate KWS encoder"):
        cb.enable_int8_kws_encoder()


def test_int8_kws_encoder_matches_fp32_decisions(cb):
    """enable_int8_kws_encoder: the separate KWS encoder runs s8×s8→s32
    after lazy calibration; spotting decisions match fp32 and the ASR
    generator params are untouched (models/whisper.py int8 encoder)."""
    import torch as _torch

    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=4, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    _torch.manual_seed(7)
    enc_hf = transformers.WhisperModel(hf_config)
    enc_config = WhisperConfig.from_hf(hf_config)
    enc_params = load_hf_whisper(enc_hf.state_dict(), enc_config)

    def build():
        return CBWhisper(
            config=CBWhisperConfig(kws_features_size=OUT, keywords_per_group=2),
            whisper_config=cb.whisper_config,
            whisper_params=cb.generator.params,
            kws_model=cb.kws_model,
            kws_variables=cb.kws_variables,
            catalog=cb.catalog,
            generation_options=cb.opts,
            prompt_ids_fn=cb.prompt_ids_fn,
            decode_fn=cb.decode_fn,
            encoder_params=enc_params,
            encoder_config=enc_config,
            kws_layer_slice=(1, 3),
        )

    f32 = build()
    q = build()
    q.enable_int8_kws_encoder(host_params=enc_params, calibration_batches=1)

    rng = np.random.default_rng(21)
    mels = [rng.standard_normal((2, 8, 48), dtype=np.float32) for _ in range(3)]
    for mel in mels:
        assert f32.spot_keywords(mel) == q.spot_keywords(mel)
    # calibration completed and the encoder tree is the quantized one
    assert not q._enc_int8_pending
    assert "act_scales" in q.encoder_params["encoder"]["layers"]
    # the ASR generator's params were never touched
    assert q.generator.params is not q.encoder_params
