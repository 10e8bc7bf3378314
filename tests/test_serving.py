"""TranscriptionService: the live (submit/result) serving front door over
the packed scheduler — ticketed results, idle blocking, drain-on-close,
schedule-independent transcripts (runtime/serving.py)."""

import time

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
from enhance_cb_whisper_tpu.runtime import TranscriptionService

transformers = pytest.importorskip("transformers")

N_KW_LAYERS = 2
OUT = (32, 48)
RESULT_TIMEOUT = 300  # generous: first calls compile on 1 CPU core


def _make_cb(whisper_seed: int = 0):
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=24, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(whisper_seed)
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
    kws_vars = kws.init(
        jax.random.PRNGKey(0), np.zeros((1, N_KW_LAYERS, *OUT), np.float32)
    )

    opts = GenerationOptions(
        decoder_start_token_id=3, language_token_id=None, task_token_id=None,
        no_timestamps_token_id=100, prev_sot_token_id=99, eos_token_id=2,
        pad_token_id=0, max_initial_timestamp_index=10, num_beams=1,
        return_timestamps=True, condition_on_prev_tokens=True,
        max_target_positions=40,
    )

    cb = CBWhisper(
        config=CBWhisperConfig(kws_features_size=OUT, keywords_per_group=2),
        whisper_config=config,
        whisper_params=params,
        kws_model=kws,
        kws_variables=kws_vars,
        catalog=catalog,
        generation_options=opts,
        prompt_ids_fn=lambda text: [99] + [10 + (ord(c) % 50) for c in text][:6],
        decode_fn=lambda tokens: " ".join(f"w{t}" for t in tokens if 4 < t < 99),
        kws_layer_slice=(1, 3),
    )
    cb._test_raw_params = params  # for hot-swap tests
    return cb


@pytest.fixture(scope="module")
def cb():
    return _make_cb(0)


def _mel(t, seed):
    return np.random.default_rng(seed).standard_normal((1, 8, t), np.float32)


def test_submit_result_matches_solo(cb):
    """Four heterogeneous submissions through 2 slots: each ticket's text
    equals the utterance's solo (slots=1) packed decode."""
    mels = [_mel(t, 400 + i) for i, t in enumerate([130, 60, 200, 90])]
    solo = [
        dict(cb.forward_packed(iter([(m, None)]), slots=1))[0] for m in mels
    ]
    with TranscriptionService(cb, slots=2) as svc:
        tickets = [svc.submit(m) for m in mels]
        got = [svc.result(t, timeout=RESULT_TIMEOUT) for t in tickets]
    assert got == solo


def test_idle_then_late_submission(cb):
    """The service parks when idle (no busy spin, worker alive) and picks
    up a submission that arrives later."""
    svc = TranscriptionService(cb, slots=2)
    try:
        t0 = svc.submit(_mel(130, 500))
        first = svc.result(t0, timeout=RESULT_TIMEOUT)
        assert isinstance(first, str)
        time.sleep(0.5)  # service sits idle-blocked on its queue
        assert svc._worker.is_alive() and svc._error is None
        t1 = svc.submit(_mel(60, 501))
        assert isinstance(svc.result(t1, timeout=RESULT_TIMEOUT), str)
    finally:
        svc.close()
    assert not svc._worker.is_alive()


def test_close_drains_pending(cb):
    """close() refuses new work but drains everything already queued."""
    svc = TranscriptionService(cb, slots=2)
    mels = [_mel(t, 600 + i) for i, t in enumerate([130, 60, 90])]
    tickets = [svc.submit(m) for m in mels]
    svc.close(wait=True)
    for t, m in zip(tickets, mels):
        assert svc.result(t, timeout=5) == dict(
            cb.forward_packed(iter([(m, None)]), slots=1)
        )[0]
    with pytest.raises(RuntimeError, match="closed"):
        svc.submit(mels[0])


def test_submit_validates_shape(cb):
    with TranscriptionService(cb, slots=2) as svc:
        with pytest.raises(ValueError, match="log-mel"):
            svc.submit(np.zeros((1, 5, 60), np.float32))  # wrong n_mels
        # 2-D input is promoted to [1, n_mels, T]
        t = svc.submit(np.zeros((8, 130), np.float32))
        assert isinstance(svc.result(t, timeout=RESULT_TIMEOUT), str)


def test_worker_error_propagates(cb, monkeypatch):
    """A decode failure surfaces as RuntimeError on result() and submit()
    instead of hanging callers."""
    svc = TranscriptionService(cb, slots=2)

    def boom(*a, **kw):
        raise RuntimeError("injected decode failure")

    # _cross_kv_fn runs in EVERY window regardless of the encode-spot
    # fusion path, so the failure is guaranteed to fire
    monkeypatch.setattr(svc._module.generator, "_cross_kv_fn", boom)
    ticket = svc.submit(_mel(130, 700))
    with pytest.raises(RuntimeError, match="worker died"):
        svc.result(ticket, timeout=RESULT_TIMEOUT)
    with pytest.raises(RuntimeError, match="worker died"):
        svc.submit(_mel(60, 701))


def test_service_hot_swap_epoch_barrier():
    """swap_params on the LIVE service: results before the swap come from
    the old checkpoint, results after from the new — the swap executes on
    the worker thread after in-flight work drains (no checkpoint mixing)."""
    m1, m2 = _mel(130, 900), _mel(60, 901)
    solo_old = dict(_make_cb(0).forward_packed(iter([(m1, None)]), slots=1))[0]
    solo_new = dict(_make_cb(77).forward_packed(iter([(m2, None)]), slots=1))[0]
    new_params = _make_cb(77)._test_raw_params

    cbA = _make_cb(0)
    with TranscriptionService(cbA, slots=2) as svc:
        t1 = svc.submit(m1)
        assert svc.result(t1, timeout=RESULT_TIMEOUT) == solo_old
        svc.swap_params(new_params)
        t2 = svc.submit(m2)
        assert svc.result(t2, timeout=RESULT_TIMEOUT) == solo_new


def test_vacant_slots_excluded_from_int8_calibration():
    """Live-serving vacant (zero-mel) slots must not feed the lazy int8
    calibration set: one 3-window utterance through 4 slots contributes
    exactly 3 REAL segments (a regression would complete a 4-sample
    calibration from the first window's 1 real + 3 zero rows)."""
    cb = _make_cb(0)
    cb.enable_int8_spotting(calibration_batches=4)
    out = dict(cb.forward_packed(iter([(_mel(130, 950), None)]), slots=4))
    assert isinstance(out[0], str)
    assert cb._int8_pending, "calibration completed early — zero rows leaked in"
    assert len(cb._int8_calib_stacks) == 3
