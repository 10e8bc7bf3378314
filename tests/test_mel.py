"""Golden-parity: on-device log-mel front-end vs HF WhisperFeatureExtractor
(the producer of every encoder input in the reference,
src/utils.py:186-187)."""

import numpy as np
import pytest

from enhance_cb_whisper_tpu.ops.mel import (
    N_FRAMES,
    N_SAMPLES,
    log_mel_spectrogram,
    mel_filter_bank,
    pad_or_trim,
)

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def fe():
    return transformers.WhisperFeatureExtractor()


def test_mel_filter_bank_matches_hf(fe):
    np.testing.assert_allclose(mel_filter_bank(80), fe.mel_filters, rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("seconds", [1.3, 5.0])
def test_log_mel_matches_hf(fe, seconds):
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(16000 * seconds)) * 0.1).astype(np.float32)

    want = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    got = np.asarray(log_mel_spectrogram(pad_or_trim(audio[None])))[0]

    assert got.shape == want.shape == (80, N_FRAMES)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


def test_pad_or_trim():
    a = np.ones((1, 100), np.float32)
    assert pad_or_trim(a).shape == (1, N_SAMPLES)
    assert pad_or_trim(np.ones((1, N_SAMPLES + 5), np.float32)).shape == (1, N_SAMPLES)


def test_mel_128_bins_large_v3(fe):
    """whisper-large-v3 uses 128 mel bins; the filterbank and log-mel must
    match a 128-bin WhisperFeatureExtractor."""
    fe128 = transformers.WhisperFeatureExtractor(feature_size=128)
    np.testing.assert_allclose(mel_filter_bank(128), fe128.mel_filters, rtol=1e-5, atol=1e-7)

    rng = np.random.default_rng(5)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    want = fe128(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    got = np.asarray(log_mel_spectrogram(pad_or_trim(audio[None]), n_mels=128))[0]
    assert got.shape == want.shape == (128, N_FRAMES)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)
