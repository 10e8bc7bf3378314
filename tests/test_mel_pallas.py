"""Pallas fused mel kernel vs the XLA reference implementation (which is
itself parity-tested against WhisperFeatureExtractor in test_mel.py)."""

import numpy as np
import pytest

from enhance_cb_whisper_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from enhance_cb_whisper_tpu.ops.mel_pallas import log_mel_spectrogram_pallas


@pytest.mark.parametrize("n_mels", [80])
def test_pallas_mel_matches_xla(n_mels):
    rng = np.random.default_rng(0)
    audio = np.zeros((2, N_SAMPLES), np.float32)
    audio[0, : 16000 * 3] = rng.standard_normal(16000 * 3) * 0.1
    audio[1, : 16000 * 7] = rng.standard_normal(16000 * 7) * 0.05

    want = np.asarray(log_mel_spectrogram(audio, n_mels=n_mels))
    got = np.asarray(log_mel_spectrogram_pallas(audio, n_mels=n_mels, interpret=True))

    assert got.shape == want.shape == (2, n_mels, 3000)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
