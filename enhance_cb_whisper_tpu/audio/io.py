"""Host-side audio IO: decode, resample, Whisper feature prep.

Replaces the reference's torchaudio/pydub/ffmpeg dependencies
(src/utils.py:179-184, src/data/dataset.py:322-342):

* WAV decode via the stdlib (PCM16/24/32/float32, mono-mixdown);
* resampling through the native C++ polyphase resampler
  (:mod:`.native`) when built, else scipy's polyphase;
* :func:`prepare_features` mirrors WhisperFeatureExtractor's
  padding/attention-mask semantics (truncate+pad to 30 s for shortform,
  pad-to-hop for longform) on top of the on-device mel kernel.
"""

from __future__ import annotations

import wave
from typing import Optional, Tuple

import numpy as np

from ..ops.mel import HOP_LENGTH, N_SAMPLES, SAMPLE_RATE, log_mel_spectrogram


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """Returns (waveform [n_samples] float32 in [-1, 1] mono, sample_rate)."""
    with wave.open(path, "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 3:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        ints = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        ints = np.where(ints >= 1 << 23, ints - (1 << 24), ints)
        data = ints.astype(np.float32) / float(1 << 23)
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels).mean(axis=1)
    return data, rate


def resample(waveform: np.ndarray, orig_sr: int, target_sr: int = SAMPLE_RATE) -> np.ndarray:
    """Polyphase resampling; native C++ kernel when available."""
    if orig_sr == target_sr:
        return waveform.astype(np.float32)
    try:
        from .native import resample_poly_native

        return resample_poly_native(waveform.astype(np.float32), orig_sr, target_sr)
    except (ImportError, OSError):
        from math import gcd

        from scipy.signal import resample_poly

        g = gcd(orig_sr, target_sr)
        return resample_poly(waveform, target_sr // g, orig_sr // g).astype(np.float32)


def _ffmpeg_decode(path: str, target_sr: int) -> np.ndarray:
    """Decode any format ffmpeg knows (mp3/opus/... — the MLS corpora ship
    opus) to 16 kHz mono float32 via a subprocess pipe."""
    import shutil
    import subprocess

    if shutil.which("ffmpeg") is None:
        raise RuntimeError(
            f"cannot decode {path}: not a WAV file and no ffmpeg binary on "
            "PATH (the reference requires ffmpeg for mp3/opus too, README:18)"
        )
    out = subprocess.run(
        [
            "ffmpeg", "-nostdin", "-threads", "0", "-i", path,
            "-f", "f32le", "-ac", "1", "-acodec", "pcm_f32le",
            "-ar", str(target_sr), "-",
        ],
        capture_output=True,
        check=True,
    )
    return np.frombuffer(out.stdout, np.float32).copy()


def load_audio_16k(path: str) -> np.ndarray:
    if path.lower().endswith(".wav"):
        try:
            wav, sr = read_wav(path)
        except Exception:
            # stdlib `wave` only reads integer PCM ("unknown format: 3" for
            # IEEE-float32 WAVs, a common sox/soundfile output) — fall back
            # to ffmpeg like the non-WAV formats
            return _ffmpeg_decode(path, SAMPLE_RATE)
        return resample(wav, sr, SAMPLE_RATE)
    return _ffmpeg_decode(path, SAMPLE_RATE)


def prepare_features(
    waveform: np.ndarray, n_mels: int = 80
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """(input_features [1, n_mels, T], attention_mask [1, T_samples_padded])
    with WhisperFeatureExtractor semantics: <=30 s audio is padded/truncated
    to exactly 30 s ('max_length'); longer audio is padded to a hop multiple
    ('longest') with the true-sample attention mask."""
    n = waveform.shape[-1]
    if n <= N_SAMPLES:
        padded = np.zeros((N_SAMPLES,), np.float32)
        padded[:n] = waveform[:N_SAMPLES]
        mask = np.zeros((N_SAMPLES,), np.int32)
        mask[: min(n, N_SAMPLES)] = 1
    else:
        target = ((n + HOP_LENGTH - 1) // HOP_LENGTH) * HOP_LENGTH
        padded = np.zeros((target,), np.float32)
        padded[:n] = waveform
        mask = np.zeros((target,), np.int32)
        mask[:n] = 1
    features = np.asarray(log_mel_spectrogram(padded[None], n_mels=n_mels))
    # frame-level attention mask (1 frame per hop, matching feature length)
    frame_mask = mask[:: HOP_LENGTH][: features.shape[-1]]
    return features, frame_mask[None]
