"""Whisper log-mel spectrogram front-end, as MXU matmuls.

Replaces the reference's host-side ``WhisperFeatureExtractor`` (numpy STFT,
reference src/utils.py:186-187, src/data/dataset.py:332-342) with an
on-device pipeline:

    frame (strided gather) → window → DFT (two matmuls) → power →
    mel filterbank (matmul) → log10 → dynamic-range compression

Exact Whisper semantics: n_fft=400, hop=160, periodic Hann window,
center=True with reflect padding, the last STFT frame dropped, slaney-scale
slaney-normalized mel filters, ``log10(clip(, 1e-10))``, clamp to
``max - 8``, then ``(x + 4) / 4``.  The max is taken over the whole padded
spectrogram of each audio, matching HF bit-for-bit on 30 s inputs.

The DFT is expressed as two [400, 201] matmuls instead of an FFT — on TPU
this runs on the MXU and fuses with the mel matmul; at 3000 frames the whole
front-end is a few microseconds of matmul time, vs milliseconds of host numpy
in the reference.  A Pallas-fused variant lives in :mod:`.mel_pallas`.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
N_SAMPLES = 30 * SAMPLE_RATE  # 480000: whisper's fixed 30 s window
N_FRAMES = N_SAMPLES // HOP_LENGTH  # 3000 mel frames per 30 s segment


def _hertz_to_mel(freq):
    """Slaney mel scale (linear below 1 kHz, log above)."""
    freq = np.asarray(freq, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = 27.0 / np.log(6.4)
    mels = 3.0 * freq / 200.0
    return np.where(
        freq >= min_log_hertz,
        min_log_mel + np.log(np.maximum(freq, 1e-10) / min_log_hertz) * logstep,
        mels,
    )


def _mel_to_hertz(mels):
    mels = np.asarray(mels, dtype=np.float64)
    min_log_hertz = 1000.0
    min_log_mel = 15.0
    logstep = np.log(6.4) / 27.0
    freq = 200.0 * mels / 3.0
    return np.where(
        mels >= min_log_mel,
        min_log_hertz * np.exp(logstep * (mels - min_log_mel)),
        freq,
    )


@lru_cache(maxsize=8)
def mel_filter_bank(n_mels: int = 80, n_freqs: int = N_FFT // 2 + 1,
                    sample_rate: int = SAMPLE_RATE) -> np.ndarray:
    """[n_freqs, n_mels] slaney-normalized triangular filters — identical to
    ``transformers.audio_utils.mel_filter_bank(..., norm='slaney',
    mel_scale='slaney')`` used by WhisperFeatureExtractor."""
    fft_freqs = np.linspace(0, sample_rate // 2, n_freqs)
    mel_min = _hertz_to_mel(0.0)
    mel_max = _hertz_to_mel(sample_rate / 2.0)
    mel_freqs = _mel_to_hertz(np.linspace(mel_min, mel_max, n_mels + 2))

    fdiff = np.diff(mel_freqs)
    slopes = mel_freqs[None, :] - fft_freqs[:, None]
    down = -slopes[:, :-2] / fdiff[None, :-1]
    up = slopes[:, 2:] / fdiff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))

    enorm = 2.0 / (mel_freqs[2 : n_mels + 2] - mel_freqs[:n_mels])
    fb *= enorm[None, :]
    return fb.astype(np.float32)


@lru_cache(maxsize=2)
def _dft_matrices(n_fft: int = N_FFT):
    """Windowed real-DFT matrices [n_fft, n_fft//2+1] (window folded in)."""
    # periodic Hann, exactly torch.hann_window(400) / np.hanning-style periodic
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft))
    k = np.arange(n_fft // 2 + 1)
    n = np.arange(n_fft)
    angle = -2.0 * np.pi * np.outer(n, k) / n_fft
    cos_m = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_m = (np.sin(angle) * window[:, None]).astype(np.float32)
    return cos_m, sin_m


def _frame(audio: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """Centered framing with reflect padding; includes the final frame that
    whisper's pipeline computes and then drops."""
    pad = n_fft // 2
    padded = jnp.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(pad, pad)], mode="reflect")
    num_frames = 1 + audio.shape[-1] // hop
    starts = np.arange(num_frames) * hop
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    return padded[..., idx]  # [..., num_frames, n_fft]


def log_mel_spectrogram(
    audio: jax.Array,
    n_mels: int = 80,
) -> jax.Array:
    """audio [..., n_samples] (16 kHz float) → log-mel [..., n_mels, T].

    The caller pads/truncates to a fixed window (e.g. 30 s → 3000 frames);
    the dynamic-range max is taken over the full spectrogram exactly like
    WhisperFeatureExtractor.

    Fixed 30 s [B, N_SAMPLES] batches on TPU route through the fused
    Pallas kernel (:mod:`.mel_pallas`) — measured **4.14×** over this XLA
    lowering on a v5e (tools/bench_mel.py round 4: 2.18 vs 9.0 ms per
    batch of 8, result sum rel-diff 1e-7; the flash-attention rule — a
    kernel ships only with a measured win — satisfied).  ``ECW_MEL=xla``
    forces the XLA path; other shapes (e.g. full-utterance longform mel)
    always use it.
    """
    if (
        os.environ.get("ECW_MEL", "pallas") == "pallas"
        and getattr(audio, "ndim", 0) == 2
        and audio.shape[-1] == N_SAMPLES
        and jax.default_backend() != "cpu"
    ):
        from .mel_pallas import log_mel_spectrogram_pallas

        return log_mel_spectrogram_pallas(audio, n_mels)
    frames = _frame(audio.astype(jnp.float32), N_FFT, HOP_LENGTH)
    cos_m, sin_m = _dft_matrices()
    re = jnp.einsum("...tn,nk->...tk", frames, cos_m, precision="highest")
    im = jnp.einsum("...tn,nk->...tk", frames, sin_m, precision="highest")
    power = re * re + im * im  # [..., T+1, n_freqs]
    power = power[..., :-1, :]  # whisper drops the final frame

    fb = jnp.asarray(mel_filter_bank(n_mels))
    mel = jnp.einsum("...tk,km->...tm", power, fb, precision="highest")
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    max_val = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
    log_spec = jnp.maximum(log_spec, max_val - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return jnp.swapaxes(log_spec, -1, -2)  # [..., n_mels, T]


def pad_or_trim(audio: np.ndarray, length: int = N_SAMPLES) -> np.ndarray:
    """Right-pad with zeros / truncate to ``length`` samples (host-side)."""
    if audio.shape[-1] >= length:
        return audio[..., :length]
    pad = length - audio.shape[-1]
    return np.pad(audio, [(0, 0)] * (audio.ndim - 1) + [(0, pad)])
