"""Pallas-fused STFT → mel → log10 kernel for the Whisper front-end.

One kernel pass produces the log-mel spectrogram without ever materializing
the [B, 3001, 201] power spectrogram in HBM (the XLA version in
:mod:`.mel` stages it between the DFT and mel matmuls):

* framing is expressed as three contiguous 160-sample block slices — the
  padded audio reshaped to [n_blocks, hop] lets frame ``f`` read blocks
  ``f, f+1, f+2`` (480 samples ⊇ the 400-sample window) with static slices,
  no gathers;
* the windowed real-DFT is two [480, 256] matmuls (columns ≥ 201 zero, rows
  ≥ 400 zero — padding keeps the MXU tiles aligned);
* power → mel filterbank matmul → log10 happen in VMEM registers;
* the per-audio dynamic-range compression (global max − 8, (x+4)/4) is a
  cheap elementwise epilogue left to XLA, since it needs a global reduction.

Numerics match :func:`..ops.mel.log_mel_spectrogram` (tested) and therefore
HF's WhisperFeatureExtractor.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .mel import HOP_LENGTH, N_FFT, N_SAMPLES, mel_filter_bank

FRAMES_PER_CHUNK = 200  # 3000/200 chunks; multiple of 8 sublanes
WINDOW_BLOCKS = 3  # 3 * 160 = 480 >= n_fft 400
PAD_BINS = 256  # 201 freq bins padded to an MXU-friendly lane count


@lru_cache(maxsize=2)
def _padded_dft_matrices():
    window = 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(N_FFT) / N_FFT))
    k = np.arange(N_FFT // 2 + 1)
    n = np.arange(N_FFT)
    angle = -2.0 * np.pi * np.outer(n, k) / N_FFT
    cos_m = np.zeros((WINDOW_BLOCKS * HOP_LENGTH, PAD_BINS), np.float32)
    sin_m = np.zeros((WINDOW_BLOCKS * HOP_LENGTH, PAD_BINS), np.float32)
    cos_m[:N_FFT, : N_FFT // 2 + 1] = np.cos(angle) * window[:, None]
    sin_m[:N_FFT, : N_FFT // 2 + 1] = np.sin(angle) * window[:, None]
    return cos_m, sin_m


@lru_cache(maxsize=4)
def _padded_mel_fb(n_mels: int):
    fb = np.zeros((PAD_BINS, n_mels), np.float32)
    fb[: N_FFT // 2 + 1] = mel_filter_bank(n_mels)
    return fb


def _mel_kernel(b0_ref, b1_ref, b2_ref, cos_ref, sin_ref, fb_ref, out_ref):
    # b{0,1,2}_ref: [1, F, hop] — frame f's 480-sample window split into its
    # three 160-sample hop blocks, pre-shifted host-side so every kernel
    # operand is tile-aligned (Mosaic cannot concat row-offset slices).
    # The windowed DFT over the 480-wide frame becomes a sum of three
    # matmuls against the corresponding 160-row bands of the DFT matrices.
    hop = HOP_LENGTH
    b0 = b0_ref[0]
    b1 = b1_ref[0]
    b2 = b2_ref[0]

    # precision=HIGHEST: the TPU MXU otherwise rounds operands to bfloat16,
    # which costs ~2 decimal digits through the power/log pipeline
    hi = jax.lax.Precision.HIGHEST

    def dft(m_ref):
        return (
            jnp.dot(b0, m_ref[0:hop, :], preferred_element_type=jnp.float32, precision=hi)
            + jnp.dot(b1, m_ref[hop : 2 * hop, :], preferred_element_type=jnp.float32, precision=hi)
            + jnp.dot(b2, m_ref[2 * hop : 3 * hop, :], preferred_element_type=jnp.float32, precision=hi)
        )

    re = dft(cos_ref)
    im = dft(sin_ref)
    power = re * re + im * im
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32, precision=hi)
    out_ref[0, :, :] = jnp.log10(jnp.maximum(mel, 1e-10))


def log_mel_spectrogram_pallas(
    audio: jax.Array, n_mels: int = 80, interpret: bool = False
) -> jax.Array:
    """audio [B, N_SAMPLES] (exactly 30 s, 16 kHz) → log-mel [B, n_mels, 3000].

    Drop-in for :func:`..ops.mel.log_mel_spectrogram` on fixed 30 s windows
    (the shape every encoder segment uses)."""
    from jax.experimental import pallas as pl

    assert audio.shape[-1] == N_SAMPLES, "pallas mel kernel expects 30 s windows"
    b = audio.shape[0]
    n_frames = N_SAMPLES // HOP_LENGTH  # 3000
    n_chunks = n_frames // FRAMES_PER_CHUNK

    pad = N_FFT // 2
    padded = jnp.pad(audio.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    # pad tail so the reshape to hop blocks covers the final window reads
    n_blocks = n_frames + WINDOW_BLOCKS  # 3003 blocks of 160
    total = n_blocks * HOP_LENGTH
    padded = jnp.pad(padded, ((0, 0), (0, total - padded.shape[1])))
    blocks = padded.reshape(b, n_blocks, HOP_LENGTH)

    cos_m, sin_m = _padded_dft_matrices()
    fb = _padded_mel_fb(n_mels)

    b0 = blocks[:, 0:n_frames, :]
    b1 = blocks[:, 1 : n_frames + 1, :]
    b2 = blocks[:, 2 : n_frames + 2, :]

    f = FRAMES_PER_CHUNK
    log_mel = pl.pallas_call(
        _mel_kernel,
        grid=(b, n_chunks),
        in_specs=[
            pl.BlockSpec((1, f, HOP_LENGTH), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, f, HOP_LENGTH), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, f, HOP_LENGTH), lambda i, j: (i, j, 0)),
            pl.BlockSpec((cos_m.shape[0], PAD_BINS), lambda i, j: (0, 0)),
            pl.BlockSpec((sin_m.shape[0], PAD_BINS), lambda i, j: (0, 0)),
            pl.BlockSpec((PAD_BINS, fb.shape[1]), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, f, n_mels), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n_frames, n_mels), jnp.float32),
        interpret=interpret,
    )(b0, b1, b2, jnp.asarray(cos_m), jnp.asarray(sin_m), jnp.asarray(fb))
    log_mel = jnp.swapaxes(log_mel, -1, -2)  # [B, n_mels, n_frames]

    # dynamic-range compression epilogue (global per-audio max)
    max_val = jnp.max(log_mel, axis=(-2, -1), keepdims=True)
    log_mel = jnp.maximum(log_mel, max_val - 8.0)
    return (log_mel + 4.0) / 4.0
