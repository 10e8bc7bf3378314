"""Hidden-state cache IO.

The reference caches Whisper-encoder hidden-state stacks as one
``torch.save`` pickle per utterance/keyword (``.bin``,
src/utils.py:198-201) — 100k tiny pickles for the large catalogs.  This
framework's native format is plain ``.npy`` (zero-copy mmap-able, no torch
dependency); ``.bin`` files from the reference pipeline are read through
torch when it is importable, so existing caches keep working.
"""

from __future__ import annotations

import os


import numpy as np


def load_hidden_states(path: str) -> np.ndarray:
    """Load a [n_layers, T, D] hidden-state stack from ``.npy`` or a
    reference ``.bin`` (torch pickle).  Always returns float32 (f16-stored
    caches upcast on load)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32, copy=False)
    npy = os.path.splitext(path)[0] + ".npy"
    if os.path.exists(npy):
        return np.load(npy).astype(np.float32, copy=False)
    if os.path.exists(path):
        import torch  # optional, only for reference-format caches

        with open(path, "rb") as f:
            t = torch.load(f, map_location="cpu", weights_only=True)
        return t.detach().to(torch.float32).numpy()
    raise FileNotFoundError(path)


def save_hidden_states(path: str, hs: np.ndarray, dtype=np.float32) -> None:
    """``dtype=np.float16`` halves cache size + device-fetch bytes; the
    stacks are L2-normalized so the ~1e-3 relative rounding is far below
    the similarity scorer's decision margins (loaders upcast to f32)."""
    if not path.endswith(".npy"):
        path = os.path.splitext(path)[0] + ".npy"
    np.save(path, np.asarray(hs, dtype=dtype))


def hidden_states_exist(path: str) -> bool:
    return os.path.exists(path) or os.path.exists(os.path.splitext(path)[0] + ".npy")
