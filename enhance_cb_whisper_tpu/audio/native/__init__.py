"""ctypes bindings for the native C++ resampler, compiled on demand.

The shared object is built once with g++ into the package directory (or
``$ECW_NATIVE_CACHE``); environments without a toolchain silently fall back
to the scipy path in :mod:`..io`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from math import gcd

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "resample.cpp")
_LIB_PATH = os.environ.get(
    "ECW_NATIVE_CACHE", os.path.join(os.path.dirname(__file__), "_resample.so")
)
_lib = None


def _build() -> str:
    if not os.path.exists(_LIB_PATH) or os.path.getmtime(_LIB_PATH) < os.path.getmtime(_SRC):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _LIB_PATH]
        subprocess.run(cmd, check=True, capture_output=True)
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_build())
        lib.resample_poly.restype = ctypes.c_int
        lib.resample_poly.argtypes = [
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64,
            ctypes.c_int,
            ctypes.c_int,
        ]
        _lib = lib
    return _lib


def resample_poly_native(waveform: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    lib = _load()
    g = gcd(orig_sr, target_sr)
    up, down = target_sr // g, orig_sr // g
    x = np.ascontiguousarray(waveform, dtype=np.float32)
    n_out = -(-x.size * up // down)  # ceil
    out = np.empty((n_out,), np.float32)
    ret = lib.resample_poly(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_out,
        up,
        down,
    )
    if ret != 0:
        raise RuntimeError("native resample_poly failed")
    return out
