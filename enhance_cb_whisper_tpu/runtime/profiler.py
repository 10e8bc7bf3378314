"""Profiling + throughput counters.

The reference exposes only Lightning's (unused) ``profiler`` config key
(SURVEY.md §5).  Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto-compatible trace directory;
* :class:`RTFxMeter` — real-time-factor counter for ASR eval loops
  (seconds of audio transcribed per second of wall clock), the headline
  throughput metric the reference never measured (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class RTFxMeter:
    def __init__(self):
        self.audio_seconds = 0.0
        self.wall_seconds = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, audio_seconds: float):
        assert self._t0 is not None, "call start() first"
        self.wall_seconds += time.perf_counter() - self._t0
        self.audio_seconds += audio_seconds
        self._t0 = None

    @property
    def rtfx(self) -> float:
        return self.audio_seconds / self.wall_seconds if self.wall_seconds else 0.0

    def summary(self) -> dict:
        return {
            "audio_seconds": round(self.audio_seconds, 3),
            "wall_seconds": round(self.wall_seconds, 3),
            "rtfx": round(self.rtfx, 3),
        }
