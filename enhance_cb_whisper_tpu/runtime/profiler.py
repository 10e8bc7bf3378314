"""Profiling + throughput counters.

The reference exposes only Lightning's (unused) ``profiler`` config key
(SURVEY.md §5).  Here:

* :func:`trace` — context manager around ``jax.profiler`` producing a
  Perfetto-compatible trace directory;
* :func:`device_op_breakdown` — parse the captured Chrome trace into
  per-op device time (leaf XLA ops only, loop iterations summed), the tool
  that separates device time from the relay's host round-trips — wall
  clock through the remote relay over-counts by ~30-500 ms per fetch;
* :class:`RTFxMeter` — real-time-factor counter for ASR eval loops
  (seconds of audio transcribed per second of wall clock), the headline
  throughput metric the reference never measured (BASELINE.md).
"""

from __future__ import annotations

import contextlib
import glob
import gzip
import json
import time
from typing import Dict, List, Optional, Tuple


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_op_breakdown(log_dir: str) -> Tuple[float, List[Dict]]:
    """Aggregate device-side op durations from a :func:`trace` capture.

    Returns ``(total_device_seconds, ops)`` where ``ops`` is a list of
    ``{"name", "seconds", "count"}`` sorted by total time, leaf ops only
    (an op nested inside another on the same device track is not
    double-counted; loop iterations of the same op are summed).  Reads the
    newest ``*.trace.json.gz`` under ``log_dir``.
    """
    files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(files[-1]) as f:
        events = json.load(f).get("traceEvents", [])

    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "CPU" not in (e.get("args", {}).get("name") or "CPU")
    }
    # whole-module events ("jit_fn" on the XLA Modules track) duplicate the
    # per-op tracks — keep op tracks only when both exist
    thread_names = {
        (e["pid"], e["tid"]): (e.get("args", {}).get("name") or "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    agg: Dict[str, float] = {}
    cnt: Dict[str, int] = {}
    by_track: Dict[Tuple, List[dict]] = {}
    for e in events:
        if e.get("ph") == "X" and e["pid"] in device_pids:
            by_track.setdefault((e["pid"], e.get("tid")), []).append(e)
    op_tracks = {
        key for key in by_track if "module" not in thread_names.get(key, "").lower()
    }
    if op_tracks and len(op_tracks) < len(by_track):
        by_track = {k: v for k, v in by_track.items() if k in op_tracks}
    for track in by_track.values():
        track.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack: List[dict] = []
        for e in track:
            while stack and stack[-1]["ts"] + stack[-1].get("dur", 0) <= e["ts"]:
                stack.pop()
            if stack:
                stack[-1]["_parent"] = True
            stack.append(e)
        for e in track:
            if not e.pop("_parent", False):
                agg[e["name"]] = agg.get(e["name"], 0.0) + e.get("dur", 0) / 1e6
                cnt[e["name"]] = cnt.get(e["name"], 0) + 1
    ops = [
        {"name": name, "seconds": round(sec, 6), "count": cnt[name]}
        for name, sec in sorted(agg.items(), key=lambda kv: -kv[1])
    ]
    return sum(agg.values()), ops


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
