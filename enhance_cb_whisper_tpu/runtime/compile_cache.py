"""Persistent XLA compilation cache for bench/eval entry points.

The TPU relay in this environment compiles remotely and slowly (~5 min for
medium programs, ~35 min for the bf16 ResNet-50 catalog program —
BASELINE.md). JAX's persistent compilation cache serializes compiled
executables to disk keyed on (HLO, compile options, backend version), so a
recompile across processes/rounds becomes a cache read. The reference has
no analogue (torch eager); this replaces "pay the compile every run".
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/ecw_xla_cache")


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Route all jit compiles through a disk cache; returns the directory.

    Call before the first compile (config updates apply to subsequent
    compiles only). Thresholds are zeroed so even small programs cache —
    the relay round-trip dominates, not executable size.

    ``ECW_COMPILE_CACHE`` overrides the directory; the values ``off`` /
    ``0`` / ``none`` disable the cache entirely (returns ""). The setting
    is process-global (``jax_compilation_cache_dir``), so anything that
    must sandbox its writes — e.g. the test suite, tests/conftest.py —
    points ``ECW_COMPILE_CACHE`` at a private tmpdir BEFORE the first
    entry point runs: a shared cache directory raced by concurrent
    processes has segfaulted JAX's cache write.
    """
    import jax

    cache_dir = cache_dir or os.environ.get("ECW_COMPILE_CACHE", DEFAULT_CACHE_DIR)
    if cache_dir.lower() in ("off", "0", "none", ""):
        return ""
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
