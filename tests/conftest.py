"""Test configuration: force an 8-device virtual CPU mesh.

The TPU analogue of "test multi-node without a cluster" (SURVEY.md §4):
all sharding/collective tests run on XLA's host platform with 8 virtual
devices, so the full multi-chip code path compiles and executes in CI
without TPU hardware.

Note: the environment's sitecustomize imports jax at interpreter start with
JAX_PLATFORMS=axon, so the env var alone is too late — we must override via
jax.config before any backend is initialized.
"""

import os
import tempfile

# Isolate the persistent XLA compile cache for this test session: the
# in-process CLI tests call run_cli() -> enable_persistent_cache(), which
# flips the GLOBAL jax_compilation_cache_dir for the remainder of the
# pytest process.  Left at the default (~/.cache/ecw_xla_cache) every later
# test writes into a directory shared with concurrently-running bench/sweep
# processes — which segfaulted JAX's cache write mid-suite (round-3 judge
# run).  A fresh per-session tmpdir keeps all writes inside the sandbox.
os.environ.setdefault(
    "ECW_COMPILE_CACHE", tempfile.mkdtemp(prefix="ecw_test_xla_cache_")
)

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
