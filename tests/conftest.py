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

# Disable the persistent XLA compile cache for the test session: the
# in-process CLI tests call run_cli() -> enable_persistent_cache(), which
# flips the GLOBAL jax_compilation_cache_dir for the remainder of the
# pytest process.  Round 3's fix sandboxed the directory to a per-session
# tmpdir (a shared ~/.cache dir raced by concurrent sweeps segfaulted the
# cache WRITE), but round 4 reproduced a segfault in the cache READ
# (jax compilation_cache.py:get_executable_and_time) ~70% into the suite
# with a fully PRIVATE single-process cache dir — the crash is inside
# JAX's cache deserialization under long-suite conditions, not our race.
# CPU test compiles are cheap; the cache buys nothing here and is the
# suite's only segfault source — force it off.  Tests that exercise the
# cache machinery itself pass an explicit directory.
os.environ.setdefault("ECW_COMPILE_CACHE", "off")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


# ---------------------------------------------------------------------------
# Periodic compiled-cache clearing: three independent full-suite segfaults
# (round-3 judge run + two round-4 runs) all landed ~70-90% into the suite
# INSIDE XLA:CPU compile paths (persistent-cache write, persistent-cache
# read, and - with the persistent cache off - backend_compile_and_load
# itself), while the affected tests pass when run alone.  The common factor
# is per-process accumulation across the suite's ~2000 compiled programs.
# Dropping JAX's executable caches every N tests bounds that accumulation;
# the recompiles cost a few % wall time on CPU.
import gc  # noqa: E402

import pytest  # noqa: E402

_CLEAR_EVERY = int(os.environ.get("ECW_TEST_CLEAR_CACHES_EVERY", "40"))
_test_count = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_jax_cache_clear():
    yield
    _test_count["n"] += 1
    if _CLEAR_EVERY and _test_count["n"] % _CLEAR_EVERY == 0:
        jax.clear_caches()
        gc.collect()


# ---------------------------------------------------------------------------
# Tiered gate (VERDICT r4 #8): `pytest -m smoke` runs one representative test
# per subsystem (a parity, a differential, a mesh, a packed-decode case, ...)
# in a few minutes for in-round iteration; the FULL suite stays the
# round-end gate.  Curated centrally here so test files stay untouched.
# None = the whole file; a set = those test functions (parametrized cases
# match by original name).
_SMOKE = {
    "test_whisper_parity.py": {"test_encoder_matches_hf",
                               "test_decoder_teacher_forcing_matches_hf"},
    "test_decoding_parity.py": {"test_longform_matches_hf"},
    "test_resnet_parity.py": None,
    "test_collator_differential.py": None,
    "test_parallel.py": {"test_dp_train_step_matches_single_device",
                         "test_packed_mesh_serving_decode_matches_single"},
    "test_packed_decode.py": {"test_packed_schedule_independent_with_spotting"},
    "test_efficient_catalog.py": {"test_cascade_planted_match_survives_shortlist"},
    "test_quant.py": {"test_quantized_catalog_scoring_ordering"},
    "test_metrics.py": None,
    "test_mel.py": None,
    "test_runtime.py": {"test_checkpoint_roundtrip", "test_rtfx_meter"},
    "test_train_step.py": {"test_adversarial_training_with_entropy"},
    "test_cli.py": {"test_cli_fit_then_test"},
    "test_fallback_ladder.py": None,
}


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "smoke: fast per-subsystem representative subset "
        "(`pytest -m smoke`, ~5 min; full suite stays the round-end gate)"
    )


def pytest_collection_modifyitems(config, items):
    for item in items:
        fname = os.path.basename(str(item.fspath))
        names = _SMOKE.get(fname, "absent")
        if names == "absent":
            continue
        base = getattr(item, "originalname", None) or item.name.split("[")[0]
        if names is None or base in names:
            item.add_marker(pytest.mark.smoke)
