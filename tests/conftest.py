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

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
