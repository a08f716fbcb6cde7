"""Test environment: force an 8-virtual-device CPU platform BEFORE jax import
so shard_map/mesh tests run without TPU hardware (SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The environment pins JAX_PLATFORMS to the TPU plugin; the config update
# (post-import, pre-compute) reliably forces the 8-virtual-device CPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
