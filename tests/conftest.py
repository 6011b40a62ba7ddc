"""Test harness config: force an 8-device virtual CPU platform BEFORE jax
import so multi-chip sharding tests run anywhere (the driver separately
dry-runs the multichip path)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize may have already imported jax with JAX_PLATFORMS=axon;
# force the CPU platform via config (effective until a backend is used).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
