"""Test configuration: force an 8-virtual-device CPU backend so sharding and
multi-chip paths are exercised without TPU hardware.

Note: this environment's sitecustomize imports jax at interpreter startup, so
JAX_PLATFORMS env tweaks here are too late — use jax.config instead (backend
selection is lazy until first device use)."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
