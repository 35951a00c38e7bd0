"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests use XLA's
host-platform virtual devices.  Must run before the first jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (the TPU tunnel) already latched; override through
# the config API, which works until the backend is first used.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
