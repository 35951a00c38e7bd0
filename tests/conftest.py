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

import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def small_fr_batch_bucket(monkeypatch):
    """Shrink the fused-path batch-size bucket floor (production: 64)
    so interpret-mode tests at b=3–4 don't drag 60 done-padding rows
    through the Python-level kernel interpreter.  The padding logic
    itself still runs whenever b isn't a power of two (and
    test_batch.py::test_fr_fused_batch_bucketing pins it directly)."""
    from sparse_linear_assignment_tpu import batch as batch_mod

    monkeypatch.setattr(batch_mod, "_FR_B_BUCKET_FLOOR", 4)
