"""Test configuration: force CPU with 8 virtual devices and float64.

Multi-device sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), mirroring how the driver validates
the multi-chip path without a TPU pod.  Float64 lets golden numerics tests
run the full 1e-12 residual targets of the reference protocol.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the TPU tunnel backend
# (JAX_PLATFORMS=axon); an explicit config update is the only reliable
# override, and it must happen before any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    import random

    return random.Random(1234)
