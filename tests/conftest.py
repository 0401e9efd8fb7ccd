"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes (any jax import triggers backend
selection), hence the env mutation at module import time.
"""

import os

# The ambient env pins JAX_PLATFORMS=axon (one real TPU chip); tests run on a
# virtual 8-device CPU mesh instead.
os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs
