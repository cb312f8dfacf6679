"""Test configuration: run everything on a virtual 8-device CPU mesh.

NOTE: in this environment the ``JAX_PLATFORMS`` env var is ignored (an
axon/TPU PJRT plugin takes precedence), so the backend must be forced via
``jax.config`` BEFORE the backend initializes — hence the top-of-file
placement. 8 virtual CPU devices enable pjit/shard_map tests without real
TPUs (SURVEY.md §4).
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
# Parity tests against torch goldens need f32 matmuls (the TPU/bf16 default
# would cost ~1e-3 error); training itself opts into bf16 explicitly.
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jax_devices():
    devices = jax.devices()
    assert len(devices) == 8, f"expected 8 virtual CPU devices, got {devices}"
    return devices
