"""Test configuration: run everything on a virtual 8-device CPU mesh.

Environment variables must be set before JAX initializes its backends, hence
the top-of-file placement (standard JAX trick for testing pjit/shard_map
without real TPUs; see SURVEY.md §4).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
