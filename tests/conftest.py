"""Test harness: force an 8-virtual-device CPU platform before jax imports.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count=8), the JAX-recommended way to test
Mesh/NamedSharding code without a TPU pod.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU matmuls deterministic/fp32 for golden-value comparisons.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
