"""Test harness: force an 8-virtual-device CPU platform before jax imports.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count=8), the JAX-recommended way to test
Mesh/NamedSharding code without a TPU pod.
"""

import os

# The machine environment presets JAX_PLATFORMS=axon (the TPU tunnel);
# tests must run on the virtual CPU mesh — force, don't setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep CPU matmuls deterministic/fp32 for golden-value comparisons.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")

import jax

# The axon TPU plugin overrides JAX_PLATFORMS at registration time; the
# config knob wins over the plugin, so set it too.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)
