"""Torch-compatible parameter initializers.

The reference relies on PyTorch's default inits (kaiming_uniform with
a=sqrt(5) for conv/linear weights, fan_in-uniform for biases). Matching
them keeps early-training loss curves comparable between the rebuild and
the reference, which is the parity surface BASELINE.md names.

kaiming_uniform(a=sqrt(5)) reduces to U(-sqrt(1/fan_in), sqrt(1/fan_in)):
bound = sqrt(6 / ((1 + a^2) * fan_in)) = sqrt(6 / (6 * fan_in)).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _fan_in(shape, layout: str) -> int:
    if layout == "conv":  # flax conv kernel: (kh, kw, in_ch, out_ch)
        kh, kw, in_ch, _ = shape
        return int(kh * kw * in_ch)
    # dense kernel: (in_features, out_features)
    return int(shape[0])


def torch_kernel_init(layout: str = "conv"):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default weight init."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(_fan_in(shape, layout))
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


def torch_bias_init(fan_in: int):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch's default bias init."""

    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / np.sqrt(fan_in)
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init
