"""Core VAE loss primitives (KL, reconstruction, reparameterization).

Semantics match the reference (/root/reference/ops.py:136-236) exactly:
per-sample sums over latent/pixel axes followed by the requested batch
reduction. All functions are pure and trace-time static in shape, so XLA
fuses them into surrounding compute.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def reparameterize(key: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """z = mu + exp(0.5*logvar) * eps with eps ~ N(0, I).

    Reference: ops.py:166-185. The PRNG is explicit (JAX style) instead of
    global torch RNG state.
    """
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, dtype=std.dtype)
    return mu + eps * std


def kl_no_reduce(logvar: jax.Array, mu: jax.Array) -> jax.Array:
    """Per-sample KL(q(z|x) || N(0, I)), summed over the latent axis.

    Reference: ops.py:161-163. Argument order (logvar, mu) preserved.
    """
    return -0.5 * jnp.sum(1.0 + logvar - jnp.exp(logvar) - jnp.square(mu), axis=1)


def kl_divergence(logvar: jax.Array, mu: jax.Array, reduce: str = "sum") -> jax.Array:
    """KL divergence with 'sum' | 'mean' | 'none' batch reduction.

    Reference: ops.py:136-158.
    """
    kl = kl_no_reduce(logvar, mu)
    if reduce == "sum":
        return jnp.sum(kl)
    if reduce == "mean":
        return jnp.mean(kl)
    return kl


def reconstruction_loss(
    x: jax.Array,
    recon_x: jax.Array,
    loss_type: str = "mse",
    reduction: str = "sum",
) -> jax.Array:
    """Reconstruction loss: per-pixel error summed per sample, then reduced.

    Matches reference semantics (ops.py:188-236): the target ``x`` is
    detached (stop_gradient), tensors are flattened per sample, the
    elementwise error is summed over pixels, and the per-sample vector is
    then reduced by 'sum' | 'mean' | 'none'.

    loss_type: 'mse' (squared error), 'l1' (absolute), or 'bce'
    (binary cross-entropy on probabilities, i.e. post-sigmoid inputs).
    """
    if reduction not in ("sum", "mean", "none"):
        raise NotImplementedError(f"reduction '{reduction}' not supported")

    batch = recon_x.shape[0]
    recon_flat = recon_x.reshape(batch, -1)
    x_flat = jax.lax.stop_gradient(x.reshape(batch, -1))

    if loss_type == "mse":
        err = jnp.square(recon_flat - x_flat)
    elif loss_type == "l1":
        err = jnp.abs(recon_flat - x_flat)
    elif loss_type == "bce":
        # torch F.binary_cross_entropy clamps log terms at -100.
        eps_log = -100.0
        log_p = jnp.maximum(jnp.log(recon_flat), eps_log)
        log_1mp = jnp.maximum(jnp.log1p(-recon_flat), eps_log)
        err = -(x_flat * log_p + (1.0 - x_flat) * log_1mp)
    else:
        raise NotImplementedError(f"loss_type '{loss_type}' not supported")

    per_sample = jnp.sum(err, axis=1)
    if reduction == "sum":
        return jnp.sum(per_sample)
    if reduction == "mean":
        return jnp.mean(per_sample)
    return per_sample


def entropy(x: np.ndarray, base=None, axis: int = 0, eps: float = 1e-9) -> np.ndarray:
    """Entropy of a sequence of classes/probabilities (host-side numpy).

    Used by the DCI disentanglement metric. Reference: ops.py:125-133.
    """
    if not isinstance(x, np.ndarray):
        raise TypeError("Input x has to be a numpy.ndarray object!")
    p = (x + eps) / np.sum(x + eps, axis=axis, keepdims=True)
    h = -np.sum(p * np.log(p + eps), axis=axis)
    if base is not None:
        h /= np.log(base + eps)
    return h
