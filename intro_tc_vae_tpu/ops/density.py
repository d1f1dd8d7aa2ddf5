"""Gaussian log densities and minibatch importance sampling for the
β-TC-VAE total-correlation estimator.

Numerics reproduce the reference (/root/reference/ops.py:15-115) including
its two deliberate quirks:

* the variance floor ``eps=1e-4`` of ``F.gaussian_nll_loss`` (variance —
  not |x-mu| — is clamped from below) and the ``max(log_prob, -50)`` clamp,
* the stratified importance-weight matrix column layout produced by the
  strided flat writes in the original beta-tcvae code (column 0 = 1/N,
  column 1 = strat_weight, remainder 1/M, with W[M-1, 0] = strat_weight).

Unlike the reference (quirk Q8), the weight matrix is a compile-time
constant: it is built once per (batch, dataset) pair on the host and
constant-folded by XLA.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_LOG_2PI = math.log(2.0 * math.pi)
_LOG_PROB_FLOOR = -50.0
_VAR_FLOOR = 1e-4


def gaussian_log_density_nll(
    x: jax.Array, mu: jax.Array, logvar: jax.Array
) -> jax.Array:
    """log N(x | mu, exp(logvar)) with the gaussian_nll_loss variance floor.

    Matches reference ``gaussian_log_density_torch`` (ops.py:15-21):
    var is clamped to >= 1e-4 and the result is clamped to >= -50.
    """
    var = jnp.maximum(jnp.exp(logvar), _VAR_FLOOR)
    log_prob = -0.5 * (jnp.log(var) + jnp.square(x - mu) / var + _LOG_2PI)
    return jnp.maximum(log_prob, _LOG_PROB_FLOOR)


def gaussian_log_density(x: jax.Array, mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """Plain Gaussian log density (no variance floor), clamped to >= -50.

    Matches reference ``gaussian_log_density`` (ops.py:24-29).
    """
    inv_sigma = jnp.exp(-logvar)
    tmp = x - mu
    log_prob = -0.5 * (tmp * tmp * inv_sigma + logvar + _LOG_2PI)
    return jnp.maximum(log_prob, _LOG_PROB_FLOOR)


@functools.lru_cache(maxsize=64)
def _log_importance_weight_matrix_np(batch_size: int, dataset_size: int) -> np.ndarray:
    """Host-side construction of the stratified-sampling log-weight matrix.

    Reproduces the strided flat-write layout of the reference
    (ops.py:32-49, after rtqichen/beta-tcvae): with M = B-1 the flat
    stride M+1 == B walks down a *column*, so the matrix is
    column-structured, not diagonal-structured:

        W[:, 0]   = 1/N        (except W[M-1, 0] = strat_weight)
        W[:, 1]   = strat_weight
        W[:, 2:]  = 1/M
    """
    n = float(dataset_size)
    m = batch_size - 1
    strat_weight = (n - m) / (n * m)
    w = np.full((batch_size, batch_size), 1.0 / m, dtype=np.float64)
    flat = w.reshape(-1)
    flat[:: m + 1] = 1.0 / n
    flat[1 :: m + 1] = strat_weight
    w[m - 1, 0] = strat_weight
    return np.log(w).astype(np.float32)


def log_importance_weight_matrix(batch_size: int, dataset_size: int) -> jax.Array:
    """Log importance-weight matrix for minibatch stratified sampling.

    batch_size and dataset_size must be Python ints (static); the matrix is
    cached host-side and becomes an XLA constant.
    """
    return jnp.asarray(_log_importance_weight_matrix_np(int(batch_size), int(dataset_size)))


def minibatch_weighted_sampling(
    log_qz_prob: jax.Array, batch_size: int, dataset_size: int
):
    """Minibatch-weighted estimate of (log prod_l q(z_l), log q(z)).

    Reference: ops.py:92-101.
    """
    log_bn = math.log(batch_size * dataset_size)
    logqz_prodmarginals = jnp.sum(
        jax.scipy.special.logsumexp(log_qz_prob, axis=1) - log_bn, axis=1
    )
    log_qz = jax.scipy.special.logsumexp(jnp.sum(log_qz_prob, axis=2), axis=1) - log_bn
    return logqz_prodmarginals, log_qz


def minibatch_stratified_sampling(
    log_qz_prob: jax.Array, batch_size: int, dataset_size: int
):
    """Minibatch-stratified estimate of (log prod_l q(z_l), log q(z)).

    Reference: ops.py:104-115. ``log_qz_prob`` is the [B, B, z] tensor of
    log q(z(x_j)_l | x_i).
    """
    log_iw = log_importance_weight_matrix(batch_size, dataset_size)
    logqz_prodmarginals = jnp.sum(
        jax.scipy.special.logsumexp(log_iw[:, :, None] + log_qz_prob, axis=1), axis=1
    )
    log_qz = jax.scipy.special.logsumexp(log_iw + jnp.sum(log_qz_prob, axis=2), axis=1)
    return logqz_prodmarginals, log_qz


def on_off_diag(x: jax.Array):
    """Split a square matrix into its diagonal and off-diagonal parts.

    Reference: ops.py:118-122.
    """
    diag = jnp.diagonal(x)
    off_diag = x - jnp.diag(jnp.diagonal(x))
    return diag, off_diag
