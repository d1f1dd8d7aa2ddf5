"""Total-correlation estimators (the kernel-worthy math of β-TC-VAE).

The minibatch TC estimate needs the [B, B, z] tensor of pairwise latent
log densities log q(z(x_j)_l | x_i) followed by two logsumexp reductions
over the i axis (reference ops.py:52-115). Two implementations:

* ``impl='xla'``   — direct jnp; XLA fuses the density + reductions. The
  [B, B, z] intermediate lives in registers/VMEM for small B.
* ``impl='pallas'`` — blockwise streaming-logsumexp Pallas kernel
  (flash-attention-style online reduction over i) so batch scales past
  VMEM; see ops/tc_pallas.py.

Indexing quirk preserved from the as-executed reference
(ops.py:80-82, SURVEY §3.4/Q2): entry [j, i, l] = log N(z_j | mu_i, var_j)
— the *sample's* variance (unsqueeze(1)), not the distribution's. The
textbook variant (var_i) used by the full decomposition path
(solvers/tc.py:114-116) is available via ``variance_index='i'``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from intro_tc_vae_tpu.ops.density import (
    gaussian_log_density,
    gaussian_log_density_nll,
    minibatch_stratified_sampling,
)


def _pairwise_log_density(
    z: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    variance_index: str = "j",
    density: str = "nll",
) -> jax.Array:
    """[B, B, z] tensor of log q(z(x_j)_l | x_i), indexed [j, i, l]."""
    dens = gaussian_log_density_nll if density == "nll" else gaussian_log_density
    lv = logvar[:, None, :] if variance_index == "j" else logvar[None, :, :]
    return dens(z[:, None, :], mu[None, :, :], lv)


def total_correlation(
    z: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    dataset_size: int,
    reduce: str = "mean",
    impl: str = "xla",
) -> jax.Array:
    """Minibatch-stratified estimate of the total correlation TC(z).

    Args:
        z, mu, logvar: [B, z_dim] sampled latents and encoder moments.
        dataset_size: static Python int, |dataset| for the stratified weights.
        reduce: 'mean' (scalar) or 'none' ([B] vector).
        impl: 'xla' or 'pallas'.

    Reference: ops.py:52-89 (E_j[log q(z(x_j)) - log prod_l q(z(x_j)_l)]).
    """
    batch_size = z.shape[0]
    if impl == "pallas":
        from intro_tc_vae_tpu.ops.tc_pallas import tc_logsumexp_pallas

        log_qz_product, log_qz = tc_logsumexp_pallas(z, mu, logvar, dataset_size)
    else:
        log_qz_prob = _pairwise_log_density(z, mu, logvar, variance_index="j")
        log_qz_product, log_qz = minibatch_stratified_sampling(
            log_qz_prob, batch_size, dataset_size
        )

    tc = log_qz - log_qz_product
    if reduce == "mean":
        return jnp.mean(tc)
    return tc


def tc_decomposition(
    z: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    dataset_size: int,
):
    """Full ELBO surgery: per-sample (mi, tc, dimension-wise kl) terms.

    Implements the decomposition of solvers/tc.py:91-144 (reference):
        mi = log q(z|x) - log q(z)
        tc = log q(z) - log prod_l q(z_l)
        kl = log prod_l q(z_l) - log p(z)
    using the plain (non-floored) Gaussian density and the textbook i-indexed
    variance, as the reference's ``_compute_kl_loss_full`` does.

    Returns per-sample [B] vectors; callers reduce and recombine as
    mi + beta * tc + kl.
    """
    batch_size = z.shape[0]
    logqz_condx = jnp.sum(gaussian_log_density(z, mu, logvar), axis=1)
    zeros = jnp.zeros_like(z)
    logpz = jnp.sum(gaussian_log_density(z, zeros, zeros), axis=1)

    log_qz_prob = _pairwise_log_density(
        z, mu, logvar, variance_index="i", density="plain"
    )
    logqz_prodmarginals, log_qz = minibatch_stratified_sampling(
        log_qz_prob, batch_size, dataset_size
    )

    mi = logqz_condx - log_qz
    tc = log_qz - logqz_prodmarginals
    kl = logqz_prodmarginals - logpz
    return mi, tc, kl
