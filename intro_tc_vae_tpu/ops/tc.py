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
    minibatch_weighted_sampling,
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
    sampling: str = "stratified",
    mesh=None,
    axis_name: str = "data",
) -> jax.Array:
    """Minibatch estimate of the total correlation TC(z).

    Args:
        z, mu, logvar: [B, z_dim] sampled latents and encoder moments.
        dataset_size: static Python int, |dataset| for the importance weights.
        reduce: 'mean' (scalar) or 'none' ([B] vector).
        impl: 'xla' | 'blockwise' | 'pallas'.
        sampling: 'stratified' (what the reference executes, ops.py:84) or
            'weighted' (minibatch-weighted variant, defined but unused
            there — ops.py:92-101, quirk Q11; xla impl only).
        mesh/axis_name: if mesh is given with >1 devices on axis_name and a
            scaling impl, compute the GLOBAL-batch TC via shard_map (each
            shard reduces its rows against the all-gathered mu bank) —
            see total_correlation_sharded. The default 'xla' impl instead
            relies on GSPMD partitioning of the materialized [B,B,z] form.

    Reference: ops.py:52-89 (E_j[log q(z(x_j)) - log prod_l q(z(x_j)_l)]).
    """
    if (
        mesh is not None
        and impl in ("blockwise", "pallas")
        and sampling == "stratified"
        and mesh.shape.get(axis_name, 1) > 1
    ):
        return total_correlation_sharded(
            z, mu, logvar, dataset_size, mesh,
            reduce=reduce, impl=impl, axis_name=axis_name,
        )
    batch_size = z.shape[0]
    if sampling == "weighted":
        log_qz_prob = _pairwise_log_density(z, mu, logvar, variance_index="j")
        log_qz_product, log_qz = minibatch_weighted_sampling(
            log_qz_prob, batch_size, dataset_size
        )
    elif impl == "pallas":
        from intro_tc_vae_tpu.ops.tc_pallas import tc_logsumexp_pallas

        log_qz_product, log_qz = tc_logsumexp_pallas(z, mu, logvar, dataset_size)
    elif impl == "blockwise":
        log_qz_product, log_qz = tc_logsumexp_blockwise(z, mu, logvar, dataset_size)
    else:
        log_qz_prob = _pairwise_log_density(z, mu, logvar, variance_index="j")
        log_qz_product, log_qz = minibatch_stratified_sampling(
            log_qz_prob, batch_size, dataset_size
        )

    tc = log_qz - log_qz_product
    if reduce == "mean":
        return jnp.mean(tc)
    return tc


def tc_logsumexp_blockwise(
    z: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    dataset_size: int,
    block: int = 128,
    row_offset=None,
    global_batch: int | None = None,
):
    """Streaming (flash-style) TC reductions: never materializes [B, B, z].

    Scans over i-blocks of the posterior bank maintaining online-logsumexp
    state for both the per-latent marginals [B, z] and the joint [B], so
    peak memory is O(B·z + B·block) instead of O(B²·z). This is the
    global-batch scaling path (SURVEY §5.7: the honest analogue of
    blockwise/ring attention for this codebase); gradients flow through
    `lax.scan` with rematerialized blocks.

    Sharded path (under jax.shard_map, see total_correlation_sharded):
    z/logvar hold this shard's rows, mu the all-gathered global bank,
    row_offset the shard's global row start (traced ok), global_batch the
    full batch size for the stratified-weight constants.

    Returns (log prod_l q(z_l) [B], log q(z) [B]) — identical numerics to
    `minibatch_stratified_sampling` up to fp accumulation order.
    """
    import math

    from intro_tc_vae_tpu.ops.density import (
        _LOG_2PI,
        _LOG_PROB_FLOOR,
        _VAR_FLOOR,
    )

    b_j, zdim = z.shape
    b_i = mu.shape[0]
    block = min(block, b_i)
    if b_i % block != 0:  # fall back to any divisor
        block = math.gcd(b_i, block)
    ni = b_i // block

    var = jnp.maximum(jnp.exp(logvar), _VAR_FLOOR)                  # [B, z]
    log_var_f = jnp.log(var)

    mu_blocks = mu.reshape(ni, block, zdim)

    # stratified weights generated per block (no O(B^2) matrix): the
    # column-structured layout (density.py) depends only on the column
    # index, except W[M-1, 0]. Row/col indices are GLOBAL batch indices.
    n_f, m = float(dataset_size), (global_batch or b_j) - 1
    log1m = math.log(1.0 / m)
    log1n = math.log(1.0 / n_f)
    logstrat = math.log((n_f - m) / (n_f * m))
    off = 0 if row_offset is None else row_offset
    rows = off + jnp.arange(b_j)[:, None]                            # [B, 1]

    def iw_for(block_idx):
        cols = block_idx * block + jnp.arange(block)[None, :]        # [1, blk]
        iw = jnp.full((b_j, block), log1m, jnp.float32)
        iw = jnp.where(cols == 0,
                       jnp.where(rows == m - 1, logstrat, log1n), iw)
        return jnp.where(cols == 1, logstrat, iw)

    neg_inf = jnp.full((), -jnp.inf, z.dtype)

    @jax.checkpoint
    def body(carry, xs):
        m_m, s_m, m_j, s_j = carry
        mu_blk, blk_idx = xs
        iw_blk = iw_for(blk_idx)
        diff = z[:, None, :] - mu_blk[None, :, :]                   # [B, blk, z]
        p = -0.5 * (log_var_f[:, None, :] + diff * diff / var[:, None, :] + _LOG_2PI)
        p = jnp.maximum(p, _LOG_PROB_FLOOR)

        # marginals: online logsumexp over i of iw + p, per (j, l)
        xm = iw_blk[:, :, None] + p                                  # [B, blk, z]
        bm = jnp.max(xm, axis=1)
        new_m = jnp.maximum(m_m, bm)
        s_m = s_m * jnp.exp(m_m - new_m) + jnp.sum(
            jnp.exp(xm - new_m[:, None, :]), axis=1
        )
        m_m = new_m

        # joint: online logsumexp over i of iw + sum_l p, per j
        xj = iw_blk + jnp.sum(p, axis=2)                             # [B, blk]
        bj = jnp.max(xj, axis=1)
        new_mj = jnp.maximum(m_j, bj)
        s_j = s_j * jnp.exp(m_j - new_mj) + jnp.sum(
            jnp.exp(xj - new_mj[:, None]), axis=1
        )
        m_j = new_mj
        return (m_m, s_m, m_j, s_j), None

    # build the carry init FROM z (0*z) so it inherits z's varying manual
    # axes under shard_map (jax>=0.8 rejects unvarying-carry-in /
    # varying-carry-out scans)
    zero_bz = z * 0.0
    zero_b = zero_bz[:, 0]
    init = (
        zero_bz + neg_inf,
        zero_bz,
        zero_b + neg_inf,
        zero_b,
    )
    (m_m, s_m, m_j, s_j), _ = jax.lax.scan(
        body, init, (mu_blocks, jnp.arange(ni))
    )
    logqz_prodmarginals = jnp.sum(jnp.log(s_m) + m_m, axis=1)
    log_qz = jnp.log(s_j) + m_j
    return logqz_prodmarginals, log_qz


def total_correlation_sharded(
    z: jax.Array,
    mu: jax.Array,
    logvar: jax.Array,
    dataset_size: int,
    mesh,
    reduce: str = "mean",
    impl: str = "blockwise",
    axis_name: str = "data",
) -> jax.Array:
    """Global-batch TC over a data-sharded batch (SURVEY §5.7/§7.7).

    The pairwise density log N(z_j | mu_i, var_j) (the as-executed
    reference indexing, ops.py:80-82) couples sample j to the rest of the
    batch only through mu_i — so the cross-chip form is ONE all_gather of
    mu ([B, z], rides ICI) followed by purely local streaming logsumexp
    over the full bank, with the stratified weights indexed by GLOBAL
    (row, col). No logsumexp-merge collective is needed, and the
    all_gather's transpose (psum-scatter) is exactly the cross-chip
    reduction for dmu in the backward.

    impl='blockwise' uses the lax.scan streaming path per shard;
    impl='pallas' the fused kernel (tc_logsumexp_pallas_gathered).
    Returns the same value as the single-device estimator on the
    concatenated batch, 'mean' (scalar) or 'none' ([B] sharded vector).
    """
    from jax.sharding import PartitionSpec as P

    def local_fn(z_l, mu_l, lv_l):
        mu_all = jax.lax.all_gather(mu_l, axis_name, axis=0, tiled=True)
        gb = mu_all.shape[0]
        off = jax.lax.axis_index(axis_name) * z_l.shape[0]
        if impl == "pallas":
            from intro_tc_vae_tpu.ops.tc_pallas import (
                tc_logsumexp_pallas_gathered,
            )

            pm, qz = tc_logsumexp_pallas_gathered(
                z_l, mu_all, lv_l, off, dataset_size, gb
            )
        else:
            pm, qz = tc_logsumexp_blockwise(
                z_l, mu_all, lv_l, dataset_size,
                row_offset=off, global_batch=gb,
            )
        return qz - pm

    tc = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(axis_name), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
        # pallas_call outputs carry no varying-manual-axes metadata, which
        # jax>=0.8's vma check rejects; equality-vs-single-device is
        # asserted by tests instead (tests/test_tc_impls.py)
        check_vma=False,
    )(z, mu, logvar)
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
