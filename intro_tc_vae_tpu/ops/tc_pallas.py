"""Pallas (Mosaic/TPU) kernel for the total-correlation logsumexp reductions.

Fuses, per (j-tile, i-tile) grid step entirely in VMEM:
    P[j,i,l]  = max(-0.5*(log var_f[j,l] + (z[j,l]-mu[i,l])^2/var_f[j,l]
                          + log 2π), -50)         (var_f = max(var, 1e-4))
    marginals: online-logsumexp over i of (log_iw[j,i] + P[j,i,l]) -> [B, z]
    joint:     online-logsumexp over i of (log_iw[j,i] + Σ_l P)    -> [B]

i.e. the whole reference pipeline ops.py:80-115 without ever writing the
[B, B, z] tensor to HBM — a flash-attention-style streaming reduction
(running max/sum scratch carried across the i grid axis). HBM traffic
drops from O(B²·z) to O(B·z), which is what lets global-batch TC scale
past VMEM when the batch is large or sharded.

Backward: `custom_vjp` whose bwd rule re-runs the memory-safe blockwise
scan path (`tc_logsumexp_blockwise`) under `jax.vjp` — identical numerics,
O(B·z) memory. (A fully fused Pallas backward is a further optimization.)
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from intro_tc_vae_tpu.ops.density import (
    _LOG_2PI,
    _LOG_PROB_FLOOR,
    _VAR_FLOOR,
    log_importance_weight_matrix,
)

_NEG_INF = float("-inf")


def _pick_tiles(b: int) -> tuple[int, int]:
    """(tile_j, tile_i): VMEM block is tile_j*tile_i*z floats; keep ~<=1MB."""
    tile_i = 128 if b % 128 == 0 else math.gcd(b, 128)
    tile_j = 8 if b % 8 == 0 else math.gcd(b, 8)
    return tile_j, tile_i


def _tc_fwd_kernel(z_ref, var_ref, lvf_ref, mu_ref, iw_ref,
                   lm_ref, lj_ref,
                   m_marg, s_marg, m_joint, s_joint):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        m_marg[:] = jnp.full_like(m_marg, _NEG_INF)
        s_marg[:] = jnp.zeros_like(s_marg)
        m_joint[:] = jnp.full_like(m_joint, _NEG_INF)
        s_joint[:] = jnp.zeros_like(s_joint)

    z = z_ref[:]          # (TJ, Z)
    var = var_ref[:]      # (TJ, Z) floored variance
    lvf = lvf_ref[:]      # (TJ, Z) log floored variance
    mu = mu_ref[:]        # (TI, Z)
    iw = iw_ref[:]        # (TJ, TI)

    diff = z[:, None, :] - mu[None, :, :]                       # (TJ, TI, Z)
    p = -0.5 * (lvf[:, None, :] + diff * diff / var[:, None, :] + _LOG_2PI)
    p = jnp.maximum(p, _LOG_PROB_FLOOR)

    # ---- marginals over i, per (j, l) ----
    xm = iw[:, :, None] + p                                      # (TJ, TI, Z)
    bm = jnp.max(xm, axis=1)                                     # (TJ, Z)
    new_m = jnp.maximum(m_marg[:], bm)
    s_marg[:] = s_marg[:] * jnp.exp(m_marg[:] - new_m) + jnp.sum(
        jnp.exp(xm - new_m[:, None, :]), axis=1
    )
    m_marg[:] = new_m

    # ---- joint over i, per j ----
    xj = iw + jnp.sum(p, axis=2)                                 # (TJ, TI)
    bj = jnp.max(xj, axis=1, keepdims=True)                      # (TJ, 1)
    new_mj = jnp.maximum(m_joint[:], bj)
    s_joint[:] = s_joint[:] * jnp.exp(m_joint[:] - new_mj) + jnp.sum(
        jnp.exp(xj - new_mj), axis=1, keepdims=True
    )
    m_joint[:] = new_mj

    @pl.when(i == ni - 1)
    def _finalize():
        lm_ref[:] = jnp.log(s_marg[:]) + m_marg[:]
        lj_ref[:] = jnp.log(s_joint[:]) + m_joint[:]


def _tc_pallas_raw(z, mu, logvar, dataset_size: int, interpret: bool = False):
    b, zdim = z.shape
    tj, ti = _pick_tiles(b)
    nj, ni = b // tj, b // ti

    var = jnp.maximum(jnp.exp(logvar), _VAR_FLOOR)
    lvf = jnp.log(var)
    log_iw = log_importance_weight_matrix(b, dataset_size)

    grid = (nj, ni)
    lm, lj = pl.pallas_call(
        _tc_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, zdim), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, ti), lambda j, i: (j, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, zdim), jnp.float32),
            jax.ShapeDtypeStruct((b, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tj, zdim), jnp.float32),
            pltpu.VMEM((tj, zdim), jnp.float32),
            pltpu.VMEM((tj, 1), jnp.float32),
            pltpu.VMEM((tj, 1), jnp.float32),
        ],
        interpret=interpret,
    )(z.astype(jnp.float32), var.astype(jnp.float32), lvf.astype(jnp.float32),
      mu.astype(jnp.float32), log_iw)

    logqz_prodmarginals = jnp.sum(lm, axis=1)
    log_qz = lj[:, 0]
    return logqz_prodmarginals, log_qz


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tc_logsumexp_pallas(z, mu, logvar, dataset_size: int):
    """(log prod_l q(z_l), log q(z)) via the fused Pallas kernel."""
    return _tc_pallas_raw(z, mu, logvar, dataset_size)


def _tc_fwd(z, mu, logvar, dataset_size: int):
    out = _tc_pallas_raw(z, mu, logvar, dataset_size)
    return out, (z, mu, logvar)


def _tc_bwd(dataset_size: int, res, grads):
    from intro_tc_vae_tpu.ops.tc import tc_logsumexp_blockwise

    z, mu, logvar = res
    _, vjp = jax.vjp(
        lambda a, b, c: tc_logsumexp_blockwise(a, b, c, dataset_size), z, mu, logvar
    )
    return vjp(grads)


tc_logsumexp_pallas.defvjp(_tc_fwd, _tc_bwd)
