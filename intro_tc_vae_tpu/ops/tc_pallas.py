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

Backward: fully fused Pallas kernels (flash-attention-style recompute).
With the forward's logsumexp results L_marg[j,l] and L_joint[j] saved as
residuals, the incoming gradients turn into softmax weights

    dP[j,i,l] = g_marg[j] * exp(iw[j,i] + P[j,i,l] - L_marg[j,l])
              + g_joint[j] * exp(iw[j,i] + Σ_l P[j,i,l] - L_joint[j])

and the chain rule through the density gives
    dz[j,l]      = Σ_i dP · (-(z-mu)/var)
    dmu[i,l]     = Σ_j dP · (+(z-mu)/var)
    dlogvar[j,l] = Σ_i dP · (-0.5·(1 - (z-mu)²/var)) · 1[var not floored]
with dP masked where the forward clamped (P_raw < -50 ⇒ no gradient,
matching torch.clamp). Two kernels: a j-major grid accumulating
dz/dlogvar over i-tiles, and an i-major grid accumulating dmu over
j-tiles; each recomputes its P block in VMEM (no O(B²·z) residuals).
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
)

_NEG_INF = float("-inf")


def _pick_tiles(b_j: int, zdim: int = 128, b_i: int | None = None) -> tuple[int, int]:
    """(tile_j, tile_i): the kernel's VMEM density block is
    tile_j*tile_i*z floats. Defaults (8, 128) measured best on v5e;
    override with ITCVAE_TC_TILES="tj,ti" for tuning.

    b_j tiles the local z rows, b_i the (possibly all-gathered, larger)
    mu bank rows — they differ on the sharded global-batch path.
    """
    import os

    b_i = b_i if b_i is not None else b_j
    override = os.environ.get("ITCVAE_TC_TILES")
    if override:
        tj, ti = (int(v) for v in override.split(","))
        if b_j % tj == 0 and b_i % ti == 0:
            return tj, ti
    tile_i = 128 if b_i % 128 == 0 else math.gcd(b_i, 128)
    # biggest j-tile (<=32) dividing b_j: measured on v5e, (32,128) beats
    # (8,128) by ~25% fwd / ~35% bwd at large B (BENCHMARKS.md)
    tile_j = next((t for t in (32, 16, 8) if b_j % t == 0), math.gcd(b_j, 8))
    # keep the (tj, ti, z) fp32 density block within a ~2MB VMEM budget
    while tile_j > 8 and tile_j * tile_i * zdim * 4 > 2 * 1024 * 1024:
        tile_j //= 2
    return tile_j, tile_i


def _iw_consts(batch_size: int, dataset_size: int):
    """Compile-time constants of the stratified weight matrix
    (column-structured layout, see ops/density.py)."""
    n = float(dataset_size)
    m = batch_size - 1
    strat = (n - m) / (n * m)
    return dict(
        log1m=float(math.log(1.0 / m)),
        log1n=float(math.log(1.0 / n)),
        logstrat=float(math.log(strat)),
        special_row=m - 1,
    )


def _iw_block(row_pid, col_pid, tj: int, ti: int, c: dict, row_off=0):
    """(TJ, TI) tile of the log importance-weight matrix, generated
    on-the-fly from grid coordinates — no O(B²) input array, which is what
    lets TC scale to batches where even the weight matrix wouldn't fit.

    row_off shifts local j rows to GLOBAL batch rows on the sharded path
    (each shard owns a contiguous row block of the global batch)."""
    rows = row_off + row_pid * tj + jax.lax.broadcasted_iota(jnp.int32, (tj, ti), 0)
    cols = col_pid * ti + jax.lax.broadcasted_iota(jnp.int32, (tj, ti), 1)
    iw = jnp.full((tj, ti), c["log1m"], jnp.float32)
    iw = jnp.where(
        cols == 0,
        jnp.where(rows == c["special_row"], c["logstrat"], c["log1n"]),
        iw,
    )
    return jnp.where(cols == 1, c["logstrat"], iw)


def _tc_fwd_kernel(off_ref, z_ref, var_ref, lvf_ref, mu_ref,
                   lm_ref, lj_ref,
                   m_marg, s_marg, m_joint, s_joint,
                   *, iw_c: dict, tj: int, ti: int):
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
    iw = _iw_block(pl.program_id(0), i, tj, ti, iw_c, off_ref[0])  # (TJ, TI)

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


def _dp_block(z, var, lvf, mu, iw, lm, lj, g_m, g_j):
    """Recompute the (TJ, TI, Z) density block and its incoming gradient.

    Returns (dP, diff, var_b) where dP is already masked by the forward's
    -50 clamp.
    """
    diff = z[:, None, :] - mu[None, :, :]                       # (TJ, TI, Z)
    p_raw = -0.5 * (lvf[:, None, :] + diff * diff / var[:, None, :] + _LOG_2PI)
    p = jnp.maximum(p_raw, _LOG_PROB_FLOOR)
    w_marg = jnp.exp(iw[:, :, None] + p - lm[:, None, :])       # (TJ, TI, Z)
    s = jnp.sum(p, axis=2)                                      # (TJ, TI)
    w_joint = jnp.exp(iw + s - lj)                              # (TJ, TI)
    dp = g_m[:, None, :] * w_marg + (g_j * w_joint)[:, :, None]
    dp = jnp.where(p_raw > _LOG_PROB_FLOOR, dp, 0.0)
    return dp, diff


def _tc_bwd_dz_kernel(off_ref, z_ref, var_ref, lvf_ref, nf_ref, mu_ref,
                      lm_ref, lj_ref, gm_ref, gj_ref,
                      dz_ref, dlv_ref, dz_acc, dlv_acc,
                      *, iw_c: dict, tj: int, ti: int):
    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        dz_acc[:] = jnp.zeros_like(dz_acc)
        dlv_acc[:] = jnp.zeros_like(dlv_acc)

    z, var, lvf = z_ref[:], var_ref[:], lvf_ref[:]
    iw = _iw_block(pl.program_id(0), i, tj, ti, iw_c, off_ref[0])
    dp, diff = _dp_block(z, var, lvf, mu_ref[:], iw,
                         lm_ref[:], lj_ref[:], gm_ref[:], gj_ref[:])
    dz_acc[:] += jnp.sum(-dp * diff / var[:, None, :], axis=1)
    # d p_raw / d logvar = -0.5*(1 - diff^2/var), zero where var floored
    dlv_acc[:] += nf_ref[:] * jnp.sum(
        dp * (-0.5) * (1.0 - diff * diff / var[:, None, :]), axis=1
    )

    @pl.when(i == ni - 1)
    def _finalize():
        dz_ref[:] = dz_acc[:]
        dlv_ref[:] = dlv_acc[:]


def _tc_bwd_dmu_kernel(off_ref, mu_ref, z_ref, var_ref, lvf_ref,
                       lm_ref, lj_ref, gm_ref, gj_ref,
                       dmu_ref, dmu_acc,
                       *, iw_c: dict, tj: int, ti: int):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dmu_acc[:] = jnp.zeros_like(dmu_acc)

    z, var, lvf = z_ref[:], var_ref[:], lvf_ref[:]
    iw = _iw_block(j, pl.program_id(0), tj, ti, iw_c, off_ref[0])  # rows=j, cols=i
    dp, diff = _dp_block(z, var, lvf, mu_ref[:], iw,
                         lm_ref[:], lj_ref[:], gm_ref[:], gj_ref[:])
    dmu_acc[:] += jnp.sum(dp * diff / var[:, None, :], axis=0)  # sum over j

    @pl.when(j == nj - 1)
    def _finalize():
        dmu_ref[:] = dmu_acc[:]


def _tc_pallas_bwd_raw(z, mu, logvar, dataset_size: int, lm, lj, g_m, g_j,
                       interpret: bool = False, row_offset=None,
                       global_batch: int | None = None):
    """Fused backward. lm: [B, Z] marginal logsumexps, lj: [B] joint,
    g_m: [B] grad wrt prodmarginals (broadcast over l by the sum), g_j: [B].

    Sharded global-batch path: z/logvar/lm/lj/g_* hold this shard's rows,
    mu is the all-gathered global bank, row_offset the shard's global row
    start, global_batch the full-batch size for the weight constants.
    dmu is this shard's contribution over the FULL bank (summed across
    shards by the all_gather transpose).
    """
    b_j, zdim = z.shape
    b_i = mu.shape[0]
    tj, ti = _pick_tiles(b_j, zdim, b_i)
    nj, ni = b_j // tj, b_i // ti

    var = jnp.maximum(jnp.exp(logvar), _VAR_FLOOR)
    lvf = jnp.log(var)
    not_floored = (jnp.exp(logvar) > _VAR_FLOOR).astype(jnp.float32)
    iw_c = _iw_consts(global_batch or b_j, dataset_size)
    off = jnp.reshape(
        jnp.asarray(row_offset if row_offset is not None else 0, jnp.int32), (1,)
    )
    lj2 = lj[:, None]
    gm2 = g_m[:, None]
    gj2 = g_j[:, None]

    f32 = jnp.float32
    args = (z.astype(f32), var.astype(f32), lvf.astype(f32), not_floored,
            mu.astype(f32), lm.astype(f32), lj2.astype(f32),
            gm2.astype(f32), gj2.astype(f32))

    # kernel 1: grid (nj, ni) — accumulate over i, outputs indexed by j
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    j_spec = lambda bs: pl.BlockSpec(bs, lambda j, i: (j, 0), memory_space=pltpu.VMEM)
    i_spec = lambda bs: pl.BlockSpec(bs, lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    dz, dlv = pl.pallas_call(
        functools.partial(_tc_bwd_dz_kernel, iw_c=iw_c, tj=tj, ti=ti),
        grid=(nj, ni),
        in_specs=[
            smem_spec,
            j_spec((tj, zdim)), j_spec((tj, zdim)), j_spec((tj, zdim)),
            j_spec((tj, zdim)),
            i_spec((ti, zdim)),
            j_spec((tj, zdim)), j_spec((tj, 1)), j_spec((tj, 1)), j_spec((tj, 1)),
        ],
        out_specs=[j_spec((tj, zdim)), j_spec((tj, zdim))],
        out_shape=[
            jax.ShapeDtypeStruct((b_j, zdim), f32),
            jax.ShapeDtypeStruct((b_j, zdim), f32),
        ],
        scratch_shapes=[pltpu.VMEM((tj, zdim), f32), pltpu.VMEM((tj, zdim), f32)],
        interpret=interpret,
    )(off, *args)

    # kernel 2: grid (ni, nj) — accumulate over j, outputs indexed by i.
    # Same tile split with roles swapped (tj tiles of j are the inner
    # reduction; mu tiles of size ti are the output blocks).
    mu_spec = lambda bs: pl.BlockSpec(bs, lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    jj_spec = lambda bs: pl.BlockSpec(bs, lambda i, j: (j, 0), memory_space=pltpu.VMEM)
    (z32, var32, lvf32, _nf, mu32, lm32, lj32, gm32, gj32) = args
    dmu = pl.pallas_call(
        functools.partial(_tc_bwd_dmu_kernel, iw_c=iw_c, tj=tj, ti=ti),
        grid=(ni, nj),
        in_specs=[
            smem_spec,
            mu_spec((ti, zdim)),
            jj_spec((tj, zdim)), jj_spec((tj, zdim)), jj_spec((tj, zdim)),
            jj_spec((tj, zdim)), jj_spec((tj, 1)), jj_spec((tj, 1)), jj_spec((tj, 1)),
        ],
        out_specs=mu_spec((ti, zdim)),
        out_shape=jax.ShapeDtypeStruct((b_i, zdim), f32),
        scratch_shapes=[pltpu.VMEM((ti, zdim), f32)],
        interpret=interpret,
    )(off, mu32, z32, var32, lvf32, lm32, lj32, gm32, gj32)

    return dz.astype(z.dtype), dmu.astype(mu.dtype), dlv.astype(logvar.dtype)


def _tc_pallas_raw(z, mu, logvar, dataset_size: int, interpret: bool = False,
                   return_residuals: bool = False, row_offset=None,
                   global_batch: int | None = None):
    b_j, zdim = z.shape
    b_i = mu.shape[0]
    tj, ti = _pick_tiles(b_j, zdim, b_i)
    nj, ni = b_j // tj, b_i // ti

    var = jnp.maximum(jnp.exp(logvar), _VAR_FLOOR)
    lvf = jnp.log(var)
    iw_c = _iw_consts(global_batch or b_j, dataset_size)
    off = jnp.reshape(
        jnp.asarray(row_offset if row_offset is not None else 0, jnp.int32), (1,)
    )

    grid = (nj, ni)
    lm, lj = pl.pallas_call(
        functools.partial(_tc_fwd_kernel, iw_c=iw_c, tj=tj, ti=ti),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ti, zdim), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tj, zdim), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tj, 1), lambda j, i: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_j, zdim), jnp.float32),
            jax.ShapeDtypeStruct((b_j, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tj, zdim), jnp.float32),
            pltpu.VMEM((tj, zdim), jnp.float32),
            pltpu.VMEM((tj, 1), jnp.float32),
            pltpu.VMEM((tj, 1), jnp.float32),
        ],
        interpret=interpret,
    )(off, z.astype(jnp.float32), var.astype(jnp.float32),
      lvf.astype(jnp.float32), mu.astype(jnp.float32))

    logqz_prodmarginals = jnp.sum(lm, axis=1)
    log_qz = lj[:, 0]
    if return_residuals:
        return (logqz_prodmarginals, log_qz), (lm, lj[:, 0])
    return logqz_prodmarginals, log_qz


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def tc_logsumexp_pallas(z, mu, logvar, dataset_size: int):
    """(log prod_l q(z_l), log q(z)) via the fused Pallas kernel."""
    return _tc_pallas_raw(z, mu, logvar, dataset_size)


def _tc_fwd(z, mu, logvar, dataset_size: int):
    out, (lm, lj) = _tc_pallas_raw(z, mu, logvar, dataset_size,
                                   return_residuals=True)
    return out, (z, mu, logvar, lm, lj)


def _tc_bwd(dataset_size: int, res, grads):
    z, mu, logvar, lm, lj = res
    g_pm, g_qz = grads  # grads wrt (prodmarginals [B], log_qz [B])
    return _tc_pallas_bwd_raw(z, mu, logvar, dataset_size, lm, lj, g_pm, g_qz)


tc_logsumexp_pallas.defvjp(_tc_fwd, _tc_bwd)


# ---------------------------------------------------------------------------
# sharded global-batch variant (called per shard under jax.shard_map)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def tc_logsumexp_pallas_gathered(z, mu_bank, logvar, row_off,
                                 dataset_size: int, global_batch: int):
    """Per-shard TC logsumexps against the all-gathered posterior bank.

    z/logvar: this shard's [B_local, z] rows; mu_bank: the FULL
    [global_batch, z] mu bank (jax.lax.all_gather'd by the caller);
    row_off: this shard's global row start (traced int32 scalar, from
    jax.lax.axis_index). Returns this shard's [B_local] logsumexp pair.
    The bwd emits dmu for the full bank — the all_gather transpose
    (psum-scatter over ICI) then sums the per-shard contributions, which
    IS the cross-chip reduction of SURVEY §5.7.
    """
    return _tc_pallas_raw(z, mu_bank, logvar, dataset_size,
                          row_offset=row_off, global_batch=global_batch)


def _tc_g_fwd(z, mu_bank, logvar, row_off, dataset_size, global_batch):
    out, (lm, lj) = _tc_pallas_raw(z, mu_bank, logvar, dataset_size,
                                   return_residuals=True,
                                   row_offset=row_off, global_batch=global_batch)
    return out, (z, mu_bank, logvar, row_off, lm, lj)


def _tc_g_bwd(dataset_size, global_batch, res, grads):
    import numpy as np

    z, mu_bank, logvar, row_off, lm, lj = res
    g_pm, g_qz = grads
    dz, dmu, dlv = _tc_pallas_bwd_raw(
        z, mu_bank, logvar, dataset_size, lm, lj, g_pm, g_qz,
        row_offset=row_off, global_batch=global_batch,
    )
    d_off = np.zeros(np.shape(row_off), jax.dtypes.float0)  # int arg: no grad
    return dz, dmu, dlv, d_off


tc_logsumexp_pallas_gathered.defvjp(_tc_g_fwd, _tc_g_bwd)
