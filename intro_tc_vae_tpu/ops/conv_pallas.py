"""Pallas (Mosaic/TPU) kernel for the lane-starved 3x3 / 64-channel convs.

Why: the flagship decoder spends most of its conv time in 3x3 stride-1
SAME convs with only 64 input AND output channels at 64x64 spatial
(``Decoder/res_in_64`` — the reference's last decoder block,
models.py:279-291). With Cout=64, XLA's conv emitter can fill at most
half the 128 MXU lanes: the measured per-layer roofline
(analysis/profile_step.py) shows 74.6 TFLOP/s forward (its exact 50%
lane bound) and 44.7 TFLOP/s backward against a ~197 TFLOP/s chip peak.

This kernel restores full-lane occupancy with an *output-pair packing*:

* two horizontally adjacent output pixels are computed per matmul row,
  so the lane (N) dimension is ``2*Cout = 128``;
* their shared 3x4 input patch is consumed as K-chunks of 128 lanes —
  each chunk a horizontally adjacent *tap pair* (2 taps x 64 channels).
  In pixel-major NHWC flattening a tap pair's channels are contiguous,
  so every chunk of the im2col operand is a pure slice+reshape of the
  padded input row strip: no O(9*H*W) im2col tensor is ever built.

The packed weight tensor ``Wp[6, 128, 128]`` holds zeros where a tap
does not belong to an output parity, so 9/12 of the MACs are useful:
the structural ceiling is 75% of peak (~148 TFLOP/s) versus the <=50%
lane bound XLA is under. ``Wp`` is built from the plain [3,3,64,64]
kernel by a *differentiable* gather (linear in W), so autodiff through
the packing gives the exact plain-layout weight-gradient fold; the
custom VJP only needs Pallas kernels for y, dx and dWp:

* dx = conv3x3(g, rot180(W)^T) — the forward kernel on packed rotated
  weights (same shape class: 64 -> 64);
* dWp[c] = sum over grid programs of chunk_c(x)^T @ g_pair — a
  full-lane [128, M] x [M, 128] matmul accumulated into one output
  block (TPU grid steps run sequentially, so cross-program
  read-modify-write accumulation is well-defined).

Grid: (B, H/TILE_H). The input lives in ANY (HBM) memory and each
program DMAs its halo'd row strip into VMEM scratch — BlockSpec cannot
express overlapping blocks, and halo-stacking in XLA would materialize
a full-tensor copy per conv (the measured StripTiledConv failure mode,
models/blocks.py).

Used by models/blocks.py when ``conv_impl='pallas'`` for exactly the
eligible shapes; everything else stays on XLA's emitter (which the
roofline shows is already at 92-104% of peak for the full-lane
encoder convs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PAIR = 2        # horizontally adjacent output pixels packed into lanes
_CIN = 64
_COUT = 64
_CHUNKS = 6      # (3 dy rows) x (2 tap-pairs) K-chunks of 128


# --------------------------------------------------------------------------
# weight packing (linear, differentiable)
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _pack_indices():
    """Gather index + mask mapping plain W[3,3,64,64] -> packed Wp[6,128,128].

    Packed coordinates: chunk c = (dy, dxp) with dy in {0,1,2} kernel
    rows and dxp in {0,1} tap-pairs at x-offsets (2*dxp-1, 2*dxp);
    K-row = a*64 + ci (a = tap within pair); N-col = o*64 + co (o =
    output parity within the pair). The tap at absolute x-offset
    d = 2*dxp - 1 + a (relative to the LEFT output of the pair)
    contributes to parity o at kernel x-index kx = d - o + 1, valid iff
    0 <= kx <= 2. Returns (flat_idx, valid) of shape [6, 128, 128].
    """
    a, ci = np.divmod(np.arange(128), _CIN)         # K-rows
    o, co = np.divmod(np.arange(128), _COUT)        # N-cols
    dy = (np.arange(_CHUNKS) // 2)[:, None, None]   # [6,1,1]
    dxp = (np.arange(_CHUNKS) % 2)[:, None, None]
    d = 2 * dxp - 1 + a[None, :, None]              # [6,128,1]
    kx = d - o[None, None, :] + 1                   # [6,128,128]
    valid = (kx >= 0) & (kx <= 2)
    flat = ((dy * 3 + np.where(valid, kx, 0)) * _CIN
            + ci[None, :, None]) * _COUT + co[None, None, :]
    return np.where(valid, flat, 0), valid


def _placements():
    """(chunk, K-parity a, N-parity o) -> kernel tap (dy, kx) placements.

    Built from the same geometry as _pack_indices but enumerated as
    static 64x64 sub-blocks: gather/scatter formulations of the pack
    lower to thousands-of-updates scatters on TPU (the measured
    PackedPredictConv failure mode); static slices + concats are pure
    vector ops."""
    out = []
    for c in range(_CHUNKS):
        dy, dxp = divmod(c, 2)
        dx1 = 2 * dxp - 1
        for a in range(2):
            for o in range(2):
                kx = dx1 + a - o + 1
                out.append((c, a, o, dy, kx, 0 <= kx <= 2))
    return out


def pack_weights(w: jax.Array) -> jax.Array:
    """Plain [3,3,64,64] -> packed [6,128,128]; linear in w (AD-exact).

    Implemented as static sub-block concatenation (no gather)."""
    assert w.shape == (3, 3, _CIN, _COUT), w.shape
    zero = jnp.zeros((_CIN, _COUT), w.dtype)
    sub = {}
    for c, a, o, dy, kx, ok in _placements():
        sub[(c, a, o)] = w[dy, kx] if ok else zero
    return jnp.stack([
        jnp.concatenate([
            jnp.concatenate([sub[(c, a, 0)], sub[(c, a, 1)]], axis=1)
            for a in range(2)
        ], axis=0)
        for c in range(_CHUNKS)
    ])


def unpack_grad(dwp: jax.Array) -> jax.Array:
    """Transpose of pack_weights: fold dWp[6,128,128] -> dW[3,3,64,64]
    (sum duplicated taps, drop the zero-masked positions). Static
    slices + adds — no scatter."""
    taps = [[None] * 3 for _ in range(3)]
    for c, a, o, dy, kx, ok in _placements():
        if not ok:
            continue
        blk = dwp[c, a * _CIN:(a + 1) * _CIN, o * _COUT:(o + 1) * _COUT]
        taps[dy][kx] = blk if taps[dy][kx] is None else taps[dy][kx] + blk
    return jnp.stack([jnp.stack(row) for row in taps])


def _rot_t(w: jax.Array) -> jax.Array:
    """rot180 + in/out transpose: the weights of a stride-1 conv's
    input-gradient pass."""
    return jnp.flip(w, axis=(0, 1)).transpose(0, 1, 3, 2)


# --------------------------------------------------------------------------
# kernels
# --------------------------------------------------------------------------
# x is passed flattened [B, H, W*64] so strip DMAs are 2-D row copies.
# Mosaic requires DMA slices aligned to the (16, 128) memory tiling, so:
# * the H halo is a full 16-row block (_HALO) instead of 1 row — strips
#   are DMA'd [h0-16, h0+tile_h+16) with 16-aligned starts/sizes;
# * the W pad is 2 pixels (= 128 lanes) per side, image at lane 128.
# The buffer maps input row r to buffer row r - h0 + 16, so the operand
# row base for kernel row dy is the static 15 + dy.

_HALO = 16


def _copy_strip(x_hbm, xbuf, sem, b, h0, *, tile_h, width, height):
    """DMA the 16-aligned halo'd strip of image b into the VMEM row
    buffer xbuf [tile_h + 32, (width+4)*64]; out-of-image rows and the
    W-pad columns read as zeros."""
    wc = width * _CIN
    first = h0 == 0
    last = h0 + tile_h == height
    interior = jnp.logical_not(jnp.logical_or(first, last))
    # tile_h is a multiple of 16, so h0 - 16 is 16-aligned; Mosaic's
    # divisibility analysis needs the explicit hint for the DMA slice
    h0m = pl.multiple_of(h0 - _HALO, _HALO)

    @pl.when(first)
    def _zero_top():
        xbuf[pl.ds(0, _HALO), :] = jnp.zeros((_HALO, xbuf.shape[1]),
                                             xbuf.dtype)

    @pl.when(last)
    def _zero_bottom():
        xbuf[pl.ds(tile_h + _HALO, _HALO), :] = jnp.zeros(
            (_HALO, xbuf.shape[1]), xbuf.dtype)

    # W-pad columns (2 pixels = 128 lanes each side), every strip
    xbuf[:, pl.ds(0, 2 * _CIN)] = jnp.zeros(
        (tile_h + 2 * _HALO, 2 * _CIN), xbuf.dtype)
    xbuf[:, pl.ds(wc + 2 * _CIN, 2 * _CIN)] = jnp.zeros(
        (tile_h + 2 * _HALO, 2 * _CIN), xbuf.dtype)

    @pl.when(interior)
    def _cp_interior():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h0m, tile_h + 2 * _HALO), pl.ds(0, wc)],
            xbuf.at[pl.ds(0, tile_h + 2 * _HALO), pl.ds(2 * _CIN, wc)], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(first, jnp.logical_not(last)))
    def _cp_first():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, tile_h + _HALO), pl.ds(0, wc)],
            xbuf.at[pl.ds(_HALO, tile_h + _HALO), pl.ds(2 * _CIN, wc)], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(last, jnp.logical_not(first)))
    def _cp_last():
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(h0m, tile_h + _HALO), pl.ds(0, wc)],
            xbuf.at[pl.ds(0, tile_h + _HALO), pl.ds(2 * _CIN, wc)], sem)
        cp.start()
        cp.wait()

    @pl.when(jnp.logical_and(first, last))
    def _cp_only():  # single-strip image (h == tile_h)
        cp = pltpu.make_async_copy(
            x_hbm.at[b, pl.ds(0, tile_h), pl.ds(0, wc)],
            xbuf.at[pl.ds(_HALO, tile_h), pl.ds(2 * _CIN, wc)], sem)
        cp.start()
        cp.wait()


def _chunk(xbuf, c: int, *, tile_h: int, width: int):
    """K-chunk operand [tile_h * width/2, 128] for chunk c = (dy, dxp).

    Window for output pair wp at tap-pair dxp starts at buffer lane
    (2*wp + (2*dxp - 1) + 2) * 64 = 128*wp + (2*dxp + 1) * 64 — a
    contiguous [tile_h, width/2 * 128] slice reshaped pair-major."""
    dy, dxp = divmod(c, 2)
    off = (2 * dxp + 1) * _CIN
    m = tile_h * (width // _PAIR)
    sl = xbuf[pl.ds(_HALO - 1 + dy, tile_h),
              pl.ds(off, (width // _PAIR) * 128)]
    return sl.reshape(m, 128)


def _fwd_kernel(x_hbm, wp_ref, y_ref, xbuf, sem, *, tile_h, width, height):
    b = pl.program_id(0)
    h0 = pl.program_id(1) * tile_h
    _copy_strip(x_hbm, xbuf, sem, b, h0, tile_h=tile_h, width=width,
                height=height)

    m = tile_h * (width // _PAIR)
    acc = jnp.zeros((m, 128), jnp.float32)
    for c in range(_CHUNKS):
        acc += jnp.dot(_chunk(xbuf, c, tile_h=tile_h, width=width),
                       wp_ref[c], preferred_element_type=jnp.float32)
    # [tile_h, W/2, (o, co)] pair-major flat == [tile_h, W*64] pixel-major
    y_ref[0] = acc.reshape(tile_h, width * _COUT).astype(y_ref.dtype)


def _dwp_kernel(x_hbm, g_ref, dwp_ref, xbuf, sem, *, tile_h, width, height):
    b = pl.program_id(0)
    hblk = pl.program_id(1)
    h0 = hblk * tile_h
    _copy_strip(x_hbm, xbuf, sem, b, h0, tile_h=tile_h, width=width,
                height=height)

    @pl.when(jnp.logical_and(b == 0, hblk == 0))
    def _init():
        dwp_ref[:, :, :] = jnp.zeros_like(dwp_ref)

    m = tile_h * (width // _PAIR)
    g = g_ref[0].reshape(m, 128).astype(xbuf.dtype)
    for c in range(_CHUNKS):
        ch = _chunk(xbuf, c, tile_h=tile_h, width=width)
        dwp_ref[c] += jax.lax.dot_general(
            ch, g, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _pick_tile(h: int) -> int:
    """Row-strip height: whole image up to 64 rows (no halo re-read),
    64-row strips above (the +-16-row halo is then a 1.5x re-read,
    still far under the compute time for these shapes)."""
    return h if h <= 64 else 64


def _conv_call(x: jax.Array, wp: jax.Array, tile_h: int | None,
               interpret: bool) -> jax.Array:
    n, h, w, cin = x.shape
    tile_h = tile_h or _pick_tile(h)
    xf = x.reshape(n, h, w * cin)
    grid = (n, h // tile_h)
    y = pl.pallas_call(
        functools.partial(_fwd_kernel, tile_h=tile_h, width=w, height=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((_CHUNKS, 128, 128), lambda b, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w * _COUT),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w * _COUT), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, (w + 4) * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, wp)
    return y.reshape(n, h, w, _COUT)


def _dwp_call(x: jax.Array, g: jax.Array, tile_h: int | None,
              interpret: bool) -> jax.Array:
    n, h, w, cin = x.shape
    tile_h = tile_h or _pick_tile(h)
    xf = x.reshape(n, h, w * cin)
    gf = g.reshape(n, h, w * _COUT)
    grid = (n, h // tile_h)
    return pl.pallas_call(
        functools.partial(_dwp_kernel, tile_h=tile_h, width=w, height=h),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, tile_h, w * _COUT), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_CHUNKS, 128, 128), lambda b, i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((_CHUNKS, 128, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2 * _HALO, (w + 4) * cin), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xf, gf)


# --------------------------------------------------------------------------
# public op with custom VJP
# --------------------------------------------------------------------------


def supported(x_shape, w_shape) -> bool:
    """Eligibility for the COMPILED kernel: 3x3 / 64 -> 64 channels,
    H a multiple of 16 (Mosaic's bf16 DMA row tiling) and of the strip
    height, W even and >= 4 (output-pair packing), spatial extent small
    enough that the per-strip buffers fit VMEM (H*W <= 128^2 — the 256px
    block stays on XLA pending a strip-width variant)."""
    if tuple(w_shape) != (3, 3, _CIN, _COUT):
        return False
    n, h, w, c = x_shape
    return (c == _CIN and h % 16 == 0 and h % _pick_tile(h) == 0
            and w % _PAIR == 0 and w >= 4 and h * w <= 128 * 128)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_pallas(x: jax.Array, w: jax.Array, tile_h: int | None = None,
                   interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv, NHWC, Cin=Cout=64, Pallas output-pair
    packed. Numerics: bf16 operands (as passed), f32 accumulation —
    the same contraction dtype XLA uses for these convs."""
    return _conv_call(x, pack_weights(w.astype(x.dtype)), tile_h, interpret)


def _vjp_fwd(x, w, tile_h, interpret):
    y = _conv_call(x, pack_weights(w.astype(x.dtype)), tile_h, interpret)
    return y, (x, w)


def _vjp_bwd(tile_h, interpret, res, gy):
    x, w = res
    gy = gy.astype(x.dtype)
    dx = _conv_call(gy, pack_weights(_rot_t(w).astype(x.dtype)), tile_h,
                    interpret)
    dwp = _dwp_call(x, gy, tile_h, interpret)
    dw = unpack_grad(dwp).astype(w.dtype)
    return dx, dw


conv3x3_pallas.defvjp(_vjp_fwd, _vjp_bwd)


# --------------------------------------------------------------------------
# hybrid: XLA forward + Pallas backward
# --------------------------------------------------------------------------
# Measured on the chip (analysis/bench_conv_kernel.py, K=200 chained,
# b64 64x64): XLA's *forward* emitter beats the Pallas kernel (411 vs
# 566 us) while the full differentiated conv favors Pallas (fwd+bwd
# 782 vs 1,032 us = 74.1 vs 56.2 TFLOP/s). The split this suggests
# (XLA fwd + Pallas bwd) measures WORSE than either pure impl end-to-
# end (1,246 us): mixing the impls inside one grad forces layout
# round-trips between the XLA conv's preferred layout and the kernel's
# row-major operands. And in the full flagship step even pure Pallas
# loses 38% (BENCHMARKS.md "Pallas 3x3 conv: measured on-chip") — the
# pallas_call boundary forfeits XLA's conv+BN-epilogue fusion. Both
# impls are kept as explicit opt-ins; 'auto' stays on XLA.


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def conv3x3_hybrid(x: jax.Array, w: jax.Array, tile_h: int | None = None,
                   interpret: bool = False) -> jax.Array:
    """3x3 stride-1 SAME conv: XLA emitter forward, Pallas backward."""
    del tile_h, interpret
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _hybrid_fwd(x, w, tile_h, interpret):
    return conv3x3_hybrid(x, w, tile_h, interpret), (x, w)


conv3x3_hybrid.defvjp(_hybrid_fwd, _vjp_bwd)
