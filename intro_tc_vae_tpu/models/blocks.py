"""Conv block architectures ('conv' | 'res' | 'inception'), NHWC flax.linen.

Topology parity with the reference models.py:8-193. Differences that are
deliberate TPU-first redesign, not omissions:

* NHWC layout (XLA/TPU's native conv layout) instead of torch NCHW.
* BatchNorm is an explicit ``batch_stats`` collection threaded through the
  solver train steps (the reference relies on nn.Module mutable state);
  momentum 0.9 here == torch momentum 0.1 (flax keeps `m*old + (1-m)*new`).
* The reference's ``ConvolutionalBlock`` allocates a ``conv_expand`` that
  its forward never uses (dead parameters, models.py:15-26); we do not
  allocate dead parameters.
* ``inc is not outc`` identity-vs-equality quirks in the reference are
  normalized to ``inc != outc``.

eps values match as-executed: 1e-4 on conv/inception-path BNs
(models.py:13,37,48,130), torch default 1e-5 on ResidualBlock BNs
(models.py:91,102).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from intro_tc_vae_tpu.models.init import torch_bias_init, torch_kernel_init

LEAKY_SLOPE = 0.2


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=LEAKY_SLOPE)


def conv(out_ch: int, kernel: int, *, use_bias: bool = False, in_ch: int | None = None,
         dtype: Any = None, name: str | None = None, tile_rows: int = 0,
         impl: str = "xla") -> nn.Module:
    """3x3/5x5/1x1 'SAME' conv with torch-default init (stride 1).

    ``tile_rows > 0`` selects the strip-tiled execution for large spatial
    inputs (StripTiledConv) — same params/math, batched-strip shape.
    ``impl='pallas'`` routes eligible 3x3 convs (64 -> 64 channels, no
    bias) through the output-pair-packed Pallas kernel
    (ops/conv_pallas.py); ineligible shapes keep XLA's emitter."""
    if impl in ("pallas", "hybrid") and kernel == 3 and not use_bias \
            and tile_rows == 0:
        return PallasConv3x3(features=out_ch, dtype=dtype, name=name,
                             impl=impl)
    if tile_rows > 0 and kernel > 1:
        return StripTiledConv(
            features=out_ch, kernel=kernel, tile_rows=tile_rows,
            use_bias=use_bias, in_ch=in_ch, dtype=dtype, name=name,
        )
    kwargs = {}
    if use_bias:
        assert in_ch is not None, "bias init needs fan_in"
        kwargs["bias_init"] = torch_bias_init(in_ch * kernel * kernel)
    return nn.Conv(
        out_ch,
        (kernel, kernel),
        strides=(1, 1),
        padding="SAME",
        use_bias=use_bias,
        kernel_init=torch_kernel_init("conv"),
        dtype=dtype,
        name=name,
        **kwargs,
    )


class StripTiledConv(nn.Module):
    """The same stride-1 'SAME' conv as ``conv()``, executed space-to-batch.

    XLA's TPU conv emitter loses ~2x efficiency on large spatial extents
    with few channels (BENCHMARKS.md: the 64-channel 256-pixel decoder
    block runs at ~28 TFLOP/s where the identical channel structure
    reaches ~55 TFLOP/s at 64 px). When the input height is at least
    ``2*tile_rows``, the image is split into ``H/tile_rows`` horizontal
    strips with ``kernel//2`` halo rows on each side; the strips are
    stacked onto the batch axis (sample-major, so the output reassembles
    with a pure reshape — no relayout) and convolved VALID-in-H /
    SAME-in-W. Every output pixel computes exactly the original taps
    (equal to accumulation-order noise, ~1e-7 relative in fp32).

    NOTE: measured SLOWER in-context — the 256 px full train step drops
    93.8 -> 51.1/48.4 img/s at tile_rows 64/32 (BENCHMARKS.md negative
    results): the halo stack materializes a full-tensor copy per conv and
    breaks XLA's conv-epilogue fusions, which outweighs any emitter win.
    Ships as a tested drop-in option, off by default (``tile_rows: 0``).

    Parameters are stored in ``nn.Conv``'s exact layout and names
    (``kernel`` [k,k,in,out], ``bias`` [out], torch-default init), so
    checkpoints are interchangeable with the plain conv.
    """

    features: int
    kernel: int
    tile_rows: int
    use_bias: bool = False
    in_ch: int | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        kernel = self.param(
            "kernel", torch_kernel_init("conv"),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        bias = None
        if self.use_bias:
            assert self.in_ch is not None, "bias init needs fan_in"
            bias = self.param(
                "bias", torch_bias_init(self.in_ch * k * k),
                (self.features,), jnp.float32,
            )
        # flax-style dtype promotion: params cast to the compute dtype
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)

        n, h, w, _ = x.shape
        r = k // 2
        t = h // self.tile_rows if h >= 2 * self.tile_rows else 1
        dn = ("NHWC", "HWIO", "NHWC")
        if t == 1 or h % t:
            y = jax.lax.conv_general_dilated(
                x, kernel, (1, 1), [(r, r), (r, r)], dimension_numbers=dn
            )
        else:
            hs = h // t
            xp = jnp.pad(x, ((0, 0), (r, r), (0, 0), (0, 0)))
            strips = [xp[:, i * hs: i * hs + hs + 2 * r] for i in range(t)]
            xt = jnp.stack(strips, axis=1).reshape(n * t, hs + 2 * r, w, -1)
            yt = jax.lax.conv_general_dilated(
                xt, kernel, (1, 1), [(0, 0), (r, r)], dimension_numbers=dn
            )
            y = yt.reshape(n, h, w, self.features)
        if bias is not None:
            y = y + bias
        return y


class PallasConv3x3(nn.Module):
    """3x3 stride-1 'SAME' conv routed through the output-pair-packed
    Pallas kernel (ops/conv_pallas.py) when the shape is eligible
    (Cin = Cout = 64, H divisible by the row tile, W even) — the
    lane-starved decoder shapes where XLA's emitter runs at 23-38% of
    the chip's conv peak (BENCHMARKS.md per-layer roofline). Ineligible
    shapes silently use the identical XLA conv, so the module is a safe
    drop-in. Parameters live in ``nn.Conv``'s exact layout and names
    (``kernel`` [3,3,in,out], torch-default init): checkpoints are
    interchangeable with the plain conv."""

    features: int
    dtype: Any = None
    impl: str = "pallas"  # 'pallas': Pallas fwd+bwd; 'hybrid': XLA fwd,
    #                       Pallas bwd (the measured fastest split —
    #                       ops/conv_pallas.py conv3x3_hybrid)

    @nn.compact
    def __call__(self, x):
        import jax as _jax

        from intro_tc_vae_tpu.ops.conv_pallas import (
            conv3x3_hybrid,
            conv3x3_pallas,
            supported,
        )

        kernel = self.param(
            "kernel", torch_kernel_init("conv"),
            (3, 3, x.shape[-1], self.features), jnp.float32,
        )
        x, kernel = nn.dtypes.promote_dtype(x, kernel, dtype=self.dtype)
        if supported(x.shape, kernel.shape):
            # compiled Mosaic on TPU; interpreter on CPU (tests/dryrun)
            interpret = _jax.default_backend() != "tpu"
            fn = conv3x3_hybrid if self.impl == "hybrid" else conv3x3_pallas
            return fn(x, kernel, None, interpret)
        return jax.lax.conv_general_dilated(
            x, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class GroupedBatchNorm(nn.Module):
    """BatchNorm with flax/torch-matching numerics plus *grouped* statistics.

    With ``groups=1`` this reproduces ``nn.BatchNorm`` exactly (same param /
    batch_stats names+shapes, fp32 stats, fast-variance, same EMA update).

    With ``groups=G`` the batch axis is treated as a concatenation of G
    equal sub-batches: statistics are computed and applied **per group**,
    and the running averages receive the G per-group EMA updates composed
    sequentially in group order. This makes one batch-G*B network pass
    numerically identical (per sample) to G sequential batch-B passes —
    the enabler for pairing the Soft-Intro step's independent passes into
    larger, MXU-friendlier calls (solvers/intro.py) without changing the
    reference's per-pass BN semantics (reference models.py train-mode BN).
    """

    use_running_average: bool = False
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, groups: int = 1):
        feat = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda s: jnp.zeros(s, jnp.float32), (feat,)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda s: jnp.ones(s, jnp.float32), (feat,)
        )
        scale = self.param("scale", nn.initializers.ones, (feat,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (feat,), self.param_dtype)

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value  # [C]
            y = (x - mean) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        elif groups == 1:
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            axes = tuple(range(x.ndim - 1))
            mean = xf.mean(axes)
            mu2 = jax.lax.square(xf).mean(axes)
            var = jnp.maximum(0.0, mu2 - jax.lax.square(mean))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
            y = (x - mean) * (jax.lax.rsqrt(var + self.epsilon) * scale) + bias
        else:
            b = x.shape[0]
            assert b % groups == 0, f"batch {b} not divisible by groups {groups}"
            xg = x.reshape(groups, b // groups, *x.shape[1:])
            xf = xg.astype(jnp.promote_types(x.dtype, jnp.float32))
            axes = tuple(range(1, xg.ndim - 1))
            mean = xf.mean(axes)                         # [G, C]
            mu2 = jax.lax.square(xf).mean(axes)
            var = jnp.maximum(0.0, mu2 - jax.lax.square(mean))
            if not self.is_initializing():
                m = self.momentum
                rm, rv = ra_mean.value, ra_var.value
                for g in range(groups):  # sequential per-pass EMA composition
                    rm = m * rm + (1 - m) * mean[g]
                    rv = m * rv + (1 - m) * var[g]
                ra_mean.value, ra_var.value = rm, rv
            bshape = (groups,) + (1,) * (xg.ndim - 2) + (feat,)
            y = (xg - mean.reshape(bshape)) * (
                jax.lax.rsqrt(var.reshape(bshape) + self.epsilon) * scale
            ) + bias
            y = y.reshape(x.shape)

        # result dtype matches flax _normalize: canonicalize(x, scale, bias,
        # dtype=self.dtype) — self.dtype when set, else the promoted fp32.
        out_dtype = self.dtype or jnp.promote_types(x.dtype, jnp.float32)
        return y.astype(out_dtype)


def batch_norm(train: bool, *, eps: float = 1e-5, dtype: Any = None,
               name: str | None = None) -> GroupedBatchNorm:
    """BatchNorm matching torch semantics (momentum 0.1 torch == 0.9 flax)."""
    return GroupedBatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=eps,
        dtype=dtype,
        name=name,
    )


def avg_pool2(x):
    """AvgPool2d(2) equivalent (window 2, stride 2, NHWC).

    Kept as ``reduce_window`` (nn.avg_pool): a reshape-mean lowering is
    4x faster in ISOLATION (and bit-identical on TPU) but 4-10% slower in
    the full train step at every resolution — the 6D reshape breaks XLA's
    fusion of the pool into adjacent convs and forces relayouts.
    """
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def upsample_nearest2(x):
    """nn.Upsample(scale_factor=2, mode='nearest') equivalent, NHWC."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class ConvolutionalBlock(nn.Module):
    """Plain double-conv block (reference models.py:8-54): no skip path.

    conv3x3 -> BN(1e-4) -> LReLU -> conv3x3 -> BN(1e-4) -> LReLU.
    """

    inc: int
    outc: int
    scale: float = 1.0
    dtype: Any = None
    tile_rows: int = 0
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        midc = int(self.outc * self.scale)
        y = conv(midc, 3, dtype=self.dtype, name="conv1",
                 tile_rows=self.tile_rows, impl=self.conv_impl)(x)
        y = batch_norm(train, eps=1e-4, dtype=self.dtype, name="bn1")(y, groups)
        y = leaky_relu(y)
        y = conv(self.outc, 3, dtype=self.dtype, name="conv2",
                 tile_rows=self.tile_rows, impl=self.conv_impl)(y)
        y = batch_norm(train, eps=1e-4, dtype=self.dtype, name="bn2")(y, groups)
        return leaky_relu(y)


class ResidualBlock(nn.Module):
    """Pre-BN residual block (reference models.py:57-115, after hhb072/IntroVAE).

    identity = x (or 1x1 conv_expand when inc != outc);
    out = LReLU(BN(conv3x3(LReLU(BN(conv3x3(x))))) + identity).
    BN uses torch-default eps 1e-5 here (the reference passes no eps).
    """

    inc: int
    outc: int
    scale: float = 1.0
    dtype: Any = None
    tile_rows: int = 0
    conv_impl: str = "xla"

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        midc = int(self.outc * self.scale)
        if self.inc != self.outc:
            identity = conv(self.outc, 1, dtype=self.dtype, name="conv_expand")(x)
        else:
            identity = x
        y = conv(midc, 3, dtype=self.dtype, name="conv1",
                 tile_rows=self.tile_rows, impl=self.conv_impl)(x)
        y = batch_norm(train, dtype=self.dtype, name="bn1")(y, groups)
        y = leaky_relu(y)
        y = conv(self.outc, 3, dtype=self.dtype, name="conv2",
                 tile_rows=self.tile_rows, impl=self.conv_impl)(y)
        y = batch_norm(train, dtype=self.dtype, name="bn2")(y, groups)
        return leaky_relu(y + identity)


class Conv2dBatchNorm(nn.Module):
    """conv -> BN(1e-4) -> LReLU helper (reference models.py:118-138)."""

    inc: int
    outc: int
    kernel: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        y = conv(self.outc, self.kernel, dtype=self.dtype, name="conv")(x)
        y = batch_norm(train, eps=1e-4, dtype=self.dtype, name="batch_norm")(y, groups)
        return leaky_relu(y)


class InceptionResnetBlock(nn.Module):
    """Two-branch 1x1 inception block with residual add (models.py:141-182).

    branch_0: 1x1 -> outc/2;  branch_1: 1x1 -> midc -> 1x1 -> outc/2;
    concat -> 1x1 conv (with bias) -> + identity -> LReLU.
    """

    inc: int
    outc: int
    scale: float = 1.0
    dtype: Any = None
    tile_rows: int = 0  # accepted for interface parity; 1x1 convs never tile
    conv_impl: str = "xla"  # interface parity; 1x1 convs never route

    @nn.compact
    def __call__(self, x, train: bool = True, groups: int = 1):
        assert self.outc % 2 == 0
        midc = int(self.outc * self.scale)
        if self.inc != self.outc:
            identity = conv(self.outc, 1, dtype=self.dtype, name="conv_expand")(x)
        else:
            identity = x
        x0 = Conv2dBatchNorm(self.inc, self.outc // 2, dtype=self.dtype, name="branch_0")(
            x, train, groups
        )
        x1 = Conv2dBatchNorm(self.inc, midc, dtype=self.dtype, name="branch_1_0")(
            x, train, groups
        )
        x1 = Conv2dBatchNorm(midc, self.outc // 2, dtype=self.dtype, name="branch_1_1")(
            x1, train, groups
        )
        y = jnp.concatenate([x0, x1], axis=-1)
        y = conv(self.outc, 1, use_bias=True, in_ch=self.outc, dtype=self.dtype,
                 name="conv")(y)
        return leaky_relu(y + identity)


class PackedPredictConv(nn.Module):
    """The decoder's 5×5 stride-1 'SAME' conv to ``cdim`` output channels,
    executed as an output-packed space-to-depth conv.

    With only 3 output channels the plain conv uses 3/128 MXU lanes; XLA's
    emitters leave it far off both the compute and memory bounds (measured
    3-20 TFLOP/s effective). Packing ``block × block`` output pixels into
    channels turns it into a 3×3 conv over ``block²·in_ch`` input channels
    producing ``block²·cdim`` outputs at ``1/block²`` the spatial size —
    the same dot products in a different accumulation order (standalone
    fwd+bwd 6.6×/2.9×/1.7× faster at 64/128/256px, bf16-noise-level value
    differences). NOTE: in the full train step the packed form measured
    −4…−13% end-to-end at every resolution — the dense packed kernel does
    ~5.8× the FLOPs of the 25-tap original, which eats the efficiency win
    once the surrounding convs keep the MXU busy (BENCHMARKS.md negative
    results) — so it ships as an option, off by default.

    Parameters are stored in the plain conv's exact layout and names
    (``kernel`` [5,5,in_ch,cdim], ``bias`` [cdim], torch-default init), so
    checkpoints and torch transplants are interchangeable with ``conv()``;
    the packed weight tensor is rebuilt from ``kernel`` inside the step by
    one tiny constant-one-hot matmul (``P @ w`` — MXU-trivial; its
    transpose in backward gives exact original-layout gradients; a scatter
    formulation lowered to thousands of serialized updates on TPU).
    """

    cdim: int
    in_ch: int
    block: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import numpy as np

        k, b, cin = 5, self.block, self.in_ch
        kernel = self.param(
            "kernel", torch_kernel_init("conv"), (k, k, cin, self.cdim),
            jnp.float32,
        )
        bias = self.param(
            "bias", torch_bias_init(cin * k * k), (self.cdim,), jnp.float32
        )
        dtype = self.dtype or x.dtype
        x = x.astype(dtype)
        w = kernel.astype(dtype)

        # packed tap (di,dj, ai,ci, ao,co) pulls original tap (ky,kx):
        # output pixel at in-block offset ao reads input row
        # (di-1)*b + ai = ao + ky - k//2  =>  ky = (di-1)*b + ai + k//2 - ao
        # (same table for kx with dj,ci,co); out-of-range taps are zero.
        di, ai, ao = np.ogrid[0:3, 0:b, 0:b]
        ky = (di - 1) * b + ai + k // 2 - ao          # [3, b, b]
        ky = np.where((ky >= 0) & (ky < k), ky, -1)
        sel = ky[:, None, :, None, :, None] * k + ky[None, :, None, :, None, :]
        sel = np.where((ky[:, None, :, None, :, None] < 0)
                       | (ky[None, :, None, :, None, :] < 0), -1, sel)
        onehot = np.zeros((3, 3, b, b, b, b, k * k), np.float32)
        np.put_along_axis(onehot, np.maximum(sel, 0)[..., None],
                          (sel >= 0)[..., None].astype(np.float32), axis=-1)
        P = jnp.asarray(onehot.reshape(-1, k * k), dtype)

        # [di,dj,ai,ci,ao,co, cin,cdim] via one dense (9b⁴ × 25) matmul
        wp = (P @ w.reshape(k * k, -1)).reshape(
            3, 3, b, b, b, b, cin, self.cdim
        )
        # -> [3,3, ai,ci,cin (s2d channel order), ao,co,cdim (d2s order)]
        wp = wp.transpose(0, 1, 2, 3, 6, 4, 5, 7).reshape(
            3, 3, b * b * cin, b * b * self.cdim
        )

        n, h, wdt, _ = x.shape
        xp = x.reshape(n, h // b, b, wdt // b, b, cin)
        xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h // b, wdt // b, -1)
        yp = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        yp = yp + jnp.tile(bias, b * b).astype(yp.dtype)
        yp = yp.reshape(n, h // b, wdt // b, b, b, self.cdim)
        return yp.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, wdt, self.cdim)


_BLOCKS = {
    "conv": ConvolutionalBlock,
    "res": ResidualBlock,
    "inception": InceptionResnetBlock,
}


def get_conv_class(arch: str):
    """Block class for an architecture string (reference models.py:185-193)."""
    try:
        return _BLOCKS[arch]
    except KeyError:
        raise ValueError(f"unknown arch '{arch}' (expected one of {list(_BLOCKS)})")
