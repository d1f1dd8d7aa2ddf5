"""Encoder / Decoder / SoftIntroVAE (flax.linen, NHWC).

Topology parity with reference models.py:196-355:

* Encoder: 5x5 stem conv -> BN(1e-4) -> LReLU -> AvgPool/2, then per-stage
  {block, AvgPool/2} over channels[1:], a final same-width block, and a
  Dense head producing 2*z_dim chunked into (mu, logvar).
* Decoder: Dense z_dim -> conv features + LReLU ("limit output before
  convolutions", models.py:271-273), mirrored {block, nearest x2 upsample}
  stages, final block, 5x5 predict conv (with bias) + sigmoid.

The reference discovers the conv output shape with a dummy forward
(models.py:235-238); here the shape is computed statically (pure function
of image_size and len(channels)) — same result, no trace-time forward.

BatchNorm state lives in the ``batch_stats`` collection; all ``__call__``s
take ``train`` to switch between batch statistics (updating running stats)
and running averages, mirroring torch train()/eval() semantics.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from intro_tc_vae_tpu.models.blocks import (
    PackedPredictConv,
    avg_pool2,
    batch_norm,
    conv,
    get_conv_class,
    leaky_relu,
    upsample_nearest2,
)
from intro_tc_vae_tpu.models.init import torch_bias_init, torch_kernel_init
from intro_tc_vae_tpu.ops.losses import reparameterize


def conv_output_size(image_size: int, channels: Sequence[int]) -> Tuple[int, int, int]:
    """Static shape (h, w, c) of the encoder conv stack output (NHWC).

    One AvgPool/2 in the stem plus one per channels[1:] stage:
    spatial = image_size / 2^len(channels); width = channels[-1].
    """
    sz = image_size // (2 ** len(channels))
    if sz < 1:
        raise ValueError(
            f"image_size {image_size} too small for {len(channels)} downsamples"
        )
    return (sz, sz, channels[-1])


def resolve_tile_rows(tile_rows: int, image_size: int) -> int:
    """Resolve the config ``tile_rows`` knob to a concrete strip height.

    -1 = auto: off at every resolution pending a measured in-context win
    (BENCHMARKS.md); >=0 passes through."""
    if tile_rows >= 0:
        return tile_rows
    return 0


def resolve_conv_impl(conv_impl: str) -> str:
    """Resolve the config ``conv_impl`` knob ('auto' -> concrete impl).

    'auto' resolves to 'xla' — a measured decision, not a default: the
    Pallas 3x3 kernel wins its shape in isolation (fwd+bwd 74.1 vs 56.2
    TFLOP/s on-chip) but LOSES 38% end-to-end (b64 flagship 1,401 vs
    2,271 img/s), because every pallas_call boundary forfeits XLA's
    conv+BN-epilogue fusion and costs extra HBM round-trips worth more
    than the lane-packing gain (BENCHMARKS.md "Pallas 3x3 conv:
    measured on-chip"). 'pallas'/'hybrid' stay available as explicit
    opt-ins for shapes/models without BN epilogues."""
    if conv_impl == "auto":
        return "xla"
    return conv_impl


def dense(features: int, fan_in: int, dtype: Any = None, name: str | None = None):
    return nn.Dense(
        features,
        kernel_init=torch_kernel_init("dense"),
        bias_init=torch_bias_init(fan_in),
        dtype=dtype,
        name=name,
    )


class Encoder(nn.Module):
    """Conv encoder producing (mu, logvar). Reference models.py:196-244."""

    arch: str = "res"
    cdim: int = 3
    zdim: int = 512
    channels: Sequence[int] = (64, 128, 256, 512, 512, 512)
    image_size: int = 256
    dtype: Any = None
    tile_rows: int = 0  # >0: strip-tile large-spatial convs (StripTiledConv)
    conv_impl: str = "xla"  # 'pallas': route the lane-starved 3x3 64->64
    #                         convs through ops/conv_pallas.py
    remat: bool = False  # rematerialize per-block: backward recomputes the
    #                      block's inner activations instead of keeping them
    #                      in HBM (jax.checkpoint via nn.remat) — trades
    #                      ~1 extra forward of FLOPs for ~2x activation
    #                      memory headroom at large image sizes

    @property
    def conv_output_size(self) -> Tuple[int, int, int]:
        return conv_output_size(self.image_size, self.channels)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = True, groups: int = 1):
        block = get_conv_class(self.arch)
        if self.remat:  # args: 0=module, 1=x, 2=train, 3=groups
            block = nn.remat(block, static_argnums=(2, 3))
        cc = self.channels[0]
        tr, ci = self.tile_rows, self.conv_impl

        y = conv(cc, 5, dtype=self.dtype, name="stem_conv", tile_rows=tr)(x)
        y = batch_norm(train, eps=1e-4, dtype=self.dtype, name="stem_bn")(y, groups)
        y = leaky_relu(y)
        y = avg_pool2(y)

        sz = self.image_size // 2
        for i, ch in enumerate(self.channels[1:]):
            y = block(cc, ch, dtype=self.dtype, name=f"res_in_{sz}",
                      tile_rows=tr, conv_impl=ci)(y, train, groups)
            y = avg_pool2(y)
            cc, sz = ch, sz // 2

        y = block(cc, cc, dtype=self.dtype, name=f"res_in_{sz}",
                  tile_rows=tr, conv_impl=ci)(y, train, groups)

        h, w, c = self.conv_output_size
        num_fc_features = h * w * c
        y = y.reshape(y.shape[0], -1)
        y = dense(2 * self.zdim, num_fc_features, dtype=self.dtype, name="fc")(y)
        # loss math runs in fp32 regardless of the conv compute dtype
        mu, logvar = jnp.split(y.astype(jnp.float32), 2, axis=1)
        return mu, logvar


class Decoder(nn.Module):
    """Conv decoder mapping z -> image in [0, 1]. Reference models.py:247-298."""

    arch: str = "res"
    cdim: int = 3
    zdim: int = 512
    channels: Sequence[int] = (64, 128, 256, 512, 512, 512)
    image_size: int = 256
    conv_input_size: Tuple[int, int, int] | None = None
    dtype: Any = None
    pack_predict: int = 0  # >1: run the 5x5 predict conv output-packed
    #                        (PackedPredictConv) — same params/math, MXU-
    #                        friendly shape; 0 = plain conv
    tile_rows: int = 0  # >0: strip-tile large-spatial convs (StripTiledConv)
    conv_impl: str = "xla"  # see Encoder.conv_impl
    remat: bool = False  # per-block rematerialization (see Encoder.remat)

    @nn.compact
    def __call__(self, z: jax.Array, train: bool = True, groups: int = 1):
        block = get_conv_class(self.arch)
        if self.remat:  # args: 0=module, 1=x, 2=train, 3=groups
            block = nn.remat(block, static_argnums=(2, 3))
        cc = self.channels[-1]
        cis = self.conv_input_size or conv_output_size(self.image_size, self.channels)
        num_fc_features = cis[0] * cis[1] * cis[2]
        tr, ci = self.tile_rows, self.conv_impl

        z = z.reshape(z.shape[0], -1)
        y = dense(num_fc_features, self.zdim, dtype=self.dtype, name="fc")(z)
        y = leaky_relu(y)  # limit pre-conv range (reference models.py:271-273)
        y = y.reshape(z.shape[0], *cis)

        sz = cis[0]
        for ch in self.channels[::-1]:
            y = block(cc, ch, dtype=self.dtype, name=f"res_in_{sz}",
                      tile_rows=tr, conv_impl=ci)(y, train, groups)
            y = upsample_nearest2(y)
            cc, sz = ch, sz * 2

        y = block(cc, cc, dtype=self.dtype, name=f"res_in_{sz}",
                  tile_rows=tr, conv_impl=ci)(y, train, groups)
        if self.pack_predict > 1 and sz % self.pack_predict == 0:
            y = PackedPredictConv(cdim=self.cdim, in_ch=cc,
                                  block=self.pack_predict, dtype=self.dtype,
                                  name="predict")(y)
        else:
            y = conv(self.cdim, 5, use_bias=True, in_ch=cc, dtype=self.dtype,
                     name="predict", tile_rows=tr)(y)
        # sigmoid + reconstruction losses in fp32 (bf16 conv compute stays
        # inside the blocks)
        return nn.sigmoid(y.astype(jnp.float32))


class SoftIntroVAE(nn.Module):
    """Composite VAE (reference models.py:301-355).

    ``__call__(x, deterministic)`` returns (mu, logvar, z, reconstruction);
    sampling draws from the 'reparam' PRNG collection. The two-phase intro
    solvers drive ``encoder``/``decoder`` separately via ``method=``.
    """

    arch: str = "res"
    cdim: int = 3
    zdim: int = 512
    channels: Sequence[int] = (64, 128, 256, 512, 512, 512)
    image_size: int = 256
    dtype: Any = None
    pack_predict: int = 0
    tile_rows: int = 0
    conv_impl: str = "xla"
    remat: bool = False

    def setup(self):
        self.encoder = Encoder(
            self.arch, self.cdim, self.zdim, self.channels, self.image_size,
            dtype=self.dtype, tile_rows=self.tile_rows,
            conv_impl=self.conv_impl, remat=self.remat, name="encoder",
        )
        self.decoder = Decoder(
            self.arch, self.cdim, self.zdim, self.channels, self.image_size,
            conv_input_size=conv_output_size(self.image_size, self.channels),
            dtype=self.dtype, pack_predict=self.pack_predict,
            tile_rows=self.tile_rows, conv_impl=self.conv_impl,
            remat=self.remat, name="decoder",
        )

    def __call__(self, x: jax.Array, deterministic: bool = False, train: bool = True):
        mu, logvar = self.encoder(x, train)
        if deterministic:
            z = mu
        else:
            z = reparameterize(self.make_rng("reparam"), mu, logvar)
        y = self.decoder(z, train)
        return mu, logvar, z, y

    def encode(self, x: jax.Array, train: bool = True):
        return self.encoder(x, train)

    def decode(self, z: jax.Array, train: bool = True):
        return self.decoder(z, train)

    def sample(self, z: jax.Array, train: bool = True):
        return self.decoder(z, train)

    def sample_with_noise(self, num_samples: int = 1, train: bool = True):
        z = jax.random.normal(self.make_rng("reparam"), (num_samples, self.zdim))
        return self.decoder(z, train)


def num_params(params) -> int:
    """Total parameter count of a params pytree."""
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))
