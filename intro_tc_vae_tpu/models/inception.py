"""InceptionV3 feature extractor (pool3, 2048-d) for standard FID.

A flax/NHWC implementation targeting **pytorch-fid parity exactly**: the
trunk is torchvision's inception_v3 (BasicConv2d = conv(bias-free) +
BN(eps=1e-3) + ReLU; Mixed_5*/6*/7* blocks) with pytorch-fid's FID-net
patches — avg pools use count_include_pad=False (FIDInceptionA/C/E_1)
and Mixed_7c's branch_pool is a 3x3/s1/p1 MAX pool (FIDInceptionE_2) —
so with pytorch-fid's ``pt_inception-2015-12-05`` state_dict (tensor
names shared with torchvision) the pool3 features, and hence FID, are
comparable to published scores. A plain torchvision checkpoint also
loads (same names) but then features follow the FID-net pooling, not
torchvision's. Transplant via :func:`load_torch_inception_weights`.

Pretrained weights are NOT bundled (this build environment has no
network egress); :func:`inception_feature_fn` is gated on a local weights
file and callers fall back to encoder-FID (evaluation/fid.py) when it is
absent. Reference repo has no FID at all — this serves BASELINE config 5.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

WEIGHTS_ENV = "ITCVAE_INCEPTION_WEIGHTS"
DEFAULT_WEIGHTS = os.path.expanduser("~/.cache/itcvae/inception_v3.pth")


class BasicConv2d(nn.Module):
    out: int
    kernel: Sequence[int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        elif isinstance(pad, (tuple, list)) and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(self.out, tuple(self.kernel), strides=(self.stride,) * 2,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         name="bn")(x)
        return nn.relu(x)


def _maxpool3x3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


def _avgpool3x3s1p1(x):
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avgpool3x3s1p1(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _maxpool3x3s2(x)], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = _avgpool3x3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _maxpool3x3s2(x)], axis=-1)


class InceptionE(nn.Module):
    """pool='avg' is pytorch-fid's FIDInceptionE_1 (Mixed_7b: avg_pool
    with count_include_pad=False); pool='max' is FIDInceptionE_2
    (Mixed_7c: canonical pytorch-fid patches branch_pool to a 3x3/s1/p1
    MAX pool, matching the original TF-graph FID network)."""

    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "max":
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        else:
            bp = _avgpool3x3s1p1(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """Images in [0, 1], NHWC, any size -> pool3 features [B, 2048].

    Input handling matches pytorch-fid: bilinear resize to 299x299 and
    scale to [-1, 1] before the trunk.
    """

    resize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if x.shape[-1] == 1:
            x = jnp.repeat(x, 3, axis=-1)
        if self.resize_input and x.shape[1:3] != (299, 299):
            x = jax.image.resize(
                x, (x.shape[0], 299, 299, x.shape[-1]), method="bilinear"
            )
        x = 2.0 * x - 1.0
        x = BasicConv2d(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _maxpool3x3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _maxpool3x3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(pool="max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # global avg pool -> [B, 2048]


def load_torch_inception_weights(path: str):
    """Torch state_dict (.pth) -> (params, batch_stats) for
    InceptionV3Features. Accepts torchvision inception_v3 checkpoints
    (fc / AuxLogits entries are ignored)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    params: dict = {}
    stats: dict = {}

    def put(tree, keys, value):
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = value

    for name, tensor in sd.items():
        if name.startswith(("fc.", "AuxLogits.")):
            continue
        arr = np.asarray(tensor)
        parts = name.split(".")  # e.g. Mixed_5b.branch1x1.conv.weight
        *scope, leaf_owner, leaf = parts
        module_path = scope + [leaf_owner]
        if leaf_owner == "conv" and leaf == "weight":
            put(params, scope + ["conv", "kernel"],
                jnp.asarray(arr.transpose(2, 3, 1, 0)))  # OIHW -> HWIO
        elif leaf_owner == "bn" and leaf == "weight":
            put(params, scope + ["bn", "scale"], jnp.asarray(arr))
        elif leaf_owner == "bn" and leaf == "bias":
            put(params, scope + ["bn", "bias"], jnp.asarray(arr))
        elif leaf_owner == "bn" and leaf == "running_mean":
            put(stats, scope + ["bn", "mean"], jnp.asarray(arr))
        elif leaf_owner == "bn" and leaf == "running_var":
            put(stats, scope + ["bn", "var"], jnp.asarray(arr))
        # num_batches_tracked and anything else: not needed
    return params, stats


def find_weights(path: Optional[str] = None) -> Optional[str]:
    """Resolve a weights file: explicit arg > $ITCVAE_INCEPTION_WEIGHTS >
    the default cache path. None when nothing exists (offline gate)."""
    for cand in (path, os.environ.get(WEIGHTS_ENV), DEFAULT_WEIGHTS):
        if cand and os.path.exists(cand):
            return cand
    return None


def inception_feature_fn(weights_path: Optional[str] = None, batch_jit: bool = True):
    """Build the standard-FID feature function, or None when no weights
    are available offline (callers then use encoder-FID)."""
    resolved = find_weights(weights_path)
    if resolved is None:
        return None
    params, stats = load_torch_inception_weights(resolved)
    model = InceptionV3Features()
    variables = {"params": params, "batch_stats": stats}

    def raw(x):
        return model.apply(variables, x)

    fn = jax.jit(raw) if batch_jit else raw

    def feature_fn(images: np.ndarray) -> np.ndarray:
        return np.asarray(fn(jnp.asarray(images, jnp.float32)))

    return feature_fn
