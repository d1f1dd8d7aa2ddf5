"""Mesh construction + sharding helpers.

Mesh axes: ('data', 'model'). Data parallelism shards the batch dim;
the 'model' axis is reserved so tensor-parallel sharding of the conv
channels/fc features is a config change, not a rewrite (SURVEY §2.9 TP
row). With model=1 (default) parameters are replicated.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: int = 0,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    n_devices=0 uses all local devices. model_parallel divides them
    between the two axes (must divide n_devices).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_devices:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devices)} available"
            )
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh, ndim: int = 4, batch_axis: int = 0) -> NamedSharding:
    """Shard the batch axis over 'data'; replicate the rest.

    batch_axis=1 with ndim=5 covers scan-stacked batches [K, B, H, W, C].
    """
    spec = [None] * ndim
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_spec(path: str, shape, mesh: Mesh, min_dim: int = 256) -> P:
    """Tensor-parallel PartitionSpec for one state leaf (SURVEY §2.9 TP row).

    Rules (applied only when the mesh has a 'model' axis > 1):
    * conv kernels [kh, kw, in, out]: shard the output channels on 'model'
      when wide enough — the wide trunk convs (256/512 channels) split,
      the narrow stem/head stay replicated;
    * dense kernels [in, out] (fc heads): shard the widest divisible dim;
    * per-channel vectors (bias / BN scale / BN stats) follow their conv:
      sharded on 'model' when wide enough.

    `min_dim` keeps narrow tensors replicated (sharding a 64-wide channel
    dim 4 ways buys nothing and costs layout changes). Optimizer-state
    leaves mirror the params tree (same trailing path names + shapes), so
    the same rule shards Adam moments consistently.
    """
    if "model" not in mesh.shape or mesh.shape["model"] == 1:
        return P()
    ms = mesh.shape["model"]
    shape = tuple(shape)
    if len(shape) == 4 and shape[3] >= min_dim and shape[3] % ms == 0:
        return P(None, None, None, "model")
    if len(shape) == 2 and path.endswith("kernel"):
        ax = int(shape[1] >= shape[0])
        if shape[ax] >= min_dim and shape[ax] % ms == 0:
            spec = [None, None]
            spec[ax] = "model"
            return P(*spec)
    if len(shape) == 1 and shape[0] >= min_dim and shape[0] % ms == 0:
        return P("model")
    return P()


def shard_state(state, mesh: Mesh, min_dim: int = 256):
    """Place a TrainState on the mesh.

    Data-parallel state (model axis 1) is fully replicated. With
    model_parallel > 1, `param_spec` shards the wide kernels/channels over
    the 'model' axis (params, batch_stats, and the mirrored optimizer
    moments alike). Under GSPMD the jitted step keeps these shardings;
    batches arrive data-sharded via the loader.
    """
    def path_str(path) -> str:
        parts = []
        for p in path:
            for attr in ("key", "name", "idx"):
                if hasattr(p, attr):
                    parts.append(str(getattr(p, attr)))
                    break
            else:
                parts.append(str(p))
        return "/".join(parts)

    def place(path, leaf):
        spec = param_spec(path_str(path), getattr(leaf, "shape", ()), mesh, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, state)
