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


def shard_state(state, mesh: Mesh):
    """Place a TrainState on the mesh (replicated params/opt state).

    Under GSPMD the jitted step keeps these shardings; batches arrive
    data-sharded via the loader.
    """
    repl = replicated_sharding(mesh)
    return jax.device_put(state, repl)
