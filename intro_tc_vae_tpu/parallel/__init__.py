"""SPMD parallelism: device mesh + named shardings.

The reference is single-device (SURVEY §2.9: no DDP/launcher/world-size).
Here data-parallelism is first-class and free: the train step is jitted
over a `jax.sharding.Mesh` with the batch sharded on the 'data' axis and
parameters replicated; GSPMD inserts the gradient psums (and makes
BatchNorm batch statistics and the total-correlation logsumexp *global*
across the batch axis — true sync-BN / global-batch TC semantics) without
any hand-written communication.
"""

from intro_tc_vae_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_spec,
    replicated_sharding,
    shard_state,
)
from intro_tc_vae_tpu.parallel.distributed import (
    initialize_distributed,
    local_batch_slice,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "param_spec",
    "replicated_sharding",
    "shard_state",
    "initialize_distributed",
    "local_batch_slice",
]
