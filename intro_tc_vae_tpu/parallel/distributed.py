"""Multi-process / multi-slice initialization.

Single-process multi-chip needs nothing (jax.devices() sees the slice).
For multi-host pods / multi-slice DCN deployments, call
``initialize_distributed()`` once per process before any jax usage; the
mesh helpers in parallel.mesh then see the global device set and GSPMD
lays collectives over ICI within a slice and DCN across slices.

The reference has no distributed support of any kind (SURVEY §2.9); this
is the TPU-native extension point. train.py calls
``initialize_distributed()`` on startup (env-driven, no-op single
process) and DeviceLoader feeds each process its ``local_batch_slice``
rows. Validated by a real 2-process ``jax.distributed`` CPU cluster test
(tests/test_multiprocess.py); only one chip is reachable on this build
machine, so cross-host ICI/DCN runs are exercised there, not here.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or standard env vars.

    Returns True if distributed mode was initialized, False for the
    single-process fallback (no-op). Safe to call unconditionally.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "ITCVAE_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return False  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def local_batch_slice(global_batch: int) -> slice:
    """The [start, stop) rows of the global batch this process should feed
    (uniform split by process index)."""
    import jax

    if global_batch % jax.process_count() != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by "
            f"{jax.process_count()} processes — per-process rows would not "
            f"tile the global batch"
        )
    per = global_batch // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)
