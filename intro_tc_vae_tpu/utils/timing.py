"""Trustworthy device timing.

On remote/tunneled backends (axon), ``jax.block_until_ready`` can return
before execution finishes, so enqueue rate masquerades as throughput.
The only reliable completion barrier is fetching a VALUE to the host.
``bench_fetch`` times a loop whose final iteration's output is fetched;
chain-dependent loops (train steps threading state) are then timed
correctly because the last value transitively requires every step.
"""

from __future__ import annotations

import time
from typing import Callable

import numpy as np


def fetch(x) -> np.ndarray:
    """Force execution by materializing bytes on the host."""
    return np.asarray(x)


def bench_fetch(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                fetch_out: Callable = None):
    """Mean seconds per call. ``fn`` must return something whose value
    depends on the full computation; ``fetch_out`` selects what to fetch
    (default: first leaf)."""
    import jax

    def materialize(out):
        if fetch_out is not None:
            return fetch(fetch_out(out))
        leaf = jax.tree_util.tree_leaves(out)[0]
        return fetch(leaf)

    out = fn(*args)
    materialize(out)
    for _ in range(max(0, warmup - 1)):
        out = fn(*args)
        materialize(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    materialize(out)
    return (time.perf_counter() - t0) / iters


def bench_chained(step_fn: Callable, state, *args, iters: int = 10,
                  warmup: int = 2, fetch_out: Callable = None):
    """Like bench_fetch for (state, ...) -> (state, out) step functions:
    state threads through iterations so the final fetch forces the chain."""
    def materialize(out):
        sel = fetch_out(out) if fetch_out is not None else out
        import jax

        return fetch(jax.tree_util.tree_leaves(sel)[0])

    st = state
    for _ in range(warmup):
        st, out = step_fn(st, *args)
    materialize(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        st, out = step_fn(st, *args)
    materialize(out)
    return (time.perf_counter() - t0) / iters, st
