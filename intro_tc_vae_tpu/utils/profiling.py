"""Profiling: jax.profiler trace + step-time harness.

TPU-native equivalent of the reference's torch.autograd.profiler wrap
(train.py:207-230): config.profile traces the first ~50 iters and the
train loop prints per-step timing stats instead of the torch op table.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str = "/tmp/jax-trace", enabled: bool = True):
    """Capture a profiler trace viewable in TensorBoard / xprof."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {log_dir}")


class StepTimer:
    """Wall-clock step timing with device sync on read."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, skip_first: int = 1) -> dict:
        ts = self.times[skip_first:] or self.times
        return {
            "steps": len(ts),
            "mean_s": sum(ts) / len(ts),
            "min_s": min(ts),
            "max_s": max(ts),
        }
