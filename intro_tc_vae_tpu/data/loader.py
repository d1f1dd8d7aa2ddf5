"""Device feeding: shuffled batching with background prefetch onto the
device (or a NamedSharding over a mesh's data axis).

TPU-native replacement for DataLoader(num_workers=2) + WrappedDataLoader
(reference train.py:146-159, dataset.py:16-27): a host thread assembles
the next numpy batch and `jax.device_put`s it while the device computes
the current step, keeping the XLA pipeline fed.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class CachedBatch(NamedTuple):
    """A batch by reference into the device-resident dataset cache.

    The loader yields these instead of materialized arrays when
    ``device_cache`` is active and ``yield_refs`` is set; the solver folds
    the gather into the train step's XLA program
    (solvers/base.py::_materialize_cached), so one step costs ONE dispatch
    and the only per-step host->device bytes are ``idx``/``flags``
    (~300 B). NamedTuple = pytree: it passes straight through ``jax.jit``
    boundaries.
    """

    cache: Any        # [N, H, W, C] uint8, device-resident (replicated)
    idx: Any          # [B] or [K*B] int32 row indices
    flags: Any        # same-length uint8 horizontal-flip flags, or None


def gather_cached(batch: CachedBatch, scan_steps: int = 1,
                  sharding=None):
    """Materialize a CachedBatch: on-device row gather + conditional
    horizontal flip (a uint8 width reversal — the same permutation the
    host path applies), reshaped to [K, B, ...] when scan-stacked.

    Works eagerly or inside jit; the solver calls it at trace time so
    XLA fuses the gather into the step program."""
    x = jnp.take(batch.cache, batch.idx, axis=0)
    if batch.flags is not None:  # trace-time branch: one variant per form
        x = jnp.where(batch.flags[:, None, None, None] != 0,
                      x[:, :, ::-1, :], x)
    if scan_steps > 1:
        x = x.reshape(scan_steps, -1, *x.shape[1:])
    if sharding is not None:
        x = jax.lax.with_sharding_constraint(x, sharding)
    return x


class DeviceLoader:
    """Iterates device-resident [B, H, W, C] float32 batches for one epoch.

    Args:
        dataset: anything with __len__ and get_batch(indices) (see
            data.datasets) or __getitem__ fallback.
        batch_size: per-step global batch size.
        shuffle: reshuffle each epoch.
        drop_last: drop the trailing partial batch (default True: jit'd
            train steps want static shapes; the reference pads implicitly
            by just running a smaller batch, which would retrace).
        sharding: optional jax.sharding.Sharding for the batch (data-axis
            NamedSharding for multi-chip).
        prefetch: number of batches to stage ahead (host thread).
        seed: shuffle RNG seed.
        pre_process: optional host-side fn(batch) -> batch applied before
            transfer (the WrappedDataLoader hook).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        drop_last: bool = True,
        sharding=None,
        prefetch: int = 2,
        seed: int = 0,
        pre_process: Optional[Callable] = None,
        include_labels: bool = False,
        stack_steps: int = 1,
        transfer_dtype: str = "float32",
        device_cache: str = "off",
        device_cache_budget_mb: int = 4096,
        yield_refs: bool = False,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.sharding = sharding
        self.prefetch = max(1, prefetch)
        self.pre_process = pre_process
        self.include_labels = include_labels
        self.stack_steps = max(1, int(stack_steps))
        # 'uint8'/'auto': transfer raw uint8 batches (4x fewer bytes over
        # the host->device link — the link, not the device, bounds system
        # throughput on thin interconnects) and let the jitted step
        # normalize on-device. Only taken when the dataset provides a
        # bit-exact raw path (datasets.get_batch_raw); 'auto' falls back
        # to float32 otherwise, 'uint8' raises. pre_process is a float-
        # domain hook and is skipped on the raw path.
        if transfer_dtype not in ("float32", "uint8", "auto"):
            raise ValueError(f"transfer_dtype: {transfer_dtype!r}")
        self.transfer_dtype = transfer_dtype
        self._want_raw = transfer_dtype in ("uint8", "auto")
        # Device-resident dataset cache: put the WHOLE uint8 array in HBM
        # once (replicated over the mesh) and gather batches on-device in a
        # tiny jitted fn — per step only the index vector (and flip flags)
        # crosses the host->device link, ~300 bytes instead of MBs. 'auto'
        # engages when the dataset exposes bit-exact uint8 storage
        # (raw_array) that fits the budget; 'force' raises if it can't.
        if device_cache is True:
            device_cache = "force"
        elif device_cache is False:
            device_cache = "off"
        if device_cache not in ("off", "auto", "force"):
            raise ValueError(f"device_cache: {device_cache!r}")
        self.device_cache = device_cache
        self.device_cache_budget_mb = device_cache_budget_mb
        # yield_refs: when the cache is active, yield CachedBatch references
        # instead of dispatching a separate jitted gather per batch. A
        # CachedBatch-aware consumer (the solvers) folds the gather into the
        # train step's own XLA program: one dispatch per step total. Opt-in
        # because plain consumers expect materialized arrays.
        self.yield_refs = yield_refs
        self._cache = None          # device-resident uint8 [N, H, W, C]
        self._cache_ready = False
        self._rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self) -> int:
        n = len(self.dataset)
        per_epoch = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        return per_epoch // self.stack_steps if self.stack_steps > 1 else per_epoch

    def _index_batches(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        chunk = self.batch_size * self.stack_steps
        if self.stack_steps > 1:
            stop = (n // chunk) * chunk  # scan groups need full chunks
        else:
            stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for start in range(0, stop, chunk):
            yield order[start : start + chunk]

    def _gather(self, idx: np.ndarray) -> np.ndarray:
        if self._want_raw:
            raw_fn = getattr(self.dataset, "get_batch_raw", None)
            raw = raw_fn(idx) if raw_fn is not None else None
            if raw is not None:
                return raw  # uint8; the jitted step normalizes on-device
            if self.transfer_dtype == "uint8":
                raise ValueError(
                    "transfer_dtype='uint8' but the dataset has no exact "
                    "uint8 path (get_batch_raw returned None)"
                )
            self._want_raw = False  # 'auto': settle on the float path
        if hasattr(self.dataset, "get_batch"):
            imgs = self.dataset.get_batch(idx)
        else:
            imgs = np.stack([self.dataset[i][0] for i in idx], axis=0)
        if self.pre_process is not None:
            imgs = self.pre_process(imgs)
        return imgs

    def _make_batch(self, idx: np.ndarray):
        multihost = self.sharding is not None and jax.process_count() > 1
        if multihost:
            # Multi-host: every process iterates the same global index order
            # (same seed), gathers/decodes ONLY its own contiguous row block
            # (per scan step), and assembles the global data-sharded array
            # from the local rows. Device order in make_mesh groups by
            # process, so the block layout matches. pre_process runs on the
            # local rows only — it is a per-sample map (the reference's
            # batch_to_device contract, dataset.py:16-27).
            from intro_tc_vae_tpu.parallel.distributed import local_batch_slice

            sl = local_batch_slice(self.batch_size)
            if self.stack_steps > 1:
                local_idx = idx.reshape(self.stack_steps, self.batch_size)[:, sl]
                local = self._gather(local_idx.ravel())
                local = local.reshape(self.stack_steps, -1, *local.shape[1:])
                gshape = (self.stack_steps, self.batch_size, *local.shape[2:])
            else:
                local = self._gather(idx[sl])
                gshape = (self.batch_size, *local.shape[1:])
            batch = jax.make_array_from_process_local_data(
                self.sharding, local, gshape
            )
        else:
            imgs = self._gather(idx)
            if self.stack_steps > 1:  # [K*B, ...] -> [K, B, ...] for lax.scan
                imgs = imgs.reshape(self.stack_steps, self.batch_size, *imgs.shape[1:])
            batch = jax.device_put(imgs, self.sharding)
        if self.include_labels:
            return batch, self._labels_for(idx)
        return batch

    def _labels_for(self, idx: np.ndarray) -> np.ndarray:
        ds = self.dataset
        if hasattr(ds, "latents_values"):
            return np.stack([ds.latents_values[i] for i in idx], axis=0)
        if hasattr(ds, "entries"):
            # label-only accessor: never decode images just for labels
            # (UkiyoE entries are (filename, label_code) tuples)
            return np.asarray([ds.entries[int(i)][1] for i in idx])
        return np.stack([ds[i][1] for i in idx], axis=0)

    # ----- device-resident cache path -----

    def _setup_cache(self) -> bool:
        """Try to place the full dataset in device memory. Returns True when
        the cache path is active; 'force' raises on any ineligibility."""
        if self._cache_ready:
            return self._cache is not None
        self._cache_ready = True
        if self.device_cache == "off":
            return False

        def fail(why: str) -> bool:
            if self.device_cache == "force":
                raise ValueError(f"device_cache='force' but {why}")
            return False

        if jax.process_count() > 1:
            # Multi-host would need a process-replicated global array and a
            # globally-consistent index stream; the transfer path already
            # gathers only local rows there. Keep cache single-process.
            return fail("multi-host run (use the uint8 transfer path)")
        raw = getattr(self.dataset, "raw_array", lambda: None)()
        if raw is None:
            return fail("dataset has no bit-exact uint8 storage (raw_array)")
        budget = self.device_cache_budget_mb * (1 << 20)
        if raw.nbytes > budget:
            return fail(
                f"dataset is {raw.nbytes / 1e6:.0f} MB > "
                f"device_cache_budget_mb={self.device_cache_budget_mb}"
            )
        if self.device_cache == "auto":
            # Leave headroom for params/activations: in auto mode only cache
            # when the array fits in half the device's currently-free HBM
            # (memory_stats is absent on some backends — budget-only there).
            dev = jax.devices()[0]
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            free = stats.get("bytes_limit", 0) - stats.get("bytes_in_use", 0)
            if free > 0 and raw.nbytes > free // 2:
                return fail("dataset exceeds half the free device memory")

        from jax.sharding import NamedSharding, PartitionSpec

        mesh = getattr(self.sharding, "mesh", None)
        replicated = NamedSharding(mesh, PartitionSpec()) if mesh is not None else None
        self._cache = jax.device_put(raw, replicated)
        print(f"device cache: {raw.nbytes / 1e6:.0f} MB dataset resident "
              f"in device memory ({len(self.dataset):,} rows)")

        K, B = self.stack_steps, self.batch_size
        out_sharding = self.sharding

        def gather(cache, idx, flags):
            x = jnp.take(cache, idx, axis=0)  # [K*B, H, W, C] uint8
            if flags is not None:  # trace-time branch: one variant per form
                x = jnp.where(flags[:, None, None, None] != 0,
                              x[:, :, ::-1, :], x)
            if K > 1:
                x = x.reshape(K, B, *x.shape[1:])
            # GSPMD partitions the gather so each device reads only its
            # batch rows from its own replica — no cross-device traffic.
            return x

        self._gather_jit = (
            jax.jit(gather, out_shardings=out_sharding)
            if out_sharding is not None else jax.jit(gather)
        )
        return True

    def _make_cached_batch(self, idx: np.ndarray):
        flags = getattr(self.dataset, "flip_flags", lambda n: None)(len(idx))
        flags = None if flags is None else np.asarray(flags, np.uint8)
        if self.yield_refs:
            # by-reference: the CachedBatch pytree rides into the solver's
            # jitted step, which gathers at trace time (gather_cached) —
            # no separate gather dispatch exists at all.
            batch = CachedBatch(self._cache, np.asarray(idx, np.int32), flags)
        else:
            batch = self._gather_jit(
                self._cache, np.asarray(idx, np.int32), flags
            )
        if self.include_labels:
            return batch, self._labels_for(idx)
        return batch

    def __iter__(self) -> Iterator:
        self._epoch += 1
        if self._setup_cache():
            # No prefetch thread: the jitted gather dispatch is async and
            # costs ~300 host-side bytes per step — there is nothing left
            # to overlap.
            for idx in self._index_batches():
                yield self._make_cached_batch(idx)
            return
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err_holder = []

        def producer():
            try:
                for idx in self._index_batches():
                    q.put(self._make_batch(idx))
            except Exception as e:  # surfaced on the consumer side
                err_holder.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                if err_holder:
                    raise err_holder[0]
                return
            yield item


class WrappedDataLoader:
    """API-parity shim (reference dataset.py:16-27): maps every batch of an
    inner iterable through ``pre_process``."""

    def __init__(self, data_loader, pre_process: Callable):
        self.dl = data_loader
        self.func = pre_process

    def __len__(self):
        return len(self.dl)

    def __iter__(self):
        for b in self.dl:
            if isinstance(b, tuple):
                yield self.func(*b)
            else:
                yield self.func(b)
