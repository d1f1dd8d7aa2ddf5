"""Host input-pipeline throughput benchmark (VERDICT r1 Weak #5).

Measures how fast the host side can assemble flagship-shaped batches —
the rate that must exceed the device's step rate (~2.3k img/s at 64x64)
for the TPU to never starve. Covers:

* ukiyo cached     — decoded-uint8 cache + native gather/resize/flip
                     (the default UkiyoE path after the first epoch)
* ukiyo uncached   — thread-pool per-image PIL decode (first epoch /
                     cache=False), vs the reference's 2 DataLoader
                     worker processes (reference train.py:146-151)
* synthetic        — procedural render (bench.py's data source)

Usage:
    python analysis/bench_loader.py [--data-root DIR] [--batch 64]
                                    [--image-size 64] [--seconds 5]

Without --data-root pointing at a real ARC corpus it falls back to the
bundled 5-image fixture (tests/test_data), replicating the index space so
batches still hit the full decode/gather path.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # runnable as `python analysis/bench_loader.py`
    sys.path.insert(0, REPO)


def measure(get_batch, n_items: int, batch: int, seconds: float, seed=0) -> float:
    """Pump batches for `seconds`, return images/sec."""
    rng = np.random.RandomState(seed)
    # warmup (builds caches, faults pages)
    get_batch(rng.randint(0, n_items, size=batch))
    t0 = time.perf_counter()
    done = 0
    while time.perf_counter() - t0 < seconds:
        get_batch(rng.randint(0, n_items, size=batch))
        done += batch
    return done / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default=os.path.join(REPO, "tests", "test_data"))
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--image-size", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=5.0)
    a = ap.parse_args()

    from intro_tc_vae_tpu.data import Synthetic, UkiyoE

    results = {}

    for name, cache in (("ukiyo_cached", True), ("ukiyo_uncached", False)):
        ds = UkiyoE.load_data(resize=a.image_size, data_root=a.data_root,
                              cache=cache)
        n = len(ds)
        results[name] = round(
            measure(ds.get_batch, n, a.batch, a.seconds), 1
        )

    syn = Synthetic(image_size=a.image_size, cdim=3)
    results["synthetic"] = round(
        measure(syn.get_batch, len(syn), a.batch, a.seconds), 1
    )

    from intro_tc_vae_tpu.runtime import native_available as available

    print(json.dumps({
        "metric": "loader_images_per_sec",
        "unit": "img/s",
        "batch": a.batch,
        "image_size": a.image_size,
        "native_data_core": available(),
        **results,
    }))


if __name__ == "__main__":
    main()
