"""Benchmark: images/sec/chip on the flagship intro_tc recipe.

Runs the full two-phase Intro-TC train step (ukiyo_e64 shapes: 64x64x3,
z_dim 128, conv channels [64,128,256,512], batch 64 — reference
README.md:24-26 flagship command) on synthetic data resident on device,
and prints ONE JSON line:

    {"metric": "images_per_sec_per_chip", "value": N, "unit": "img/s",
     "vs_baseline": N / 20000}

vs_baseline is against the BASELINE.json north-star of >=20k img/s/chip.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 64
IMAGE_SIZE = 64
ZDIM = 128
CHANNELS = (64, 128, 256, 512)
WARMUP = 3
ITERS = 30
NORTH_STAR = 20000.0


def main():
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    precision = "bf16" if jax.devices()[0].platform == "tpu" else "fp32"
    dtype = jnp.bfloat16 if precision == "bf16" else None

    dataset = Synthetic(image_size=IMAGE_SIZE, cdim=3, sizes=(4, 5, 8, 8))
    kwargs = dict(cdim=3, zdim=ZDIM, channels=CHANNELS, image_size=IMAGE_SIZE,
                  dtype=dtype)
    solver = make_solver(
        "intro_tc",
        dataset=dataset,
        encoder=Encoder(arch="conv", **kwargs),
        decoder=Decoder(arch="conv", **kwargs),
        batch_size=BATCH,
        optimizer_e=make_optimizer("adam", 2e-4),
        optimizer_d=make_optimizer("adam", 2e-4),
        beta_kl=0.5,
        beta_rec=0.75,
        beta_neg=512.0,
        gamma_r=1e-8,
    )

    batch = jnp.asarray(dataset.get_batch(np.arange(BATCH) % len(dataset)))
    state = solver.init_state(jax.random.key(0), batch)

    # warmup / compile
    for _ in range(WARMUP):
        state, metrics = solver._step_fn(state, batch)
    jax.block_until_ready(metrics["loss_enc"])

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = solver._step_fn(state, batch)
    jax.block_until_ready(metrics["loss_enc"])
    dt = time.perf_counter() - t0

    assert bool(jnp.isfinite(metrics["loss_enc"])), "non-finite loss in bench"
    imgs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "images_per_sec_per_chip",
        "value": round(imgs_per_sec, 1),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / NORTH_STAR, 4),
    }))


if __name__ == "__main__":
    main()
