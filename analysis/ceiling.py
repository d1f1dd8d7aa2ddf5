"""Speed-of-light calibration per BASELINE config (VERDICT r2 next #9).

For each (solver, image_size, batch) recipe: compile the real train step,
read XLA's `compiled.cost_analysis()` FLOP count, and derive the
per-image cost and the hardware ceiling img/s against the chip's
measured sustained bf16 matmul rate (146.5 TFLOP/s on this v5e chip —
BENCHMARKS.md calibration table). Pair the ceilings with measured
throughput (bench.py) to get "% of speed-of-light" per config.

Usage:
    python analysis/ceiling.py [--measure]   # --measure also times each config
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SUSTAINED_TFLOPS = 146.5  # measured: 20 chained 8192^3 bf16 matmuls

# BASELINE.json configs mapped to step recipes (reference README.md:24-26
# flagship + the 128/256px variants; vae/tc single-phase solvers)
CONFIGS = [
    ("intro_tc", 64, 64),    # flagship (config 3/4)
    ("intro_tc", 128, 64),   # config 5 shapes
    ("intro_tc", 256, 32),   # ukiyo_e256 shapes (reference default batch)
    ("intro_tc", 256, 64),   # ukiyo_e256 at the chip's memory frontier:
    #                          batch 32 underfills the MXU (48% of ceiling);
    #                          batch 64 reaches the 68% emitter-bound
    #                          plateau every other config sits at
    ("vae", 64, 64),         # config 1-family single-phase
    ("tc", 64, 64),          # config 2-family
]


def step_flops(solver_name: str, image_size: int, batch: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    channels = {64: (64, 128, 256, 512), 128: (64, 128, 256, 512, 512),
                256: (64, 128, 256, 512, 512, 512)}[image_size]
    precision_bf16 = jax.devices()[0].platform == "tpu"
    dtype = jnp.bfloat16 if precision_bf16 else None
    ds = Synthetic(image_size=image_size, cdim=3, sizes=(4, 5, 8, 8))
    kw = dict(cdim=3, zdim=128, channels=channels, image_size=image_size,
              dtype=dtype)
    solver = make_solver(
        solver_name, dataset=ds,
        encoder=Encoder(arch="conv", **kw), decoder=Decoder(arch="conv", **kw),
        batch_size=batch,
        optimizer_e=make_optimizer("adam", 2e-4),
        optimizer_d=make_optimizer("adam", 2e-4),
        beta_kl=0.5, beta_rec=0.75, beta_neg=512.0,
    )
    x = jnp.zeros((batch, image_size, image_size, 3), jnp.float32)
    state = solver.init_state(jax.random.key(0), x)
    compiled = solver._step_fn.lower(state, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--measure", action="store_true",
                    help="also measure throughput via bench.main per config")
    args = ap.parse_args()

    rows = []
    for solver_name, image_size, batch in CONFIGS:
        flops = step_flops(solver_name, image_size, batch)
        gflop_img = flops / batch / 1e9
        ceiling = SUSTAINED_TFLOPS * 1e3 / gflop_img  # img/s
        row = dict(solver=solver_name, image_size=image_size, batch=batch,
                   gflop_per_image=round(gflop_img, 1),
                   ceiling_img_s=round(ceiling, 0))
        if args.measure:
            import bench

            row["measured_img_s"] = round(
                bench.main(batch=batch, image_size=image_size,
                           solver_name=solver_name, emit=False), 1)
            row["pct_of_ceiling"] = round(
                100.0 * row["measured_img_s"] / ceiling, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
