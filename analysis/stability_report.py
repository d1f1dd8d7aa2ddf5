"""Long-horizon stability report for a training run, via the TB log.

Reads a finished run's TensorBoard events through our own
``TensorboardReader`` (dogfooding CLI -> train loop -> TB -> tb_reader),
checks every logged loss is finite over the whole horizon, and writes a
loss-curve figure + JSON summary. Used for the flagship-recipe stress
run (intro_tc, beta_neg=512, bf16 — the expELBO `exp(-2*scale*(...))`
regime the reference hits in solvers/intro.py:102-108).

Usage:
    python analysis/stability_report.py \
        --run-dir /tmp/stab --run-pattern intro_tc \
        --out docs/stability_intro_tc
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # runnable as `python analysis/<script>.py`
    sys.path.insert(0, _REPO)

import argparse
import json

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", required=True,
                    help="directory containing the runs_* folder(s)")
    ap.add_argument("--run-pattern", default="intro_tc",
                    help="substring/regex matching the run folder name")
    ap.add_argument("--out", default="/tmp/stability_report")
    args = ap.parse_args()

    from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

    run = TensorboardReader.match_name(args.run_dir, args.run_pattern,
                                       regex=True)
    reader = TensorboardReader(args.run_dir, run)
    assert reader.exists, f"no events under {args.run_dir}/{run}"

    curves = {
        "lossE": reader.loss_e,
        "lossD": reader.loss_d,
        "rec (unscaled)": reader.r_loss,
        "kl (unscaled)": reader.kl_loss,
        "expelbo_f": reader.expelbo_f_loss_scaled,
        "diff_kl": reader.diff_kl,
    }

    summary, bad = {}, []
    for name, df in curves.items():
        v = np.asarray(df["value"], dtype=np.float64)
        finite = bool(np.isfinite(v).all())
        if not finite:
            bad.append(name)
        summary[name] = {
            "steps": int(len(v)),
            "finite": finite,
            "first": float(v[0]),
            "final": float(v[-1]),
            "min": float(np.nanmin(v)),
            "max": float(np.nanmax(v)),
        }

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(2, 3, figsize=(15, 7))
    for ax, (name, df) in zip(axes.flat, curves.items()):
        steps = np.asarray(df["step"])
        v = np.asarray(df["value"], dtype=np.float64)
        ax.plot(steps, v, lw=0.6, alpha=0.5)
        if len(v) > 20:  # running mean for readability
            k = max(5, len(v) // 100)
            sm = np.convolve(v, np.ones(k) / k, mode="valid")
            ax.plot(steps[k - 1:], sm, lw=1.5)
        ax.set_title(name)
        ax.set_xlabel("step")
        if np.nanmin(v) > 0 and np.nanmax(v) / max(np.nanmin(v), 1e-12) > 1e3:
            ax.set_yscale("log")
    fig.suptitle(f"run: {run}")
    fig.tight_layout()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    fig.savefig(args.out + ".png", dpi=110)
    with open(args.out + ".json", "w") as f:
        json.dump({"run": run, "curves": summary}, f, indent=2)

    print(json.dumps({k: {"final": s["final"], "finite": s["finite"],
                          "steps": s["steps"]}
                      for k, s in summary.items()}, indent=2))
    if bad:
        print(f"NON-FINITE values in: {bad}")
        sys.exit(1)
    print(f"all curves finite; wrote {args.out}.png / .json")


if __name__ == "__main__":
    main()
