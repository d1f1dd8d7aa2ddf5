"""Run comparison (RunVis.ipynb equivalent, reference component #15).

Reads TensorBoard runs via utils.tb_reader and plots loss/metric curves
across runs (e.g. beta_rec sweeps), plus the final logged reconstructions.

Usage:
    python analysis/run_vis.py --run-dir runs --out /tmp/runvis
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # runnable as `python analysis/<script>.py`
    sys.path.insert(0, _REPO)

import argparse
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader


CURVES = [
    ("r_loss_scaled", "reconstruction loss (scaled)"),
    ("kl_loss_scaled", "KL loss (scaled)"),
    ("loss_e", "lossE"),
    ("loss_d", "lossD"),
    ("diff_kl", "diff_kl"),
    ("mig_score", "MIG"),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run-dir", default="runs")
    ap.add_argument("--out", default="/tmp/runvis")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    runs = [p.name for p in Path(args.run_dir).iterdir() if p.is_dir()]
    if not runs:
        print(f"no runs found under {args.run_dir}")
        return
    readers = {r: TensorboardReader(args.run_dir, r) for r in sorted(runs)}

    for attr, title in CURVES:
        fig, ax = plt.subplots(figsize=(8, 4))
        plotted = False
        for name, reader in readers.items():
            try:
                df = getattr(reader, attr)
                ax.plot(df["step"], df["value"], label=name[:60], lw=1)
                plotted = True
            except Exception:
                continue
        if not plotted:
            plt.close(fig)
            continue
        ax.set_title(title)
        ax.set_xlabel("step")
        ax.legend(fontsize=6)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, f"{attr}.png"), dpi=120)
        plt.close(fig)

    for name, reader in readers.items():
        try:
            img = reader.last_reconstruction
            img.save(os.path.join(args.out, f"recon_{name[:40]}.png"))
        except Exception:
            continue

    print("wrote run comparisons to", args.out)


if __name__ == "__main__":
    main()
