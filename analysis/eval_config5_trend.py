"""BASELINE config 5 metric TRENDS over a training horizon (VERDICT r3 #2).

The reference logs disentanglement scores every ``test_iter`` *throughout*
training (/root/reference/solvers/vae.py:188-213) — the point of those
metrics is their trajectory, not a single snapshot. This harness trains the
configs/intro_tc_128_dp8.json recipe on synthetic128 for --steps steps and
evaluates at ~6 checkpoints:

* the four disentanglement families (beta-VAE, DCI, MIG, Mod/Expl),
* FID between real images and prior samples, measured in a FIXED feature
  space: prior samples are collected at every checkpoint but embedded with
  the FINAL encoder (a moving encoder would make per-checkpoint FIDs
  incomparable). Standard Inception-pool3 FID is used instead when
  pretrained weights are available (ITCVAE_INCEPTION_WEIGHTS).

Writes docs/eval_config5_trend.json and docs/eval_config5_trend.png.

Usage:
    python analysis/eval_config5_trend.py --steps 10000 --eval-points 6
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--eval-points", type=int, default=6,
                    help="number of eval checkpoints after step 0")
    ap.add_argument("--dataset", default="synthetic128")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--scan", type=int, default=10,
                    help="train steps fused per dispatch (lax.scan). "
                    "Individual dispatches leak ~15 MB of host RSS each "
                    "through the axon tunnel client; a 10k-step run at "
                    "--scan 1 hard-hung at ~74 GB RSS mid-training")
    ap.add_argument("--num-samples", type=int, default=640)
    ap.add_argument("--out", default=os.path.join(_REPO, "docs",
                                                  "eval_config5_trend"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from intro_tc_vae_tpu.data import load_dataset
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver
    from intro_tc_vae_tpu.solvers.base import decode
    from intro_tc_vae_tpu.evaluation import metrics as em
    from intro_tc_vae_tpu.evaluation.fid import frechet_distance, standard_fid

    with open(os.path.join(_REPO, "configs", "intro_tc_128_dp8.json")) as f:
        cfg = json.load(f)

    dataset, image_size, channels, cdim = load_dataset(
        args.dataset, data_root=args.data_root
    )
    dtype = jnp.bfloat16 if (cfg.get("precision") == "bf16"
                             and jax.devices()[0].platform == "tpu") else None
    kwargs = dict(cdim=cdim, zdim=cfg["z_dim"], channels=tuple(channels),
                  image_size=image_size, dtype=dtype)
    # clamp the fused-step width to the eval spacing so tiny smoke-test
    # horizons still hit their exact eval checkpoints
    scan_k = max(1, min(args.scan,
                        args.steps // max(1, args.eval_points) or 1))
    solver = make_solver(
        cfg["solver"],
        dataset=dataset,
        encoder=Encoder(arch=cfg["arch"], **kwargs),
        decoder=Decoder(arch=cfg["arch"], **kwargs),
        batch_size=args.batch,
        optimizer_e=make_optimizer("adam", cfg["lr"]),
        optimizer_d=make_optimizer("adam", cfg["lr"]),
        beta_kl=cfg["beta_kl"], beta_rec=cfg["beta_rec"],
        beta_neg=cfg["beta_neg"], gamma_r=cfg["gamma_r"],
        scan_steps=scan_k,
    )

    rng = np.random.RandomState(0)
    n = len(dataset)
    batch0 = jnp.asarray(dataset.get_batch(rng.randint(n, size=args.batch)))
    state = solver.init_state(jax.random.key(0), batch0)

    eval_at = sorted({round(args.steps * i / args.eval_points)
                      for i in range(args.eval_points + 1)})
    print(f"eval checkpoints: {eval_at}")

    def sample_prior(num, seed):
        """Prior samples decoded with the CURRENT decoder (eval-mode BN)."""
        key = jax.random.key(seed)
        out = []
        for _ in range(0, num, args.batch):
            key, k = jax.random.split(key)
            noise = jax.random.normal(k, (args.batch, cfg["z_dim"]))
            img, _ = decode(solver.decoder, state.params["decoder"],
                            state.batch_stats["decoder"], noise, train=False)
            out.append(np.asarray(img))
        return np.concatenate(out)[:num]

    def disentanglement(point):
        encode_fn = solver.make_eval_encoder(state)
        kw = dict(latent_generator=solver.latent_generator, encode_fn=encode_fn,
                  num_samples=min(args.num_samples, n // 2),
                  batch_size=args.batch)
        bvae, bvae_scaled = em.compute_bvae_score(**kw)
        info, compl, disent = em.compute_dci_score(**kw)
        mig = em.compute_mig_score(**kw)
        mod, expl = em.compute_mod_expl_score(**kw)
        point.update(
            bvae_score=round(bvae, 4), bvae_score_scaled=round(bvae_scaled, 4),
            dci_informativeness=round(info, 4),
            dci_completeness=round(compl, 4),
            dci_disentanglement=round(disent, 4),
            mig_score=round(float(mig), 4),
            modularity=round(float(mod), 4), explicitness=round(float(expl), 4),
        )

    real = dataset.get_batch(rng.randint(n, size=args.num_samples))
    points, fakes_per_point = [], []
    metrics = None
    k = scan_k
    step = 0
    next_print = 500
    t0 = time.time()

    def _last(m, key):
        """Scalar of the LAST inner step from the stacked [k] metric tree
        (k=1 trees are unstacked scalars)."""
        v = np.asarray(m[key])
        return float(v[-1]) if v.ndim else float(v)

    for target in eval_at:
        while step < target:
            x = jnp.asarray(np.stack([
                dataset.get_batch(rng.randint(n, size=args.batch))
                for _ in range(k)
            ])) if k > 1 else jnp.asarray(
                dataset.get_batch(rng.randint(n, size=args.batch)))
            state, metrics = solver._step_fn(state, x)
            step += k
            if step >= next_print:
                next_print += 500
                print(f"step {step}/{args.steps} "
                      f"lossE={_last(metrics, 'loss_enc'):.4f} "
                      f"rec={_last(metrics, 'loss_rec'):.1f} "
                      f"[{time.time()-t0:.0f}s]")
        point = {"step": step}
        if metrics is not None:
            assert np.isfinite(_last(metrics, "loss_enc"))
            point["loss_rec"] = round(_last(metrics, "loss_rec"), 2)
            point["loss_enc"] = round(_last(metrics, "loss_enc"), 4)
        te = time.time()
        fakes_per_point.append(sample_prior(args.num_samples, seed=1000 + step))
        disentanglement(point)
        point["eval_seconds"] = round(time.time() - te, 1)
        points.append(point)
        print(f"eval @ {step}: " + json.dumps(
            {kk: v for kk, v in point.items() if kk != "step"}))
        # crash insurance: a 40+-minute run must not lose everything to
        # a late failure — FID fields are appended by the final pass
        with open(args.out + ".partial.json", "w") as f:
            json.dump({"points": points, "through_step": step}, f, indent=2)

    # FID per checkpoint in the FINAL encoder's fixed feature space
    # (mu embeddings, eval-mode BN), so the trajectory is comparable.
    from intro_tc_vae_tpu.evaluation.fid import encoder_features

    feats_real = encoder_features(solver, state, real, batch_size=args.batch)
    mu_r, cov_r = (feats_real.mean(0),
                   np.cov(feats_real, rowvar=False))
    for point, fake in zip(points, fakes_per_point):
        fid_std = standard_fid(real, fake, batch_size=args.batch)
        if fid_std is not None:
            point["fid_inception_pool3"] = round(fid_std, 3)
        f = encoder_features(solver, state, fake, batch_size=args.batch)
        point["fid_final_encoder"] = round(
            frechet_distance(mu_r, cov_r, f.mean(0),
                             np.cov(f, rowvar=False)), 3)

    results = {
        "config": "intro_tc_128_dp8 (BASELINE config 5)",
        "dataset": args.dataset, "steps": args.steps,
        "num_samples": args.num_samples,
        "fid_note": "fid_final_encoder embeds every checkpoint's prior "
                    "samples with the FINAL encoder (fixed feature space)",
        "points": points,
        "total_seconds": round(time.time() - t0, 1),
    }
    with open(args.out + ".json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))

    # ----- trajectory plot -----
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    steps_x = [p["step"] for p in points]
    fig, axes = plt.subplots(2, 3, figsize=(14, 7))
    panels = [
        ("fid_final_encoder", "FID (final-encoder features)", False),
        ("loss_rec", "reconstruction loss", False),
        ("bvae_score", "beta-VAE score", True),
        ("dci_disentanglement", "DCI disentanglement", True),
        ("mig_score", "MIG", True),
        ("modularity", "modularity", True),
    ]
    extra = {"dci_disentanglement": [("dci_completeness", "completeness")],
             "modularity": [("explicitness", "explicitness")]}
    for ax, (key, title, up) in zip(axes.ravel(), panels):
        ys = [p.get(key) for p in points]
        if all(y is None for y in ys):
            ax.set_visible(False)
            continue
        ax.plot(steps_x, ys, "o-", label=key)
        for k2, lbl in extra.get(key, []):
            ax.plot(steps_x, [p.get(k2) for p in points], "s--", label=lbl)
            ax.legend(fontsize=8)
        ax.set_title(title + (" (higher=better)" if up else " (lower=better)"))
        ax.set_xlabel("train step")
        ax.grid(alpha=0.3)
    fig.suptitle(f"config 5 (intro_tc 128px) metric trends — {args.dataset}, "
                 f"{args.steps} steps, b{args.batch}")
    fig.tight_layout()
    fig.savefig(args.out + ".png", dpi=110)
    print(f"wrote {args.out}.json / .png")


if __name__ == "__main__":
    main()
