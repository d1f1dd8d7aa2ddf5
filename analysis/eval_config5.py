"""BASELINE config 5: FID + disentanglement eval at 128x128 (intro_tc).

Trains the configs/intro_tc_128_dp8.json recipe briefly and reports:
* FID between real images and prior samples — standard InceptionV3-pool3
  FID when pretrained weights are available locally (models/inception.py,
  gated: this build env has no egress), encoder-FID otherwise,
* the four disentanglement score families (beta-VAE, DCI, MIG, Mod/Expl).

The ARC Ukiyo-E corpus is not present in this environment, so the default
dataset is synthetic128 (same 128px shapes, factor-structured so the
disentanglement metrics are defined); pass --dataset ukiyo_e128
--data-root ... on a machine with the corpus.

Usage:
    python analysis/eval_config5.py --steps 300 [--dataset synthetic128]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--dataset", default="synthetic128")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-samples", type=int, default=640,
                    help="images per side for FID / metric sample count")
    ap.add_argument("--out", default="/tmp/eval_config5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from intro_tc_vae_tpu.data import load_dataset
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver
    from intro_tc_vae_tpu.solvers.base import decode

    with open(os.path.join(_REPO, "configs", "intro_tc_128_dp8.json")) as f:
        cfg = json.load(f)

    dataset, image_size, channels, cdim = load_dataset(
        args.dataset, data_root=args.data_root
    )
    dtype = jnp.bfloat16 if (cfg.get("precision") == "bf16"
                             and jax.devices()[0].platform == "tpu") else None
    kwargs = dict(cdim=cdim, zdim=cfg["z_dim"], channels=tuple(channels),
                  image_size=image_size, dtype=dtype)
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
    )

    rng = np.random.RandomState(0)
    n = len(dataset)
    batch0 = jnp.asarray(dataset.get_batch(rng.randint(n, size=args.batch)))
    state = solver.init_state(jax.random.key(0), batch0)
    for i in range(args.steps):
        x = jnp.asarray(dataset.get_batch(rng.randint(n, size=args.batch)))
        state, metrics = solver._step_fn(state, x)
        if (i + 1) % 50 == 0:
            print(f"step {i+1}/{args.steps} lossE={float(metrics['loss_enc']):.4f} "
                  f"lossD={float(metrics['loss_dec']):.4f} "
                  f"rec={float(metrics['loss_rec']):.1f}")
    assert np.isfinite(float(metrics["loss_enc"]))

    # ----- FID: real vs prior samples -----
    from intro_tc_vae_tpu.evaluation.fid import encoder_fid, standard_fid

    real = dataset.get_batch(rng.randint(n, size=args.num_samples))
    fakes = []
    sample_key = jax.random.key(7)
    for start in range(0, args.num_samples, args.batch):
        sample_key, k = jax.random.split(sample_key)
        noise = jax.random.normal(k, (args.batch, cfg["z_dim"]))
        img, _ = decode(solver.decoder, state.params["decoder"],
                        state.batch_stats["decoder"], noise, train=False)
        fakes.append(np.asarray(img))
    fake = np.concatenate(fakes)[: args.num_samples]

    results = {"config": "intro_tc_128_dp8 (BASELINE config 5)",
               "dataset": args.dataset, "steps": args.steps,
               "final_loss_rec": round(float(metrics["loss_rec"]), 2)}
    fid_std = standard_fid(real, fake, batch_size=args.batch)
    if fid_std is not None:
        results["fid_inception_pool3"] = round(fid_std, 3)
    else:
        results["fid_inception_pool3"] = (
            "unavailable offline (no pretrained weights; set "
            "ITCVAE_INCEPTION_WEIGHTS)"
        )
    results["fid_encoder_features"] = round(
        encoder_fid(solver, state, real, fake, batch_size=args.batch), 3
    )

    # ----- disentanglement scores -----
    if solver.latent_generator is not None:
        from intro_tc_vae_tpu.evaluation import metrics as em

        encode_fn = solver.make_eval_encoder(state)
        kw = dict(latent_generator=solver.latent_generator, encode_fn=encode_fn,
                  num_samples=min(args.num_samples, n // 2),
                  batch_size=args.batch)
        bvae, bvae_scaled = em.compute_bvae_score(**kw)
        info, compl, disent = em.compute_dci_score(**kw)
        mig = em.compute_mig_score(**kw)
        mod, expl = em.compute_mod_expl_score(**kw)
        results.update(
            bvae_score=round(bvae, 4), bvae_score_scaled=round(bvae_scaled, 4),
            dci_informativeness=round(info, 4),
            dci_completeness=round(compl, 4),
            dci_disentanglement=round(disent, 4),
            mig_score=round(float(mig), 4),
            modularity=round(float(mod), 4), explicitness=round(float(expl), 4),
        )

    print(json.dumps(results, indent=2))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
