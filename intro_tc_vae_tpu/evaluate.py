"""Evaluation CLI: score a trained checkpoint without retraining.

    itcvae-eval --checkpoint saves/<...> --dataset dsprites --arch conv \
        --z-dim 128 [--num-samples 10000] [--fid] [--out scores.json]

The checkpoint-evaluation surface of the framework (the reference scores
models through its notebooks — ModelVis.ipynb + the write_* families
driven from training, solvers/vae.py:188-213; this makes the same four
disentanglement metric families, and optionally FID between real images
and prior samples, a one-command operation on any saved checkpoint).
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description="evaluate a trained checkpoint")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default="synthetic",
                    help="dataset name (fixes image size/channels; "
                         "factor-structured datasets enable the "
                         "disentanglement metrics)")
    ap.add_argument("--arch", default="res")
    ap.add_argument("--z-dim", type=int, default=32)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--num-samples", type=int, default=10000,
                    help="sample count per metric split (capped at half "
                         "the dataset)")
    ap.add_argument("--fid", action="store_true",
                    help="also compute FID (real vs prior samples): "
                         "standard InceptionV3-pool3 when "
                         "ITCVAE_INCEPTION_WEIGHTS is set, plus "
                         "encoder-feature FID")
    ap.add_argument("--fid-samples", type=int, default=640)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--pack", type=int, default=0,
                    help="run the predict conv output-packed NxN for sample "
                         "decoding (weight-compatible; ~2x decode on TPU — "
                         "BENCHMARKS.md serving table)")
    ap.add_argument("--out", default=None, help="optional JSON output path")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from intro_tc_vae_tpu.data import load_dataset
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver
    from intro_tc_vae_tpu.utils import load_model

    dataset, image_size, channels, cdim = load_dataset(args.dataset, args.data_root)
    kwargs = dict(cdim=cdim, zdim=args.z_dim, channels=tuple(channels),
                  image_size=image_size)
    solver = make_solver(
        "vae", dataset=dataset,
        encoder=Encoder(arch=args.arch, **kwargs),
        decoder=Decoder(arch=args.arch, pack_predict=args.pack, **kwargs),
        batch_size=args.batch,
        optimizer_e=make_optimizer("adam", 1e-3),
        optimizer_d=make_optimizer("adam", 1e-3),
    )
    state = solver.init_state(
        jax.random.key(0), jnp.zeros((1, image_size, image_size, cdim))
    )
    state = load_model(state, args.checkpoint)

    results: dict = {"checkpoint": args.checkpoint, "dataset": args.dataset}
    num_samples = min(args.num_samples, len(dataset) // 2)

    if solver.latent_generator is not None:
        from intro_tc_vae_tpu.evaluation import metrics as em

        kw = dict(
            latent_generator=solver.latent_generator,
            encode_fn=solver.make_eval_encoder(state),
            num_samples=num_samples,
            batch_size=args.batch,
        )
        scorers = {
            "bvae": lambda: dict(zip(
                ("bvae_score", "bvae_score_scaled"), em.compute_bvae_score(**kw))),
            "dci": lambda: dict(zip(
                ("dci_informativeness", "dci_completeness", "dci_disentanglement"),
                em.compute_dci_score(**kw))),
            "mig": lambda: {"mig_score": em.compute_mig_score(**kw)},
            "mod_expl": lambda: dict(zip(
                ("modularity_score", "explicitness_score"),
                em.compute_mod_expl_score(**kw))),
        }
        for name, fn in scorers.items():
            try:
                results.update({k: round(float(v), 4) for k, v in fn().items()})
            except Exception as e:  # degenerate draws must not kill the rest
                results[f"{name}_error"] = str(e)
    else:
        results["disentanglement"] = (
            f"skipped: dataset '{args.dataset}' has no ground-truth factors"
        )

    if args.fid:
        from intro_tc_vae_tpu.evaluation.fid import encoder_fid, standard_fid
        from intro_tc_vae_tpu.solvers.base import decode

        rng = np.random.RandomState(args.seed)
        real = dataset.get_batch(rng.randint(len(dataset), size=args.fid_samples))
        fakes, key = [], jax.random.key(args.seed + 7)
        for _ in range(0, args.fid_samples, args.batch):
            key, k = jax.random.split(key)
            noise = jax.random.normal(k, (args.batch, args.z_dim))
            img, _ = decode(solver.decoder, state.params["decoder"],
                            state.batch_stats["decoder"], noise, train=False)
            fakes.append(np.asarray(img))
        fake = np.concatenate(fakes)[: args.fid_samples]
        fid_std = standard_fid(real, fake, batch_size=args.batch)
        results["fid_inception_pool3"] = (
            round(fid_std, 3) if fid_std is not None else
            "unavailable (set ITCVAE_INCEPTION_WEIGHTS to a pytorch-fid "
            "weights file)"
        )
        results["fid_encoder_features"] = round(
            encoder_fid(solver, state, real, fake, batch_size=args.batch), 3
        )

    print(json.dumps(results, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")
    return results


if __name__ == "__main__":
    main()
