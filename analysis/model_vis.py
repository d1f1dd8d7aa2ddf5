"""Model visualization (ModelVis.ipynb equivalent, reference component #15).

Loads a checkpoint, encodes a dataset, and produces:
* 2-D latent projections (PCA / t-SNE / LDA / UMAP) colored by label,
* per-dimension latent traversals (-5..5),
* pairwise interpolations between real images.

Usage:
    python analysis/model_vis.py --checkpoint saves/<prefix>model_epoch_E_iter_I \
        --dataset synthetic --arch res --z-dim 32 --out /tmp/modelvis
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # runnable as `python analysis/<script>.py`
    sys.path.insert(0, _REPO)

import argparse

import jax
import jax.numpy as jnp
import numpy as np


def build_model(arch: str, zdim: int, dataset_name: str, data_root=None):
    from intro_tc_vae_tpu.data import load_dataset
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    dataset, image_size, channels, cdim = load_dataset(dataset_name, data_root)
    kwargs = dict(cdim=cdim, zdim=zdim, channels=tuple(channels),
                  image_size=image_size)
    solver = make_solver(
        "vae",
        dataset=dataset,
        encoder=Encoder(arch=arch, **kwargs),
        decoder=Decoder(arch=arch, **kwargs),
        batch_size=64,
        optimizer_e=make_optimizer("adam", 2e-4),
        optimizer_d=make_optimizer("adam", 2e-4),
    )
    state = solver.init_state(jax.random.key(0),
                              jnp.zeros((1, image_size, image_size, cdim)))
    return solver, state, dataset


def encode_dataset(solver, state, dataset, max_samples=2000, batch=64):
    encode_fn = solver.make_eval_encoder(state)
    n = min(len(dataset), max_samples)
    mus, labels = [], []
    for start in range(0, n, batch):
        idx = np.arange(start, min(start + batch, n))
        imgs = dataset.get_batch(idx)
        mu, _ = encode_fn(imgs)
        mus.append(mu)
        labels.extend(dataset[i][1] for i in idx)
    return np.vstack(mus), np.asarray(labels)


def plot_projections(z, labels, out_dir):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from sklearn.decomposition import PCA
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis
    from sklearn.manifold import TSNE

    color = labels if labels.ndim == 1 else labels[:, 0]
    projs = {"pca": PCA(n_components=2).fit_transform(z)}
    try:
        projs["tsne"] = TSNE(n_components=2, init="pca").fit_transform(z)
    except Exception as e:  # t-SNE can be slow/fragile; not load-bearing
        print("tsne skipped:", e)
    try:
        projs["lda"] = LinearDiscriminantAnalysis(n_components=2).fit_transform(
            z, color.astype(int)
        )
    except Exception as e:
        print("lda skipped:", e)
    try:  # reference ModelVis.ipynb "Apply UMAP" cell; umap-learn is optional
        from umap import UMAP

        projs["umap"] = UMAP(n_components=2).fit_transform(z)
    except Exception as e:
        print("umap skipped (install umap-learn to enable):", e)
    for name, p in projs.items():
        fig, ax = plt.subplots(figsize=(6, 6))
        sc = ax.scatter(p[:, 0], p[:, 1], c=color, s=4, cmap="tab20")
        fig.colorbar(sc)
        ax.set_title(f"latents ({name})")
        fig.savefig(os.path.join(out_dir, f"latents_{name}.png"), dpi=120)
        plt.close(fig)


def plot_traversals(solver, state, z_base, out_dir, span=5.0, steps=11,
                    max_dims=16):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from intro_tc_vae_tpu.solvers.base import decode

    zdim = z_base.shape[-1]
    dims = range(min(zdim, max_dims))
    vals = np.linspace(-span, span, steps)
    fig, axes = plt.subplots(len(list(dims)), steps,
                             figsize=(steps, len(list(dims))))
    for d in dims:
        zs = np.repeat(z_base[None, :], steps, axis=0)
        zs[:, d] = vals
        imgs, _ = decode(solver.decoder, state.params["decoder"],
                         state.batch_stats["decoder"], jnp.asarray(zs),
                         train=False)
        imgs = np.asarray(imgs)
        for s in range(steps):
            ax = axes[d][s] if len(list(dims)) > 1 else axes[s]
            ax.imshow(np.squeeze(imgs[s]), cmap="gray" if imgs.shape[-1] == 1 else None)
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "traversals.png"), dpi=120)
    plt.close(fig)


def plot_interpolations(solver, state, dataset, out_dir, pairs=4, steps=8):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from intro_tc_vae_tpu.solvers.base import decode

    encode_fn = solver.make_eval_encoder(state)
    rng = np.random.RandomState(0)
    fig, axes = plt.subplots(pairs, steps, figsize=(steps, pairs))
    for p in range(pairs):
        i, j = rng.randint(len(dataset), size=2)
        imgs = dataset.get_batch(np.array([i, j]))
        mu, _ = encode_fn(imgs)
        alphas = np.linspace(0, 1, steps)[:, None]
        zs = (1 - alphas) * mu[0] + alphas * mu[1]
        out, _ = decode(solver.decoder, state.params["decoder"],
                        state.batch_stats["decoder"], jnp.asarray(zs),
                        train=False)
        out = np.asarray(out)
        for s in range(steps):
            ax = axes[p][s] if pairs > 1 else axes[s]
            ax.imshow(np.squeeze(out[s]), cmap="gray" if out.shape[-1] == 1 else None)
            ax.axis("off")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "interpolations.png"), dpi=120)
    plt.close(fig)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", required=False, default=None)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--arch", default="res")
    ap.add_argument("--z-dim", type=int, default=32)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out", default="/tmp/modelvis")
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    solver, state, dataset = build_model(args.arch, args.z_dim, args.dataset,
                                         args.data_root)
    if args.checkpoint:
        from intro_tc_vae_tpu.utils import load_model

        state = load_model(state, args.checkpoint)

    z, labels = encode_dataset(solver, state, dataset)
    plot_projections(z, labels, args.out)
    plot_traversals(solver, state, z[0], args.out)
    plot_interpolations(solver, state, dataset, args.out)
    print("wrote visualizations to", args.out)


if __name__ == "__main__":
    main()
