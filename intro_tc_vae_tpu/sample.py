"""Generation CLI: decode prior samples / reconstruct images from a
trained checkpoint.

    python -m intro_tc_vae_tpu.sample --checkpoint saves/<...> \
        --dataset synthetic --arch res --z-dim 32 --num 16 --out grid.png

The serving path of the framework: builds the decoder, restores params,
jits batched decode, writes an image grid (and optionally a .npy of the
raw batch).
"""

from __future__ import annotations

import argparse

import numpy as np


def sample_grid(images: np.ndarray, cols: int = 8) -> np.ndarray:
    """[N, H, W, C] -> one grid image [GH, GW, C] (any dtype)."""
    n, h, w, c = images.shape
    cols = min(cols, n)
    rows = -(-n // cols)
    grid = np.zeros((rows * h, cols * w, c), images.dtype)
    for i, img in enumerate(images):
        r, col = divmod(i, cols)
        grid[r * h:(r + 1) * h, col * w:(col + 1) * w] = img
    return grid


def main(argv=None):
    ap = argparse.ArgumentParser(description="sample from a trained model")
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--dataset", default="synthetic",
                    help="dataset name (fixes image size/channels)")
    ap.add_argument("--arch", default="res")
    ap.add_argument("--z-dim", type=int, default=32)
    ap.add_argument("--num", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--reconstruct", action="store_true",
                    help="also reconstruct --num dataset images")
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out", default="samples.png")
    ap.add_argument("--pack", type=int, default=0,
                    help="run the predict conv output-packed NxN "
                         "(PackedPredictConv; weight-compatible). ~2x "
                         "decode throughput at every resolution on TPU "
                         "(BENCHMARKS.md serving table); bf16-noise-level "
                         "value differences")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp
    from PIL import Image

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
        batch_size=args.num,
        optimizer_e=make_optimizer("adam", 1e-3),
        optimizer_d=make_optimizer("adam", 1e-3),
    )
    state = solver.init_state(
        jax.random.key(0), jnp.zeros((1, image_size, image_size, cdim))
    )
    state = load_model(state, args.checkpoint)

    from intro_tc_vae_tpu.solvers.base import decode, encode, unit_f32_to_u8

    # quantize ON DEVICE before the fetch: uint8 export is 4x fewer D2H
    # bytes and bit-identical to the host (clip*255).astype convention
    z = jax.random.normal(jax.random.key(args.seed), (args.num, args.z_dim))
    fake, _ = decode(solver.decoder, state.params["decoder"],
                     state.batch_stats["decoder"], z, train=False)
    imgs = [np.asarray(unit_f32_to_u8(fake))]

    if args.reconstruct:
        x = dataset.get_batch(np.arange(args.num) % len(dataset))
        mu, _, _ = encode(solver.encoder, state.params["encoder"],
                          state.batch_stats["encoder"], jnp.asarray(x),
                          train=False)
        rec, _ = decode(solver.decoder, state.params["decoder"],
                        state.batch_stats["decoder"], mu, train=False)
        x_u8 = (np.clip(x, 0, 1) * 255).astype(np.uint8)
        imgs = [x_u8, np.asarray(unit_f32_to_u8(rec)), imgs[0]]

    grid = np.squeeze(sample_grid(np.concatenate(imgs, axis=0)))
    Image.fromarray(grid).save(args.out)
    print(f"wrote {args.out} ({grid.shape[0]}x{grid.shape[1]})")


if __name__ == "__main__":
    main()
