"""System-level training throughput: the real train() loop on TPU.

bench.py measures the jitted step on device-resident data; this measures
what a user actually gets from `python -m intro_tc_vae_tpu.main`: loader
gather + host->device transfer + dispatch + device step + TensorBoard,
at flagship shapes with realistic epoch length (320 steps/epoch).

The dataset is a 20,480-image uint8-backed array dataset (Synthetic
renders quantized once up front) — the same storage layout as dSprites /
MPI3D / the UkiyoE decode cache — so the A/B isolates the transfer path:

    python analysis/bench_system.py              # float32 vs uint8 A/B
    python analysis/bench_system.py float32      # one arm only
    python analysis/bench_system.py auto:4       # uint8 + scan_steps=4
                                                 # (one [4,B,...] transfer
                                                 # per 4 steps)
    python analysis/bench_system.py cache        # device-resident dataset
                                                 # (only ~300 B of indices
                                                 # cross the link per step)

Each arm prints train()'s steady-state line
(`training throughput: N img/s`, median of epochs after the first; epoch
0 carries the XLA compile and is excluded).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import numpy as np

import intro_tc_vae_tpu.train as T
from intro_tc_vae_tpu.config import load_config
from intro_tc_vae_tpu.data.datasets import Synthetic, _ArrayDataset


class _U8Dataset(_ArrayDataset):
    latent_indices = None  # plain dataset: no disentanglement hooks


def main(arms, out_root="/tmp/itcvae-bench-system", epochs=4, batch=64):
    print("rendering uint8 dataset (20,480 images) ...", flush=True)
    syn = Synthetic(image_size=64, cdim=3, sizes=(8, 10, 16, 16))
    imgs = syn.get_batch(np.arange(len(syn)))
    imgs_u8 = np.clip(np.round(imgs * 255.0), 0, 255).astype(np.uint8)

    def patched_load(name, data_root=None):
        return (_U8Dataset(imgs_u8, syn.latents_values, resize=64),
                64, [64, 128, 256, 512], 3)

    T.load_dataset = patched_load

    for arm in arms:
        kind, _, scan = arm.partition(":")
        scan = int(scan or 1)
        # 'cache[:K]' = device-resident dataset; other arms pin the cache
        # OFF so the A/B isolates the transfer path it names.
        cache = "force" if kind == "cache" else "off"
        dtype = "auto" if kind == "cache" else kind
        print(f"=== arm={kind} scan_steps={scan} ===", flush=True)
        config = load_config(update_dict=dict(
            solver="intro_tc", dataset="synthetic", num_epochs=epochs,
            batch_size=batch, z_dim=128, arch="conv", lr=2e-4, beta_kl=0.5,
            beta_rec=0.75, beta_neg=512.0, gamma_r=1e-8, precision="bf16",
            use_tensorboard=True, transfer_dtype=dtype, scan_steps=scan,
            device_cache=cache, seed=99,
            log_dir=f"{out_root}/{arm.replace(':', '_')}/tb",
            checkpoint_dir=f"{out_root}/{arm.replace(':', '_')}/ckpt",
            test_iter=10**6, save_interval=10**6,
        ))
        T.train_soft_intro_vae(config)


if __name__ == "__main__":
    main(sys.argv[1:] or ["float32", "auto", "float32:8", "auto:8"])
