"""Host-side data pipeline feeding device-resident, optionally mesh-sharded
NHWC batches.

Parity surface of reference dataset.py (5 datasets + loader wrapper), plus:

* a `Synthetic` procedural disentanglement dataset (no downloads needed)
  used by tests and benchmarks,
* `DeviceLoader`: shuffled epoch batching with background prefetch and
  `jax.device_put` onto a NamedSharding (the TPU-native equivalent of
  DataLoader(num_workers)+WrappedDataLoader, train.py:146-159),
* fixed quirk Q5: MPI3D defines __len__ here.
"""

from intro_tc_vae_tpu.data.datasets import (
    DisentanglementDataset,
    DSprites,
    DSpritesSmall,
    MPI3D,
    MPI3DSmall,
    Synthetic,
    UkiyoE,
    get_spaced_elements,
    load_dataset,
)
from intro_tc_vae_tpu.data.loader import DeviceLoader, WrappedDataLoader
from intro_tc_vae_tpu.data.image import load_image

__all__ = [
    "DisentanglementDataset",
    "DSprites",
    "DSpritesSmall",
    "MPI3D",
    "MPI3DSmall",
    "Synthetic",
    "UkiyoE",
    "get_spaced_elements",
    "load_dataset",
    "DeviceLoader",
    "WrappedDataLoader",
    "load_image",
]
