"""Real-corpus loader coverage without the real corpora.

The ARC Ukiyo-E / dSprites / MPI3D archives are absent in the build
environment (no egress), so these tests synthesize SCHEMA-CORRECT
archives — the real npz key names, dtypes, and the full factor grids
(dSprites [1,3,6,40,32,32] = 737,280 rows; MPI3D [6,6,2,3,3,40,40] =
1,036,800 rows) — with reduced stored image resolution to keep the
fixtures tens of MB. Everything the loaders do with the real files
(key access, value scaling, factor-grid masking for the *Small
variants, index→factor decomposition, lazy resize) is exercised for
real; only the pixel content is fake.

Reference schemas: dataset.py:131-162 (dsprites npz, `imgs` 0/1 +
`latents_values`), dataset.py:40-89 (mpi3d npz, `images` uint8).
"""

import os

import numpy as np
import pytest

from intro_tc_vae_tpu.data.datasets import (
    DSprites,
    DSpritesSmall,
    MPI3D,
    MPI3DSmall,
    factor_bases,
    load_dataset,
)

DSPRITES_FACTORS = [1, 3, 6, 40, 32, 32]          # 737,280 rows
DSPRITES_NPZ = "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz"
MPI3D_FACTORS = [6, 6, 2, 3, 3, 40, 40]           # 1,036,800 rows


def _dsprites_latents_values() -> np.ndarray:
    """The real file's `latents_values` layout: physical values on the
    full cartesian factor grid (color=1, shape 1..3, scale 0.5..1,
    orientation 0..2pi, posX/posY 0..1), row-major in factor order."""
    grids = [
        np.array([1.0]),
        np.arange(1, 4, dtype=np.float64),
        np.linspace(0.5, 1.0, 6),
        np.linspace(0.0, 2.0 * np.pi, 40),
        np.linspace(0.0, 1.0, 32),
        np.linspace(0.0, 1.0, 32),
    ]
    mesh = np.meshgrid(*grids, indexing="ij")
    return np.stack([m.ravel() for m in mesh], axis=1)


@pytest.fixture(scope="module")
def dsprites_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("dsprites-dataset")
    n = int(np.prod(DSPRITES_FACTORS))
    # real file: binary sprites stored as 0/1 uint8 [N, 64, 64]; stored
    # small here (the loader's resize path upsamples lazily per access)
    imgs = (np.random.RandomState(0).rand(n, 8, 8) < 0.2).astype(np.uint8)
    np.savez(os.path.join(root, DSPRITES_NPZ),
             imgs=imgs, latents_values=_dsprites_latents_values())
    return str(root)


@pytest.fixture(scope="module")
def mpi3d_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mpi3d-dataset")
    n = int(np.prod(MPI3D_FACTORS))
    # real file: uint8 RGB [N, 64, 64, 3]; stored 4x4 here
    images = np.random.RandomState(1).randint(
        0, 256, size=(n, 4, 4, 3), dtype=np.uint8)
    np.savez(os.path.join(root, "mpi3d_toy.npz"), images=images)
    return str(root)


class TestDSprites:
    def test_load_data_full_grid(self, dsprites_root):
        ds = DSprites.load_data(data_root=dsprites_root)
        assert len(ds) == 737280
        assert ds.latent_indices == [1, 2, 3, 4, 5]
        assert ds.factor_sizes == DSPRITES_FACTORS
        img, lat = ds[0]
        # 0/1 sprites scaled to 0/255 at load, resized to 64, unit floats
        assert img.shape == (64, 64, 1) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0
        assert lat.shape == (6,) and lat[0] == 1.0

    def test_small_variant_masks_the_real_grid(self, dsprites_root):
        """DSpritesSmall's factor masking (orientation 40->4, x/y 32->10)
        must carve exactly prod([1,3,6,4,10,10]) rows out of the full
        grid — this asserts against the real file's value layout."""
        ds = DSpritesSmall.load_data(data_root=dsprites_root)
        assert len(ds) == 1 * 3 * 6 * 4 * 10 * 10 == 7200
        # each masked factor column really has the reduced cardinality
        assert len(np.unique(ds.latents_values[:, 3])) == 4
        assert len(np.unique(ds.latents_values[:, 4])) == 10
        assert len(np.unique(ds.latents_values[:, 5])) == 10

    def test_factory_route(self, dsprites_root):
        ds, image_size, channels, cdim = load_dataset(
            "dsprites", data_root=dsprites_root)
        assert image_size == 64 and cdim == 1 and len(ds) == 737280
        ds_s, _, _, _ = load_dataset("dsprites_small",
                                     data_root=dsprites_root)
        assert len(ds_s) == 7200

    def test_latent_generator_indexing(self, dsprites_root):
        """FeatureIndex factor->row mapping on the small variant: the
        sampled observation must carry exactly the requested factors."""
        from intro_tc_vae_tpu.evaluation.generator import LatentGenerator

        ds = DSpritesSmall.load_data(data_root=dsprites_root)
        gen = LatentGenerator(ds, seed=3)
        factors = gen.sample_all_factors(gen.sample_factors_of_variation(4))
        idx = gen.feature_lookup[factors]
        # re-derive the rows independently from the reduced factor grid
        bases = factor_bases(ds.factor_sizes)
        np.testing.assert_array_equal(
            np.asarray(idx), (factors @ bases).astype(np.int64))
        # and the row's stored factor VALUES really have the sampled
        # factor coordinates (value grids are monotone per factor)
        for row, fac in zip(np.asarray(idx), factors):
            vals = ds.latents_values[row]
            for col in range(1, 6):
                grid = np.unique(ds.latents_values[:, col])
                assert vals[col] == grid[int(fac[col])]


class TestMPI3D:
    def test_load_data_full_grid(self, mpi3d_root):
        ds = MPI3D.load_data(data_root=mpi3d_root)
        assert len(ds) == 1036800
        assert ds.factor_sizes == MPI3D_FACTORS
        # index->factor decomposition spans the grid corners
        np.testing.assert_array_equal(ds.latents_values[0], np.zeros(7))
        np.testing.assert_array_equal(ds.latents_values[-1],
                                      [5, 5, 1, 2, 2, 39, 39])
        img, lat = ds[123]
        assert img.shape == (64, 64, 3) and img.dtype == np.float32
        assert 0.0 <= img.min() and img.max() <= 1.0

    def test_small_variant_masks_camera_angles(self, mpi3d_root):
        ds = MPI3DSmall.load_data(data_root=mpi3d_root)
        assert len(ds) == 6 * 6 * 2 * 3 * 3 * 4 * 4 == 10368
        assert len(np.unique(ds.latents_values[:, 5])) == 4
        assert len(np.unique(ds.latents_values[:, 6])) == 4

    def test_factory_route(self, mpi3d_root):
        ds, image_size, channels, cdim = load_dataset(
            "mpi3d", data_root=mpi3d_root)
        assert image_size == 64 and cdim == 3 and len(ds) == 1036800
        ds_s, _, _, _ = load_dataset("mpi3d_small", data_root=mpi3d_root)
        assert len(ds_s) == 10368


@pytest.mark.slow
def test_train_smoke_on_schema_correct_dsprites(dsprites_root, tmp_path):
    """One real train() epoch driven through load_dataset('dsprites_small')
    on the schema-correct archive — the exact code path a user with the
    real file runs (reference README config 2)."""
    import intro_tc_vae_tpu.train as T
    from intro_tc_vae_tpu.config import load_config

    config = load_config(update_dict=dict(
        solver="tc", dataset="dsprites_small", data_root=dsprites_root,
        num_epochs=1, batch_size=16, z_dim=8, arch="conv", lr=1e-3,
        seed=5, test_iter=10**6, save_interval=10**6, data_parallel=1,
        log_dir=str(tmp_path / "tb"), checkpoint_dir=str(tmp_path / "ckpt"),
    ))
    # subsample rows and shrink the conv stack to keep the CPU smoke fast;
    # the loader/resize/factor plumbing under test is unchanged
    ds, image_size, channels, cdim = load_dataset(
        "dsprites_small", data_root=dsprites_root)
    ds.imgs = ds.imgs[:160]
    ds.latents_values = ds.latents_values[:160]
    orig = T.load_dataset
    T.load_dataset = lambda name, data_root=None: (ds, image_size, [8, 16], cdim)
    try:
        state = T.train_soft_intro_vae(config)
    finally:
        T.load_dataset = orig
    import jax

    assert np.isfinite(float(jax.device_get(state.step)))
