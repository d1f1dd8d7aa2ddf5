"""Data pipeline tests: datasets, fixture loading, loader/prefetch,
factor bookkeeping."""

import os

import jax
import numpy as np
import pytest

from intro_tc_vae_tpu.data import (
    DeviceLoader,
    Synthetic,
    UkiyoE,
    WrappedDataLoader,
    get_spaced_elements,
    load_dataset,
)
from intro_tc_vae_tpu.data.datasets import factor_bases, index_to_factor

DATA_DIR = os.path.join(os.path.dirname(__file__), "test_data")


class TestFactorMath:
    def test_factor_bases(self):
        np.testing.assert_array_equal(factor_bases([2, 3, 4]), [12, 4, 1])

    def test_index_roundtrip(self):
        sizes = [3, 4, 5]
        bases = factor_bases(sizes)
        for idx in [0, 1, 17, 59]:
            f = index_to_factor(idx, bases, sizes)
            assert int(np.dot(f, bases)) == idx

    def test_get_spaced_elements(self):
        arr = np.arange(40)
        out = get_spaced_elements(arr, 4)
        np.testing.assert_array_equal(out, [0, 13, 26, 39])


class TestSynthetic:
    def test_shapes_and_range(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))
        assert len(ds) == 96
        img, label = ds[10]
        assert img.shape == (32, 32, 3) and img.dtype == np.float32
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert label.shape == (4,)

    def test_get_batch_matches_getitem(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))
        idx = np.array([0, 5, 50])
        batch = ds.get_batch(idx)
        for row, i in enumerate(idx):
            np.testing.assert_allclose(batch[row], ds[i][0])

    def test_factors_distinguish_images(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))
        assert not np.allclose(ds[0][0], ds[95][0])


class TestUkiyoEFixture:
    def test_load_from_fixture(self):
        ds = UkiyoE(
            os.path.join(DATA_DIR, "arc_extracted_face_images"),
            UkiyoE.load_labels(DATA_DIR),
            "Painter",
            resize=64,
        )
        assert len(ds) == 5  # missing.jpg row filtered out
        img, label = ds[0]
        assert img.shape == (64, 64, 3)
        assert img.min() >= 0.0 and img.max() <= 1.0
        assert isinstance(ds.get_label(0), str)

    def test_load_dataset_factory_ukiyo(self):
        ds, image_size, channels, ch = load_dataset("ukiyo_e64", data_root=DATA_DIR)
        assert image_size == 64 and ch == 3 and channels == [64, 128, 256, 512]
        assert len(ds) == 5

    def test_load_dataset_ukiyo128_resize_path(self):
        ds, image_size, channels, ch = load_dataset("ukiyo_e128", data_root=DATA_DIR)
        assert image_size == 128 and channels == [64, 128, 256, 512, 512]
        img, _ = ds[0]
        assert img.shape == (128, 128, 3)

    def test_load_dataset_synthetic256(self):
        # reference-default (256px) shapes, file-free synthetic corpus
        ds, image_size, channels, ch = load_dataset("synthetic256")
        assert image_size == 256 and ch == 3
        assert channels == [64, 128, 256, 512, 512, 512]
        img = ds.get_batch(np.array([0]))
        assert img.shape == (1, 256, 256, 3)

    def test_unknown_dataset_raises(self):
        with pytest.raises(NotImplementedError):
            load_dataset("imagenet")

    def test_cached_batches_match_per_image_decode(self):
        """The decoded-uint8 cache + native gather/resize path must produce
        the same batches as the per-image load_image path (flip off)."""
        kwargs = dict(category="Painter", resize=64)
        root = os.path.join(DATA_DIR, "arc_extracted_face_images")
        labels = UkiyoE.load_labels(DATA_DIR)
        ds_cached = UkiyoE(root, labels, cache=True, **kwargs)
        ds_plain = UkiyoE(root, labels, cache=False, **kwargs)
        ds_cached.random_flip = ds_plain.random_flip = False
        idx = np.array([0, 2, 4, 1])
        a = ds_cached.get_batch(idx)
        b = ds_plain.get_batch(idx)
        assert a.shape == b.shape == (4, 64, 64, 3)
        # the cache keeps PIL's final uint8 stage -> bit-exact
        assert np.array_equal(a, b)

    def test_cached_flip_draws_per_batch(self):
        root = os.path.join(DATA_DIR, "arc_extracted_face_images")
        ds = UkiyoE(root, UkiyoE.load_labels(DATA_DIR), "Painter",
                    resize=64, cache=True)
        ds._rng = np.random.RandomState(0)
        batches = [ds.get_batch(np.array([0, 1, 2, 3])) for _ in range(8)]
        # with p=0.5 flips, identical-index batches should not all be equal
        assert any(not np.array_equal(batches[0], b) for b in batches[1:])

    def test_singleface_filename_column_preferred(self):
        """The reference reads 'singleface_filename' (dataset.py:215);
        when a CSV provides it, it wins over the positional 'filename'."""
        import pandas as pd

        df = pd.DataFrame({
            "Painter": ["A", "B"],
            "filename": ["missing1.jpg", "missing2.jpg"],
            "singleface_filename": ["00000001.jpg", "00000002.jpg"],
        })
        ds = UkiyoE(os.path.join(DATA_DIR, "arc_extracted_face_images"), df,
                    "Painter", resize=64)
        assert len(ds) == 2  # resolved via singleface_filename


class TestDeviceLoader:
    def test_epoch_batches(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))  # 96
        loader = DeviceLoader(ds, batch_size=16, seed=0)
        assert len(loader) == 6
        batches = list(loader)
        assert len(batches) == 6
        for b in batches:
            assert b.shape == (16, 32, 32, 3)
            assert isinstance(b, jax.Array)

    def test_drop_last(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))
        loader = DeviceLoader(ds, batch_size=40, drop_last=True)
        assert len(list(loader)) == 2
        loader2 = DeviceLoader(ds, batch_size=40, drop_last=False)
        assert len(list(loader2)) == 3

    def test_shuffle_changes_between_epochs(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))
        loader = DeviceLoader(ds, batch_size=96, shuffle=True, seed=1)
        e1 = np.asarray(next(iter(loader)))
        e2 = np.asarray(next(iter(loader)))
        assert not np.allclose(e1, e2)

    def test_pre_process_hook_and_error_propagation(self):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 3, 4, 4))
        loader = DeviceLoader(ds, batch_size=16, pre_process=lambda b: b * 0.5)
        b = next(iter(loader))
        assert float(b.max()) <= 0.5

        def boom(b):
            raise RuntimeError("bad batch")

        loader_err = DeviceLoader(ds, batch_size=16, pre_process=boom)
        with pytest.raises(RuntimeError, match="bad batch"):
            list(loader_err)

    def test_wrapped_data_loader(self):
        inner = [np.ones((2, 2)), np.zeros((2, 2))]
        wrapped = WrappedDataLoader(inner, lambda b: b + 1)
        out = list(wrapped)
        assert len(wrapped) == 2
        np.testing.assert_allclose(out[0], 2 * np.ones((2, 2)))
