"""uint8 host->device transfer path: bit-exactness with the float path.

The loader can transfer raw uint8 batches (4x fewer bytes over the
host->device link) and let the jitted step normalize on-device
(solvers/base.py::_normalize_input). These tests pin the exactness
contract: for every dataset that offers get_batch_raw, uint8-then-/255
equals the float pipeline bit-for-bit, and a training step fed either
way produces the same numbers.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.data.datasets import Synthetic, UkiyoE, _ArrayDataset
from intro_tc_vae_tpu.data.loader import DeviceLoader

DATA_DIR = os.path.join(os.path.dirname(__file__), "test_data")


def _u8_dataset(n=32, size=8, c=3, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, size=(n, size, size, c), dtype=np.uint8)
    return _ArrayDataset(imgs, np.zeros((n, 1)), resize=size)


class TestRawAccessor:
    def test_array_dataset_raw_matches_float(self):
        ds = _u8_dataset()
        idx = np.array([3, 0, 17, 31])
        raw = ds.get_batch_raw(idx)
        assert raw.dtype == np.uint8
        np.testing.assert_array_equal(
            raw.astype(np.float32) / 255.0, ds.get_batch(idx)
        )

    def test_array_dataset_2d_images_gain_channel_dim(self):
        rng = np.random.RandomState(1)
        imgs = rng.randint(0, 256, size=(8, 6, 6), dtype=np.uint8)
        ds = _ArrayDataset(imgs, np.zeros((8, 1)), resize=6)
        raw = ds.get_batch_raw(np.arange(4))
        assert raw.shape == (4, 6, 6, 1)

    def test_no_raw_path_when_resized(self):
        rng = np.random.RandomState(2)
        imgs = rng.randint(0, 256, size=(8, 16, 16, 3), dtype=np.uint8)
        ds = _ArrayDataset(imgs, np.zeros((8, 1)), resize=8)
        assert ds.get_batch_raw(np.arange(4)) is None

    def test_synthetic_has_no_raw_path(self):
        ds = Synthetic(image_size=8, sizes=(2, 2, 2, 2))
        assert ds.get_batch_raw(np.arange(4)) is None

    def test_ukiyoe_cached_raw_matches_float(self):
        ds = UkiyoE(
            os.path.join(DATA_DIR, "arc_extracted_face_images"),
            UkiyoE.load_labels(DATA_DIR),
            resize=32,
            cache=True,
        )
        idx = np.arange(len(ds))
        # same flip draws: reseed the rng before each path
        ds._rng = np.random.RandomState(7)
        raw = ds.get_batch_raw(idx)
        ds._rng = np.random.RandomState(7)
        ref = ds.get_batch(idx)
        assert raw.dtype == np.uint8
        np.testing.assert_array_equal(raw.astype(np.float32) / 255.0, ref)

    def test_ukiyoe_uncached_has_no_raw_path(self):
        ds = UkiyoE(
            os.path.join(DATA_DIR, "arc_extracted_face_images"),
            UkiyoE.load_labels(DATA_DIR),
            resize=32,
            cache=False,
        )
        assert ds.get_batch_raw(np.arange(2)) is None


class TestLoader:
    def test_auto_transfers_uint8_and_matches_float(self):
        ds = _u8_dataset()
        kw = dict(batch_size=8, shuffle=True, seed=5)
        batches_u8 = list(DeviceLoader(ds, transfer_dtype="auto", **kw))
        batches_f32 = list(DeviceLoader(ds, transfer_dtype="float32", **kw))
        assert len(batches_u8) == len(batches_f32) == 4
        for bu, bf in zip(batches_u8, batches_f32):
            assert bu.dtype == jnp.uint8
            assert bf.dtype == jnp.float32
            np.testing.assert_array_equal(
                np.asarray(bu).astype(np.float32) / 255.0, np.asarray(bf)
            )

    def test_auto_falls_back_to_float_for_synthetic(self):
        ds = Synthetic(image_size=8, sizes=(2, 2, 2, 2))
        batch = next(iter(DeviceLoader(ds, batch_size=4, transfer_dtype="auto")))
        assert batch.dtype == jnp.float32

    def test_explicit_uint8_raises_without_raw_path(self):
        ds = Synthetic(image_size=8, sizes=(2, 2, 2, 2))
        loader = DeviceLoader(ds, batch_size=4, transfer_dtype="uint8")
        with pytest.raises(ValueError, match="uint8"):
            list(loader)

    def test_bad_transfer_dtype_rejected(self):
        with pytest.raises(ValueError):
            DeviceLoader(_u8_dataset(), batch_size=4, transfer_dtype="f16")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dp8_sharded_uint8_step_matches_float():
    """uint8 batches sharded over the data axis: the loader produces a
    DP8 NamedSharding'd uint8 array and the GSPMD step matches the float
    path exactly (the normalize table is replicated; the gather
    partitions trivially along the batch)."""
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.parallel import batch_sharding, make_mesh, shard_state
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    ds = _u8_dataset(n=16, size=16)
    mesh = make_mesh(8)
    kw = dict(arch="conv", cdim=3, zdim=4, channels=(4, 8), image_size=16)

    def build():
        return make_solver(
            "vae", dataset=ds,
            encoder=Encoder(**kw), decoder=Decoder(**kw),
            batch_size=8,
            optimizer_e=make_optimizer("adam", 1e-4),
            optimizer_d=make_optimizer("adam", 1e-4),
        )

    sharding = batch_sharding(mesh)
    lu8 = DeviceLoader(ds, batch_size=8, shuffle=False, sharding=sharding,
                       transfer_dtype="auto")
    lf32 = DeviceLoader(ds, batch_size=8, shuffle=False, sharding=sharding,
                        transfer_dtype="float32")
    bu8, bf32 = next(iter(lu8)), next(iter(lf32))
    assert bu8.dtype == jnp.uint8 and len(bu8.sharding.device_set) == 8

    s1, s2 = build(), build()
    st1 = shard_state(s1.init_state(jax.random.key(0), jnp.zeros((1, 16, 16, 3))), mesh)
    st2 = shard_state(s2.init_state(jax.random.key(0), jnp.zeros((1, 16, 16, 3))), mesh)
    st1, m1 = s1._step_fn(st1, bu8)
    st2, m2 = s2._step_fn(st2, bf32)
    np.testing.assert_array_equal(np.asarray(m1["loss_enc"]), np.asarray(m2["loss_enc"]))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(st1.params), jax.device_get(st2.params),
    )


@pytest.mark.slow
def test_train_e2e_uint8_transfer_with_tensorboard(tmp_path, monkeypatch):
    """Full train() on the Ukiyo-E fixture: transfer_dtype='auto' must
    actually move uint8 over the loader (the cache offers the exact raw
    path) and the TB image-grid path must normalize uint8 batches."""
    import intro_tc_vae_tpu.train as T
    from intro_tc_vae_tpu.config import Config

    seen_dtypes = []

    class SpyLoader(DeviceLoader):
        def _make_batch(self, idx):
            out = super()._make_batch(idx)
            b = out[0] if isinstance(out, tuple) else out
            seen_dtypes.append(np.dtype(str(b.dtype)))
            return out

    monkeypatch.setattr(T, "DeviceLoader", SpyLoader)
    config = Config(
        solver="vae", dataset="ukiyo_e64", arch="res", optimizer="adagrad",
        lr=2e-4, batch_size=3, num_epochs=1, seed=99, z_dim=32,
        use_tensorboard=True, test_iter=1, num_workers=1,
        data_root=os.path.join(os.path.dirname(__file__), "test_data"),
        checkpoint_dir=str(tmp_path / "saves"),
        log_dir=str(tmp_path / "runs" / "tb"),
        data_parallel=1,
        # this test pins the uint8 STREAMING transfer; the device-cache
        # path (which would otherwise engage on this tiny fixture and
        # bypass _make_batch) has its own e2e tests in test_device_cache
        device_cache="off",
    )
    T.train_soft_intro_vae(config)
    assert seen_dtypes and all(d == np.uint8 for d in seen_dtypes)
    run_dirs = list((tmp_path / "runs").iterdir())
    assert run_dirs

    from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

    reader = TensorboardReader(str(tmp_path / "runs"), run_dirs[0].name)
    # image grid written from a uint8 batch (real rows pass through
    # u8_to_unit_f32 before the encoder and the grid concatenate)
    assert len(reader.reconstructions) > 0


@pytest.mark.slow
def test_train_e2e_device_cache_with_tensorboard(tmp_path):
    """Full train() with the device cache engaged (CachedBatch references
    folded into the step): the test_iter-gated TB image grids must
    materialize the reference batch for the vis path
    (solvers/base.py::train_step)."""
    import intro_tc_vae_tpu.train as T
    from intro_tc_vae_tpu.config import Config

    config = Config(
        solver="vae", dataset="ukiyo_e64", arch="res", optimizer="adagrad",
        lr=2e-4, batch_size=3, num_epochs=1, seed=99, z_dim=32,
        use_tensorboard=True, test_iter=1, num_workers=1,
        data_root=os.path.join(os.path.dirname(__file__), "test_data"),
        checkpoint_dir=str(tmp_path / "saves"),
        log_dir=str(tmp_path / "runs" / "tb"),
        data_parallel=1, device_cache="force",
    )
    T.train_soft_intro_vae(config)
    run_dirs = list((tmp_path / "runs").iterdir())
    assert run_dirs

    from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

    reader = TensorboardReader(str(tmp_path / "runs"), run_dirs[0].name)
    assert len(reader.reconstructions) > 0


@pytest.mark.slow
def test_abort_flushes_buffered_scalars(tmp_path, monkeypatch):
    """A mid-training abort (the NaN fail-fast path) must not lose the
    ring of buffered TensorBoard scalars — they are the steps that show
    the blow-up (train.py epoch-loop try/finally)."""
    from intro_tc_vae_tpu.config import Config
    from intro_tc_vae_tpu.solvers.base import VAESolver
    from intro_tc_vae_tpu.train import train_soft_intro_vae

    calls = []
    orig = VAESolver.check_finite

    def exploding(self, metrics):
        calls.append(1)
        if len(calls) == 2:
            raise RuntimeError("non-finite loss_enc: simulated")
        return orig(self, metrics)

    monkeypatch.setattr(VAESolver, "check_finite", exploding)
    config = Config(
        solver="vae", dataset="synthetic_small", batch_size=16, num_epochs=3,
        seed=5, z_dim=8, use_tensorboard=True, test_iter=10**6,
        save_interval=1000, num_workers=1,
        checkpoint_dir=str(tmp_path / "saves"),
        log_dir=str(tmp_path / "runs" / "tb"), data_parallel=1,
    )
    with pytest.raises(RuntimeError, match="non-finite"):
        train_soft_intro_vae(config)

    import time

    from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

    time.sleep(0.5)  # tensorboardX sub-writers flush asynchronously
    run = list((tmp_path / "runs").iterdir())[0]
    reader = TensorboardReader(str(tmp_path / "runs"), run.name)
    # steps ran before the abort; the ring must have been drained
    assert len(reader.r_loss_scaled) > 0


class TestDeviceNormalize:
    def test_on_device_normalize_is_bit_exact(self):
        """On-device u8->unit-f32 must equal the host pipeline's divide.

        (A plain on-device /255 does NOT: XLA rewrites divide-by-constant
        into a reciprocal multiply, 1 ULP off for 126 of 256 values —
        hence the table lookup in solvers/base.py::u8_to_unit_f32.)"""
        from intro_tc_vae_tpu.solvers.base import u8_to_unit_f32

        x = np.arange(256, dtype=np.uint8)
        dev = jax.jit(u8_to_unit_f32)(x)
        np.testing.assert_array_equal(
            np.asarray(dev), x.astype(np.float32) / 255.0
        )

    def test_export_quantize_is_bit_exact(self):
        """Device-side unit_f32_to_u8 == host (clip*255).astype(uint8)
        (the serving-export mirror: XLA's float->int convert rounds while
        numpy astype truncates, hence the explicit floor)."""
        from intro_tc_vae_tpu.solvers.base import unit_f32_to_u8

        rng = np.random.RandomState(3)
        x = np.concatenate([
            rng.rand(4096).astype(np.float32),
            np.float32([-0.5, 0.0, 1.0, 1.5, 0.999999, 1e-7]),
            (np.arange(256) / 255.0).astype(np.float32),
        ])
        host = (np.clip(x, 0, 1) * 255).astype(np.uint8)
        dev = np.asarray(jax.jit(unit_f32_to_u8)(x))
        np.testing.assert_array_equal(dev, host)

    def test_step_metrics_match_float_path(self):
        """One VAE step fed uint8 == fed pre-normalized float32."""
        from intro_tc_vae_tpu.models import Decoder, Encoder
        from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

        ds = _u8_dataset(n=16, size=16)
        kw = dict(arch="conv", cdim=3, zdim=4, channels=(4, 8), image_size=16)

        def solver():
            return make_solver(
                "vae", dataset=ds,
                encoder=Encoder(**kw), decoder=Decoder(**kw),
                batch_size=8,
                optimizer_e=make_optimizer("adam", 1e-4),
                optimizer_d=make_optimizer("adam", 1e-4),
            )

        s1, s2 = solver(), solver()
        key = jax.random.key(0)
        raw = ds.get_batch_raw(np.arange(8))
        flt = ds.get_batch(np.arange(8))
        st1 = s1.init_state(key, jnp.zeros((1, 16, 16, 3)))
        st2 = s2.init_state(key, jnp.zeros((1, 16, 16, 3)))
        st1, m1 = s1.train_step(st1, jnp.asarray(raw), 0)
        st2, m2 = s2.train_step(st2, jnp.asarray(flt), 0)
        for k in ("loss_enc", "loss_rec", "loss_kl"):
            np.testing.assert_allclose(
                np.asarray(m1[k]), np.asarray(m2[k]), rtol=0, atol=0
            )
        p1 = jax.device_get(st1.params)
        p2 = jax.device_get(st2.params)
        jax.tree_util.tree_map(np.testing.assert_array_equal, p1, p2)
