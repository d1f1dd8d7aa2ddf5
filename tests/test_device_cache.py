"""Device-resident dataset cache (data/loader.py::DeviceLoader._setup_cache).

The loader places the WHOLE uint8 dataset in device memory once and
gathers batches on-device in a tiny jitted fn, so per step only the index
vector and flip flags (~300 bytes) cross the host->device link. These
tests pin: bit-exactness with the streaming uint8-transfer path, on-device
flip parity, eligibility/fallback rules, DP sharding of the gather output,
scan-stacked shapes, and end-to-end train() equality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.data.datasets import Synthetic, _ArrayDataset
from intro_tc_vae_tpu.data.loader import DeviceLoader


def _u8_dataset(n=32, size=8, c=3, seed=0):
    rng = np.random.RandomState(seed)
    imgs = rng.randint(0, 256, size=(n, size, size, c), dtype=np.uint8)
    return _ArrayDataset(imgs, np.zeros((n, 1)), resize=size)


class _FlippingDataset(_ArrayDataset):
    """Stand-in for UkiyoE's augmentation: dataset-owned flip RNG."""

    def __init__(self, *args, flip_seed=11, **kwargs):
        super().__init__(*args, **kwargs)
        self._flip_rng = np.random.RandomState(flip_seed)

    def flip_flags(self, n):
        return (self._flip_rng.rand(n) < 0.5).astype(np.uint8)


class TestCachedBatches:
    def test_matches_uint8_transfer_path(self):
        ds = _u8_dataset()
        kw = dict(batch_size=8, shuffle=True, seed=5)
        cached = DeviceLoader(ds, device_cache="force", **kw)
        streamed = DeviceLoader(ds, transfer_dtype="uint8", **kw)
        b_cached = list(cached)
        b_streamed = list(streamed)
        assert cached._cache is not None  # the cache path actually engaged
        assert len(b_cached) == len(b_streamed) == 4
        for bc, bs in zip(b_cached, b_streamed):
            assert bc.dtype == jnp.uint8
            np.testing.assert_array_equal(np.asarray(bc), np.asarray(bs))

    def test_on_device_flip_matches_host_flip(self):
        ds = _FlippingDataset(
            np.random.RandomState(0).randint(0, 256, (16, 8, 8, 3), np.uint8),
            np.zeros((16, 1)), resize=8,
        )
        loader = DeviceLoader(ds, batch_size=8, shuffle=False,
                              device_cache="force")
        batches = [np.asarray(b) for b in loader]
        # replay: same index order (no shuffle), twin flag stream
        twin = np.random.RandomState(11)
        for start, got in zip((0, 8), batches):
            rows = ds.imgs[start:start + 8]
            flags = (twin.rand(8) < 0.5).astype(np.uint8)
            want = rows.copy()
            want[flags != 0] = want[flags != 0][:, :, ::-1, :]
            np.testing.assert_array_equal(got, want)

    def test_scan_stacked_shape_and_values(self):
        ds = _u8_dataset(n=32, size=8)
        kw = dict(batch_size=8, stack_steps=2, shuffle=True, seed=3)
        b_cached = list(DeviceLoader(ds, device_cache="force", **kw))
        b_streamed = list(DeviceLoader(ds, transfer_dtype="uint8", **kw))
        assert len(b_cached) == len(b_streamed) == 2
        for bc, bs in zip(b_cached, b_streamed):
            assert bc.shape == (2, 8, 8, 8, 3)
            np.testing.assert_array_equal(np.asarray(bc), np.asarray(bs))

    def test_labels_still_come_from_host(self):
        ds = _u8_dataset()
        ds.latents_values = np.arange(32)[:, None].astype(np.float64)
        loader = DeviceLoader(ds, batch_size=8, shuffle=True, seed=2,
                              device_cache="force", include_labels=True)
        twin = DeviceLoader(ds, batch_size=8, shuffle=True, seed=2,
                            transfer_dtype="uint8", include_labels=True)
        for (bc, lc), (bs, ls) in zip(loader, twin):
            np.testing.assert_array_equal(lc, ls)
            np.testing.assert_array_equal(np.asarray(bc), np.asarray(bs))


class TestFoldedGather:
    """yield_refs=True: the loader yields CachedBatch references and the
    solver folds the gather into the jitted step (ONE dispatch/step)."""

    def test_refs_materialize_to_streamed_batches(self):
        from intro_tc_vae_tpu.data.loader import CachedBatch, gather_cached

        ds = _FlippingDataset(
            np.random.RandomState(3).randint(0, 256, (32, 8, 8, 3), np.uint8),
            np.zeros((32, 1)), resize=8,
        )
        kw = dict(batch_size=8, shuffle=True, seed=7)
        refs = list(DeviceLoader(ds, device_cache="force", yield_refs=True,
                                 **kw))
        ds2 = _FlippingDataset(ds.imgs, np.zeros((32, 1)), resize=8)
        streamed = list(DeviceLoader(ds2, device_cache="force", **kw))
        assert len(refs) == len(streamed) == 4
        for ref, want in zip(refs, streamed):
            assert isinstance(ref, CachedBatch)
            assert ref.idx.shape == (8,) and ref.flags.shape == (8,)
            np.testing.assert_array_equal(
                np.asarray(gather_cached(ref)), np.asarray(want))

    def test_refs_scan_stacked(self):
        from intro_tc_vae_tpu.data.loader import CachedBatch, gather_cached

        ds = _u8_dataset(n=32, size=8)
        kw = dict(batch_size=8, stack_steps=2, shuffle=True, seed=3)
        refs = list(DeviceLoader(ds, device_cache="force", yield_refs=True,
                                 **kw))
        streamed = list(DeviceLoader(ds, transfer_dtype="uint8", **kw))
        for ref, want in zip(refs, streamed):
            assert isinstance(ref, CachedBatch)
            got = gather_cached(ref, scan_steps=2)
            assert got.shape == (2, 8, 8, 8, 3)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def test_solver_step_accepts_refs_bit_exactly(self):
        """_step_fn(state, CachedBatch) == _step_fn(state, materialized):
        the in-step gather + normalize is bit-identical to feeding the
        gathered uint8 array."""
        from intro_tc_vae_tpu.data.loader import gather_cached
        from intro_tc_vae_tpu.models import Decoder, Encoder
        from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

        ds = _u8_dataset(n=32, size=8)
        kwargs = dict(cdim=3, zdim=4, channels=(4, 8), image_size=8)
        solver = make_solver(
            "vae", dataset=ds,
            encoder=Encoder(arch="conv", **kwargs),
            decoder=Decoder(arch="conv", **kwargs),
            batch_size=8,
            optimizer_e=make_optimizer("adam", 1e-3),
            optimizer_d=make_optimizer("adam", 1e-3),
            beta_kl=0.5, beta_rec=0.75,
        )
        loader = DeviceLoader(ds, batch_size=8, shuffle=True, seed=9,
                              device_cache="force", yield_refs=True)
        ref = next(iter(loader))
        arr = gather_cached(ref)

        x0 = jnp.zeros((1, 8, 8, 3))
        s_ref = solver.init_state(jax.random.key(0), x0)
        s_arr = solver.init_state(jax.random.key(0), x0)
        s_ref, m_ref = solver._step_fn(s_ref, ref)
        s_arr, m_arr = solver._step_fn(s_arr, arr)
        jax.tree_util.tree_map(
            np.testing.assert_array_equal,
            jax.device_get(s_ref.params), jax.device_get(s_arr.params))
        np.testing.assert_array_equal(float(m_ref["loss_enc"]),
                                      float(m_arr["loss_enc"]))


class TestEligibility:
    def test_auto_falls_back_without_raw_storage(self):
        ds = Synthetic(image_size=8, sizes=(2, 2, 2, 2))
        loader = DeviceLoader(ds, batch_size=4, device_cache="auto")
        batch = next(iter(loader))
        assert loader._cache is None
        assert batch.dtype == jnp.float32

    def test_auto_falls_back_over_budget(self):
        ds = _u8_dataset()
        loader = DeviceLoader(ds, batch_size=8, device_cache="auto",
                              device_cache_budget_mb=0, transfer_dtype="auto")
        batch = next(iter(loader))
        assert loader._cache is None          # cache declined...
        assert batch.dtype == jnp.uint8       # ...streaming uint8 took over

    def test_force_raises_without_raw_storage(self):
        ds = Synthetic(image_size=8, sizes=(2, 2, 2, 2))
        loader = DeviceLoader(ds, batch_size=4, device_cache="force")
        with pytest.raises(ValueError, match="raw_array"):
            next(iter(loader))

    def test_force_raises_over_budget(self):
        loader = DeviceLoader(_u8_dataset(), batch_size=8,
                              device_cache="force", device_cache_budget_mb=0)
        with pytest.raises(ValueError, match="budget"):
            next(iter(loader))

    def test_bool_aliases(self):
        assert DeviceLoader(_u8_dataset(), batch_size=8,
                            device_cache=True).device_cache == "force"
        assert DeviceLoader(_u8_dataset(), batch_size=8,
                            device_cache=False).device_cache == "off"

    def test_bad_value_rejected(self):
        with pytest.raises(ValueError, match="device_cache"):
            DeviceLoader(_u8_dataset(), batch_size=8, device_cache="maybe")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
def test_dp8_cached_gather_is_data_sharded():
    """Cache replicated, gather output sharded over the data axis: each
    device reads only its batch rows from its local replica."""
    from intro_tc_vae_tpu.parallel import batch_sharding, make_mesh

    ds = _u8_dataset(n=32, size=8)
    mesh = make_mesh(8)
    sharding = batch_sharding(mesh)
    cached = DeviceLoader(ds, batch_size=16, shuffle=False, sharding=sharding,
                          device_cache="force")
    plain = DeviceLoader(ds, batch_size=16, shuffle=False,
                         transfer_dtype="uint8")
    got = next(iter(cached))
    want = next(iter(plain))
    assert got.dtype == jnp.uint8
    assert len(got.sharding.device_set) == 8
    assert got.sharding.is_equivalent_to(sharding, got.ndim)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_train_e2e_device_cache_matches_streaming(tmp_path):
    """Full train(): device_cache='force' and the streaming uint8 path
    produce bit-identical final parameters (same seed, same index/flag
    streams — the cache changes WHERE bytes live, never a single bit)."""
    import intro_tc_vae_tpu.train as T
    from intro_tc_vae_tpu.config import load_config

    imgs = np.random.RandomState(7).randint(0, 256, (64, 8, 8, 3), np.uint8)

    class _Plain(_ArrayDataset):
        latent_indices = None

    def patched_load(name, data_root=None):
        return _Plain(imgs, np.zeros((64, 1)), resize=8), 8, [4, 8], 3

    orig = T.load_dataset
    T.load_dataset = patched_load
    try:
        params = []
        for mode, sub in (("force", "cache"), ("off", "stream")):
            config = load_config(update_dict=dict(
                solver="vae", dataset="synthetic", num_epochs=2, batch_size=16,
                z_dim=4, arch="conv", lr=1e-3, seed=123, device_cache=mode,
                transfer_dtype="uint8" if mode == "off" else "auto",
                log_dir=str(tmp_path / sub / "tb"),
                checkpoint_dir=str(tmp_path / sub / "ckpt"),
                test_iter=10**6, save_interval=10**6, data_parallel=1,
            ))
            state = T.train_soft_intro_vae(config)
            params.append(jax.device_get(state.params))
        jax.tree_util.tree_map(np.testing.assert_array_equal, *params)
    finally:
        T.load_dataset = orig
