"""Utils tests: checkpoint save/restore (incl. optimizer state), LossDict,
SingletonWriter, non-finite grad scanner, TB reader roundtrip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.utils import (
    LossDict,
    SingletonWriter,
    check_non_finite_gradints,
    load_checkpoint,
    load_model,
    save_checkpoint,
)


class TestLossDict:
    def test_add_and_div(self):
        a = LossDict(x=1.0, y=2.0)
        b = LossDict(x=3.0, z=4.0)
        c = a + b
        assert c == {"x": 4.0, "y": 2.0, "z": 4.0}
        assert (c / 2)["x"] == 2.0


class TestSingletonWriter:
    def test_singleton_identity(self):
        s1, s2 = SingletonWriter(), SingletonWriter()
        assert s1 is s2
        s1.writer, s1.cur_iter, s1.test_iter = None, 10, 5
        assert not s2.write_test_iter  # writer is falsy

    def test_write_test_iter_modulo(self):
        s = SingletonWriter()
        s.writer, s.cur_iter, s.test_iter = object(), 10, 5
        assert s.write_test_iter
        s.cur_iter = 11
        assert not s.write_test_iter


class TestNonFiniteGrads:
    def test_reports_bad_leaves(self):
        grads = {"a": {"kernel": np.array([1.0, np.nan])},
                 "b": {"kernel": np.array([1.0, 2.0])}}
        bad = check_non_finite_gradints(grads)
        assert bad == ["a/kernel"]


class TestCheckpoint:
    def _make_solver_state(self):
        from intro_tc_vae_tpu.data import Synthetic
        from intro_tc_vae_tpu.models import Decoder, Encoder
        from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

        small = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))
        solver = make_solver(
            "vae", dataset=ds,
            encoder=Encoder(arch="res", **small),
            decoder=Decoder(arch="res", **small),
            batch_size=4,
            optimizer_e=make_optimizer("adam", 1e-3),
            optimizer_d=make_optimizer("adam", 1e-3),
        )
        batch = jnp.asarray(ds.get_batch(np.arange(4)))
        return solver, solver.init_state(jax.random.key(0), batch), batch

    def test_roundtrip_with_optimizer_state(self, tmp_path):
        solver, state, batch = self._make_solver_state()
        state, _ = solver._step_fn(state, batch)  # give Adam real moments

        path = save_checkpoint(state, epoch=3, iteration=17, prefix="t_",
                               checkpoint_dir=str(tmp_path))
        assert "t_model_epoch_3_iter_17" in path

        fresh = solver.init_state(jax.random.key(1), batch)
        restored, epoch = load_checkpoint(path, fresh)
        assert epoch == 3
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer moments restored too (fixes reference quirk Q12)
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state_e),
                        jax.tree_util.tree_leaves(restored.opt_state_e)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_async_save_roundtrip(self, tmp_path):
        from intro_tc_vae_tpu.utils.checkpoint import finalize_checkpoints

        solver, state, batch = self._make_solver_state()
        state, _ = solver._step_fn(state, batch)

        path = save_checkpoint(state, epoch=1, iteration=5, prefix="a_",
                               checkpoint_dir=str(tmp_path), async_save=True)
        finalize_checkpoints()  # the save commits in the background

        fresh = solver.init_state(jax.random.key(1), batch)
        restored, epoch = load_checkpoint(path, fresh)
        assert epoch == 1
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.opt_state_d),
                        jax.tree_util.tree_leaves(restored.opt_state_d)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_find_latest_checkpoint(self, tmp_path):
        from intro_tc_vae_tpu.utils.checkpoint import find_latest_checkpoint

        solver, state, batch = self._make_solver_state()
        save_checkpoint(state, 1, 10, "run_", checkpoint_dir=str(tmp_path))
        save_checkpoint(state, 5, 50, "run_", checkpoint_dir=str(tmp_path))
        save_checkpoint(state, 2, 99, "other_", checkpoint_dir=str(tmp_path))
        latest = find_latest_checkpoint(str(tmp_path), "run_")
        assert latest.endswith("run_model_epoch_5_iter_50")
        assert find_latest_checkpoint(str(tmp_path), "nope_") is None
        assert find_latest_checkpoint(str(tmp_path / "missing")) is None
        # epoch outranks iter: a later epoch with a smaller iter (the
        # post-resume situation) must win over a stale pre-crash checkpoint
        save_checkpoint(state, 6, 10, "run_", checkpoint_dir=str(tmp_path))
        latest = find_latest_checkpoint(str(tmp_path), "run_")
        assert latest.endswith("run_model_epoch_6_iter_10")

    @pytest.mark.slow
    def test_auto_resume_in_train_loop(self, tmp_path):
        from intro_tc_vae_tpu.config import Config
        from intro_tc_vae_tpu.train import train_soft_intro_vae

        base = dict(
            solver="vae", dataset="synthetic_small", batch_size=16,
            num_epochs=2, seed=11, z_dim=8, save_interval=1,
            checkpoint_dir=str(tmp_path / "saves"), data_parallel=1,
        )
        from intro_tc_vae_tpu.utils.checkpoint import find_latest_checkpoint

        first = train_soft_intro_vae(Config(**base))  # writes epoch checkpoints
        # resume=auto picks up the newest checkpoint and continues
        state = train_soft_intro_vae(Config(**{**base, "num_epochs": 3,
                                               "resume": "auto"}))
        assert int(state.step) > int(first.step)
        # the global step count continues across the resume: the newest
        # checkpoint's iter must reflect the TOTAL steps, not restart at 0
        cfg = Config(**base)
        latest = find_latest_checkpoint(str(tmp_path / "saves"),
                                        cfg.fingerprint())
        import re
        m = re.search(r"_iter_(\d+)$", latest)
        assert int(m.group(1)) == int(state.step)

    def test_load_model_params_only(self, tmp_path):
        solver, state, batch = self._make_solver_state()
        path = save_checkpoint(state, 0, 0, "m_", checkpoint_dir=str(tmp_path))
        fresh = solver.init_state(jax.random.key(9), batch)
        loaded = load_model(fresh, path)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(loaded.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestTBReaderRoundtrip:
    def test_scalars_roundtrip(self, tmp_path):
        from tensorboardX import SummaryWriter

        from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

        run = "run_res_0.5_512.0_0.75_1e-08"
        w = SummaryWriter(log_dir=str(tmp_path / run))
        for i in range(5):
            w.add_scalar("lossE", 1.0 / (i + 1), global_step=i)
            w.add_scalar("diff_kl", float(i), global_step=i)
        w.close()

        reader = TensorboardReader(str(tmp_path), run)
        assert reader.exists
        df = reader.loss_e
        assert len(df) == 5
        np.testing.assert_allclose(df["value"].iloc[0], 1.0)
        assert reader.diff_kl["value"].iloc[-1] == 4.0

    def test_get_reader_by_fingerprint(self, tmp_path):
        from tensorboardX import SummaryWriter

        from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

        run = "aug16_intro_tc_res_0.5_512.0_0.75_1e-08_adam"
        w = SummaryWriter(log_dir=str(tmp_path / run))
        w.add_scalar("lossD", 2.0, global_step=0)
        w.close()
        reader = TensorboardReader.get_reader(
            str(tmp_path), "res", "0.5", "512.0", "0.75", "1e-08"
        )
        assert reader.exists
        assert reader.loss_d["value"].iloc[0] == 2.0
