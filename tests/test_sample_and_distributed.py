"""Sample CLI + distributed helpers + anomaly mode."""

import os

import jax
import numpy as np
import pytest

from intro_tc_vae_tpu.sample import sample_grid


class TestSampleGrid:
    def test_grid_layout(self):
        imgs = np.stack([np.full((4, 4, 3), i / 10.0, np.float32) for i in range(6)])
        grid = sample_grid(imgs, cols=3)
        assert grid.shape == (8, 12, 3)
        assert grid[0, 0, 0] == pytest.approx(0.0)
        assert grid[4, 0, 0] == pytest.approx(0.3)  # second row starts at img 3

    def test_partial_last_row_zero_padded(self):
        imgs = np.ones((5, 2, 2, 1), np.float32)
        grid = sample_grid(imgs, cols=4)
        assert grid.shape == (4, 8, 1)
        assert grid[2:, 2:, 0].sum() == 0.0  # empty cells stay black


def test_sample_cli_end_to_end(tmp_path):
    """Train 1 epoch, checkpoint, then run the sample CLI on it."""
    from intro_tc_vae_tpu.config import Config
    from intro_tc_vae_tpu.sample import main as sample_main
    from intro_tc_vae_tpu.train import train_soft_intro_vae

    ckpt_dir = tmp_path / "saves"
    config = Config(
        solver="vae", dataset="synthetic_small", batch_size=16, num_epochs=1,
        seed=3, z_dim=8, save_interval=1000, checkpoint_dir=str(ckpt_dir),
        data_parallel=1,
    )
    train_soft_intro_vae(config)
    ckpts = os.listdir(ckpt_dir)
    assert ckpts
    out = tmp_path / "grid.png"
    sample_main([
        "--checkpoint", str(ckpt_dir / ckpts[0]),
        "--dataset", "synthetic_small", "--arch", "res", "--z-dim", "8",
        "--num", "4", "--reconstruct", "--out", str(out),
    ])
    assert out.exists() and out.stat().st_size > 0


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path):
    """Train 1 epoch, checkpoint, then score it with the eval CLI: all
    four disentanglement families + encoder-FID on the tiny synthetic."""
    from intro_tc_vae_tpu.config import Config
    from intro_tc_vae_tpu.evaluate import main as eval_main
    from intro_tc_vae_tpu.train import train_soft_intro_vae

    ckpt_dir = tmp_path / "saves"
    config = Config(
        solver="vae", dataset="synthetic_small", batch_size=16, num_epochs=1,
        seed=3, z_dim=8, save_interval=1000, checkpoint_dir=str(ckpt_dir),
        data_parallel=1,
    )
    train_soft_intro_vae(config)
    ckpt = os.path.join(ckpt_dir, os.listdir(ckpt_dir)[0])
    out = tmp_path / "scores.json"
    results = eval_main([
        "--checkpoint", ckpt, "--dataset", "synthetic_small", "--arch", "res",
        "--z-dim", "8", "--batch", "16", "--num-samples", "32",
        "--fid", "--fid-samples", "32", "--out", str(out),
    ])
    assert out.exists()
    # every family reported a number (or a recorded degenerate-draw error)
    assert any(k.startswith("mig") for k in results)
    assert any(k.startswith("dci") for k in results)
    assert isinstance(results["fid_encoder_features"], float)
    assert np.isfinite(results["fid_encoder_features"])


class TestDistributed:
    def test_single_process_noop(self):
        from intro_tc_vae_tpu.parallel import initialize_distributed

        assert initialize_distributed() is False

    def test_local_batch_slice_single_process(self):
        from intro_tc_vae_tpu.parallel import local_batch_slice

        s = local_batch_slice(64)
        assert (s.start, s.stop) == (0, 64)


def test_anomaly_detection_mode():
    """jax_debug_nans raises at NaN production inside jit."""
    from intro_tc_vae_tpu.utils.nan import enable_anomaly_detection

    try:
        enable_anomaly_detection()
        with pytest.raises(FloatingPointError):
            jax.jit(lambda x: jax.numpy.log(x))(jax.numpy.zeros(4) - 1.0).block_until_ready()
    finally:
        jax.config.update("jax_debug_nans", False)
