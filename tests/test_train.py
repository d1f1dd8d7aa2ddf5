"""End-to-end train-loop smoke tests.

Follows the reference's pattern (tests/test_train.py: full 1-epoch train
on a 5-image Ukiyo-E fixture) but against the current API, on both the
bundled fixture and the synthetic dataset, with checkpointing exercised.
"""

import json
import os

import numpy as np
import pytest

from intro_tc_vae_tpu.config import Config, load_config
from intro_tc_vae_tpu.train import train_soft_intro_vae

pytestmark = pytest.mark.slow  # heavy tier: parity/e2e (see pyproject markers)

DATA_DIR = os.path.join(os.path.dirname(__file__), "test_data")


def small_config(tmp_path, **overrides) -> Config:
    base = dict(
        solver="vae",
        dataset="ukiyo_e64",
        arch="res",
        optimizer="adagrad",
        lr=2e-4,
        batch_size=3,
        num_epochs=1,
        seed=99,
        z_dim=32,
        beta_kl=1.0,
        beta_rec=1.0,
        use_tensorboard=False,
        num_workers=1,
        save_interval=100,
        test_iter=5000,
        data_root=DATA_DIR,
        checkpoint_dir=str(tmp_path / "saves"),
        data_parallel=1,  # multi-device paths are covered by test_parallel
    )
    base.update(overrides)
    return Config(**base)


def test_train_one_epoch_ukiyo_fixture(tmp_path):
    """Full train loop on the 5-image fixture (reference test_train.py
    pattern: batch 3, z 32, 1 epoch)."""
    config = small_config(tmp_path)
    state = train_soft_intro_vae(config)
    assert int(state.step) == 1  # 5 images, batch 3, drop_last -> 1 step
    # final-epoch checkpoint written with the hparam fingerprint
    saves = os.listdir(config.checkpoint_dir)
    assert any("vae_ukiyo_e64_betas_1.0" in s and "epoch_0" in s for s in saves)


@pytest.mark.parametrize("solver", ["tc", "intro_tc"])
def test_train_one_epoch_synthetic(tmp_path, solver):
    config = small_config(
        tmp_path,
        solver=solver,
        dataset="synthetic_small",
        batch_size=16,
        z_dim=8,
        beta_neg=16.0,
        save_interval=1000,
    )
    state = train_soft_intro_vae(config)
    assert int(state.step) == 64 // 16  # 64 images, batch 16 -> 4 steps


def test_train_with_tensorboard_writes_everything(tmp_path):
    """Writer path end-to-end: per-step scalars, image grids, and the four
    disentanglement metric families (test_iter hit at iter 0)."""
    config = small_config(
        tmp_path,
        solver="vae",
        dataset="synthetic_small",
        batch_size=16,
        z_dim=8,
        use_tensorboard=True,
        test_iter=2,
        log_dir=str(tmp_path / "runs" / "tb"),
        save_interval=1000,
        kl_kind="tc_full",  # exercise the tc_decomp/{mi,tc,kl} tags (Q11)
    )
    train_soft_intro_vae(config)

    from intro_tc_vae_tpu.utils.tb_reader import TensorboardReader

    import time

    run_dirs = list((tmp_path / "runs").iterdir())
    assert run_dirs, "no TB run directory written"
    run = run_dirs[0]
    time.sleep(0.5)  # tensorboardX sub-writers flush asynchronously
    reader = TensorboardReader(str(tmp_path / "runs"), run.name)

    # base event: per-step scalars + MIG + reconstruction images
    base_tags = reader.base_event.scalar_tags
    for expected in ("kl_loss_unscaled", "fc_grad_norm", "mig_score"):
        assert expected in base_tags, f"missing base tag {expected}: {base_tags}"
    assert len(reader.reconstructions) > 0, "no reconstruction images logged"
    assert len(reader.mig_score) > 0

    # add_scalars families live in sub-runs; tb_reader's typed accessors
    # must find them
    # ring-buffered writes must still land EVERY step's scalars at its own
    # global_step (64 imgs / batch 16 = 4 steps; drained by flush_writes)
    assert len(reader.r_loss_scaled) == 4
    assert len(reader.kl_loss_scaled) == 4
    assert sorted(reader.r_loss_scaled["step"]) == [0, 1, 2, 3]
    # full-decomposition observability (reference solvers/tc.py:129-139)
    assert len(reader.tc_decomp_mi) > 0
    assert len(reader.tc_decomp_tc) > 0
    assert len(reader.tc_decomp_kl) > 0
    assert len(reader.dci_completeness_score) > 0
    assert len(reader.modularity_score) > 0
    # bvae can legitimately skip on degenerate single-class draws with a
    # 32-sample eval set; presence is informational here
    try:
        assert len(reader.bvae_score) > 0
    except Exception:
        print("bvae_score skipped on this draw (degenerate labels)")

    # hparams table written at the end of training (reference train.py:244)
    hparams, metric_dict = reader.hparams
    assert hparams.get("solver") is not None
    assert metric_dict  # final-epoch mean losses


def test_load_config_merge(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"solver": "vae", "dataset": "synthetic", "lr": 1e-3}))
    c = load_config(str(p), {"lr": 5e-4, "batch_size": 8})
    assert c.solver == "vae" and c.lr == 5e-4 and c.batch_size == 8
    assert c.arch == "res"  # default preserved


def test_load_config_unknown_key(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"solver": "vae", "bogus_knob": 1}))
    with pytest.raises(ValueError, match="bogus_knob"):
        load_config(str(p), {})


def test_load_config_invalid_remat_value():
    """A typo'd remat value must raise, not silently disable all remat
    (round-3 advisor finding)."""
    for bad in ("passes", "Block", "true"):
        with pytest.raises(ValueError, match="remat"):
            load_config(None, {"solver": "vae", "dataset": "synthetic",
                               "remat": bad})
    for ok in (False, True, "block", "pass"):
        c = load_config(None, {"solver": "vae", "dataset": "synthetic",
                               "remat": ok})
        assert c.remat == ok


def test_remat_pass_falls_back_to_block_for_single_phase_solver(tmp_path, capsys):
    """remat='pass' has no pass structure in vae/tc; train must fall back to
    per-block remat (with a printed notice) rather than silently run with
    no rematerialization at all (round-3 advisor finding)."""
    config = small_config(
        tmp_path, dataset="synthetic", batch_size=8, remat="pass",
        num_epochs=1, seed=7,
    )
    train_soft_intro_vae(config)
    out = capsys.readouterr().out
    assert "falling back to per-block rematerialization" in out


def test_fingerprint_format():
    c = Config(solver="intro-tc", dataset="ukiyo_e64", z_dim=128,
               beta_kl=0.5, beta_neg=512.0, beta_rec=0.75)
    fp = c.fingerprint()
    assert fp == ("intro-tc_ukiyo_e64_betas_0.5_512.0_0.75_1e-08_zdim_128_res_adam")


def test_tpu_knobs_accepted_and_resolved():
    """The round-3 TPU knobs round-trip through the config system and the
    auto resolvers keep the defaults inert (tile_rows auto -> 0)."""
    from intro_tc_vae_tpu.models.vae import resolve_tile_rows

    c = load_config(None, {"solver": "vae", "dataset": "synthetic",
                           "remat": True, "tile_rows": 32})
    assert c.remat is True and c.tile_rows == 32
    base = Config(solver="vae", dataset="synthetic")
    # new knobs must not disturb the reference-compatible fingerprint
    assert c.fingerprint() == base.fingerprint()
    assert resolve_tile_rows(-1, 64) == 0
    assert resolve_tile_rows(-1, 256) == 0  # auto is off until a win exists
    assert resolve_tile_rows(64, 256) == 64


def test_resolve_fuse_passes_uses_per_device_batch():
    """The pairing auto mode keys on the PER-DEVICE batch: a global batch
    that crosses the single-chip crossover still pairs when sharded thin
    over the data axis (crossover measured in BENCHMARKS.md)."""
    from intro_tc_vae_tpu.train import resolve_fuse_passes

    assert resolve_fuse_passes(None, 64, 1) is True     # below crossover
    assert resolve_fuse_passes(None, 128, 1) is False   # at/above it
    assert resolve_fuse_passes(None, 256, 8) is True    # 32/chip under DP8
    assert resolve_fuse_passes(None, 1024, 8) is False  # 128/chip
    assert resolve_fuse_passes(True, 1024, 8) is True   # explicit wins
    assert resolve_fuse_passes(False, 64, 1) is False
