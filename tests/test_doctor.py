"""itcvae-doctor preflight: corpus layout / weights / config checks must
pass on valid inputs and print an exact fix (and exit 1) on broken ones
(reference dataset.py:40-129, :131-162, :207-288 load-time assumptions)."""

import json
import os

import numpy as np
import pytest

from intro_tc_vae_tpu.doctor import main as doctor_main

TEST_DATA = os.path.join(os.path.dirname(__file__), "test_data")


def _argv(update: dict, *extra: str):
    return ["-u", json.dumps(update), *extra]


def test_synthetic_config_passes(tmp_path, capsys):
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "synthetic",
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "result: PASS" in out
    # missing inception weights is a WARN by default, not a FAIL
    assert "WARN  weights file" in out


def test_fid_flag_makes_missing_weights_fatal(tmp_path, capsys, monkeypatch):
    monkeypatch.delenv("ITCVAE_INCEPTION_WEIGHTS", raising=False)
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "synthetic",
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }, "--fid", "--inception-weights", str(tmp_path / "nope.pth")))
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  weights file" in out


def test_invalid_config_fails_fast(capsys):
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "synthetic", "remat": "Block",
    }))
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  config" in out


def test_dsprites_npz_valid_and_invalid(tmp_path, capsys):
    # schema-correct (tiny) archive: keys + ndims match the loader, row
    # count differs from the full corpus -> PASS with a row-count WARN
    good = tmp_path / "good"
    good.mkdir()
    np.savez(
        good / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
        imgs=np.zeros((4, 64, 64), np.uint8),
        latents_values=np.zeros((4, 6), np.float64),
    )
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "dsprites", "data_root": str(good),
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "WARN  dSprites row count" in out

    # wrong keys (a repacked archive) -> FAIL naming the missing key
    bad = tmp_path / "bad"
    bad.mkdir()
    np.savez(
        bad / "dsprites_ndarray_co1sh3sc6or40x32y32_64x64.npz",
        images=np.zeros((4, 64, 64), np.uint8),
    )
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "dsprites", "data_root": str(bad),
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  dSprites key 'imgs'" in out

    # absent archive -> FAIL with the download fix
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "dsprites", "data_root": str(tmp_path),
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  dSprites archive" in out


def test_mpi3d_wrong_ndim_fails(tmp_path, capsys):
    np.savez(tmp_path / "mpi3d_toy.npz", images=np.zeros((4, 64, 64), np.uint8))
    rc = doctor_main(_argv({
        "solver": "vae", "dataset": "mpi3d", "data_root": str(tmp_path),
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  MPI3D key 'images'" in out and "ndim" in out


def test_ukiyoe_fixture_passes(tmp_path, capsys):
    rc = doctor_main(_argv({
        "solver": "intro", "dataset": "ukiyo_e64", "data_root": TEST_DATA,
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "Ukiyo-E metadata" in out
    assert "Ukiyo-E decode probe" in out


def test_ukiyoe_missing_images_dir_fails(tmp_path, capsys):
    import shutil

    root = tmp_path / "root"
    root.mkdir()
    shutil.copy(os.path.join(TEST_DATA, "arc_extracted_face_metadata.csv"), root)
    rc = doctor_main(_argv({
        "solver": "intro", "dataset": "ukiyo_e64", "data_root": str(root),
        "checkpoint_dir": str(tmp_path / "ck"), "log_dir": str(tmp_path / "tb"),
    }))
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL  Ukiyo-E images" in out


@pytest.mark.slow
class TestInceptionWeightsCheck:
    def test_roundtrip_state_dict_passes_and_junk_fails(self, tmp_path, capsys):
        """A torch-format state_dict with the exact inception_v3 trunk
        layout must PASS the structural check; a junk state_dict must
        FAIL naming what's missing."""
        import torch
        from tests.test_fid import TestInceptionV3

        import jax
        import jax.numpy as jnp

        from intro_tc_vae_tpu.models.inception import InceptionV3Features

        model = InceptionV3Features(resize_input=False)
        variables = model.init(jax.random.key(0), jnp.zeros((1, 299, 299, 3)))
        sd = TestInceptionV3._flax_to_torch_sd(
            None, variables["params"], variables["batch_stats"]
        )
        good = tmp_path / "inception.pth"
        torch.save(sd, good)
        rc = doctor_main(_argv(
            {"solver": "vae", "dataset": "synthetic",
             "checkpoint_dir": str(tmp_path / "ck"),
             "log_dir": str(tmp_path / "tb")},
            "--inception-weights", str(good), "--fid",
        ))
        out = capsys.readouterr().out
        assert rc == 0, out
        assert "PASS  weights structure" in out

        junk = tmp_path / "junk.pth"
        torch.save({"Conv2d_1a_3x3.conv.weight": torch.zeros(32, 3, 3, 3)}, junk)
        rc = doctor_main(_argv(
            {"solver": "vae", "dataset": "synthetic",
             "checkpoint_dir": str(tmp_path / "ck"),
             "log_dir": str(tmp_path / "tb")},
            "--inception-weights", str(junk),
        ))
        out = capsys.readouterr().out
        assert rc == 1
        assert "FAIL  weights structure" in out and "missing params" in out
