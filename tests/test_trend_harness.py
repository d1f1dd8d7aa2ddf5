"""Smoke tests for the config-5 metric-trend harness (VERDICT r4 #2).

``analysis/eval_config5_trend.py`` is the committed-artifact generator
for the in-training metric-trajectory study (the reference logs all
four disentanglement families every ``test_iter`` throughout training,
reference solvers/vae.py:188-213). Analysis harnesses that never run
in CI bit-rot, so this drives the full script end-to-end on a tiny
horizon and pins the artifact schema, plus a unit test for the
fixed-feature-space helper it relies on.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_trend_harness_end_to_end(tmp_path):
    out = str(tmp_path / "trend")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    res = subprocess.run(
        [sys.executable, os.path.join(_REPO, "analysis", "eval_config5_trend.py"),
         "--steps", "4", "--eval-points", "1", "--batch", "8",
         "--num-samples", "96", "--dataset", "synthetic_small", "--out", out],
        capture_output=True, text=True, timeout=900, env=env)
    assert res.returncode == 0, res.stderr[-3000:]

    with open(out + ".json") as f:
        results = json.load(f)
    points = results["points"]
    assert [p["step"] for p in points] == [0, 4]
    for p in points:
        for key in ("bvae_score", "dci_disentanglement", "mig_score",
                    "modularity", "explicitness", "fid_final_encoder"):
            assert key in p, (key, p)
            assert np.isfinite(p[key])
    # training points carry loss values; FID is in the FINAL encoder's
    # fixed feature space so the final checkpoint's own samples score low
    assert "loss_rec" in points[-1]
    assert os.path.exists(out + ".png")


def test_encoder_features_fixed_space():
    """encoder_features: eval-mode BN, [N, zdim], deterministic."""
    import jax
    import jax.numpy as jnp

    from intro_tc_vae_tpu.data import load_dataset
    from intro_tc_vae_tpu.evaluation.fid import encoder_features
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    dataset, image_size, channels, cdim = load_dataset("synthetic_small")
    kwargs = dict(cdim=cdim, zdim=8, channels=tuple(channels),
                  image_size=image_size)
    solver = make_solver(
        "vae", dataset=dataset,
        encoder=Encoder(arch="conv", **kwargs),
        decoder=Decoder(arch="conv", **kwargs),
        batch_size=4,
        optimizer_e=make_optimizer("adam", 1e-4),
        optimizer_d=make_optimizer("adam", 1e-4),
    )
    batch0 = jnp.asarray(dataset.get_batch(np.arange(4)))
    state = solver.init_state(jax.random.key(0), batch0)

    images = dataset.get_batch(np.arange(10))
    f1 = encoder_features(solver, state, images, batch_size=4)
    f2 = encoder_features(solver, state, images, batch_size=3)
    assert f1.shape == (10, 8)
    assert np.isfinite(f1).all()
    # batch-size independent => BN must be in eval mode (fixed stats)
    np.testing.assert_allclose(f1, f2, rtol=1e-5, atol=1e-5)
