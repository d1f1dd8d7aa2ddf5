"""Coverage for less-traveled surfaces: gradient-flow plotting, labeled
loader batches, prior-noise sampling, and the parity-curve harness."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.data import DeviceLoader, Synthetic
from intro_tc_vae_tpu.models import Decoder, Encoder, SoftIntroVAE
from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

SMALL = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)


def test_device_loader_include_labels():
    ds = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))
    loader = DeviceLoader(ds, batch_size=8, include_labels=True, shuffle=False)
    batch, labels = next(iter(loader))
    assert batch.shape == (8, 32, 32, 3)
    assert labels.shape == (8, 4)
    np.testing.assert_array_equal(labels, ds.latents_values[:8])


@pytest.mark.slow
def test_sample_with_noise_method():
    model = SoftIntroVAE(arch="res", **SMALL)
    variables = model.init(
        {"params": jax.random.key(0), "reparam": jax.random.key(1)},
        jnp.zeros((1, 32, 32, 3)),
    )
    out, _ = model.apply(
        variables, 4, False, mutable=["batch_stats"],
        rngs={"reparam": jax.random.key(2)},
        method=SoftIntroVAE.sample_with_noise,
    )
    assert out.shape == (4, 32, 32, 3)


@pytest.mark.slow
def test_write_gradient_flow(tmp_path):
    """The matplotlib per-layer |grad| chart (reference vae.py:215-254)."""
    from tensorboardX import SummaryWriter

    ds = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))
    writer = SummaryWriter(log_dir=str(tmp_path / "tb"))
    solver = make_solver(
        "vae", dataset=ds,
        encoder=Encoder(arch="res", **SMALL),
        decoder=Decoder(arch="res", **SMALL),
        batch_size=4,
        optimizer_e=make_optimizer("adam", 1e-3),
        optimizer_d=make_optimizer("adam", 1e-3),
        writer=writer,
        test_iter=1,
    )
    batch = jnp.asarray(ds.get_batch(np.arange(4)))
    state = solver.init_state(jax.random.key(0), batch)
    solver.write_gradient_flow(state, batch, cur_iter=1)
    writer.close()
    # an image (the figure) must have been logged
    from intro_tc_vae_tpu.utils.tb_reader import TagConverter

    run = tmp_path / "tb"
    events = [f for f in os.listdir(run) if f.startswith("events")]
    assert events
    tc = TagConverter(run, events_file=events[0])
    assert tc.ea.Tags()["images"], "gradient_flow figure not logged"


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
@pytest.mark.skipif(
    not os.environ.get("ITCVAE_SLOW_TESTS"),
    reason="~9 min subprocess run; set ITCVAE_SLOW_TESTS=1 (verified passing)",
)
def test_parity_curves_harness_smoke(tmp_path):
    """10-step side-by-side run of the loss-curve parity harness."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "analysis/parity_curves.py", "--solver", "vae",
         "--steps", "10", "--out", str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert (tmp_path / "summary_vae.json").exists()
    import json

    summary = json.loads((tmp_path / "summary_vae.json").read_text())
    # same weights + deterministic-ish early steps: curves must be close
    assert summary["loss_rec"]["max_rel_gap_smoothed"] < 0.2


def test_scaling_comms_hlo_parser():
    """audit_hlo_text counts collectives and payload bytes from optimized
    HLO text (analysis/scaling_comms.py — the ICI-traffic audit)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from analysis.scaling_comms import audit_hlo_text

    hlo = """
  %add.1 = f32[64,128]{1,0} add(%a, %b)
  ROOT %ar = f32[64,128]{1,0} all-reduce(%add.1), replica_groups={}
  %ars = (f32[8]{0}, f32[8]{0}, u32[]) all-reduce-start(%x)
  %ard = f32[8]{0} all-reduce-done(%ars)
  %ag = bf16[16,32]{1,0} all-gather(%p), dimensions={0}
  %cp = u8[10]{0} collective-permute(%q)
"""
    r = audit_hlo_text(hlo)
    # one sync all-reduce on a ROOT line (64*128*4) + one async pair counted
    # once via the -done result (8*4) — the -start tuple aliases the operand
    # and scratch, which must NOT be double-counted
    assert r["all-reduce"]["count"] == 2
    assert r["all-reduce"]["bytes"] == 64 * 128 * 4 + 8 * 4
    assert r["all-gather"] == {"count": 1, "bytes": 16 * 32 * 2}
    assert r["collective-permute"] == {"count": 1, "bytes": 10}
    assert r["total_bytes"] == sum(
        r[k]["bytes"] for k in ("all-reduce", "all-gather", "reduce-scatter",
                                "collective-permute", "all-to-all"))


@pytest.mark.slow
def test_scaling_comms_audit_invariants():
    """The compiled intro_tc step's collective traffic (8-device virtual
    mesh, tiny shapes): DP grad sync moves at least the parameter bytes;
    TP adds all-gather activation traffic; totals are sane."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from analysis.scaling_comms import _run_child

    r = _run_child(8, tiny=True, phases=("dp8", "tp2_dp4"))
    dp, tp = r["dp8"], r["tp2_dp4"]
    # the two grad phases must all-reduce every param at least once
    assert dp["all-reduce"]["bytes"] >= dp["param_bytes"]
    # tensor parallelism pays activation all-gathers DP does not
    assert tp["all-gather"]["bytes"] > 10 * dp["all-gather"]["bytes"]
