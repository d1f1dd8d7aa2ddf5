"""Grouped BatchNorm + paired-pass intro step equivalence.

The paired step (solvers/intro.py, paired=True) batches the reference's
independent same-network passes (intro.py:71-135) into 2x-batch calls
with per-group BN statistics. These tests pin the two claims that make
that a pure performance transform:

1. GroupedBatchNorm(G) == G sequential flax-semantics BN calls, exactly
   (outputs, per-group normalization, sequential EMA composition).
2. The paired intro_tc step matches the unpaired (reference-order) step
   to float round-off, over multiple optimization steps.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.models.blocks import GroupedBatchNorm


def _leaves_maxdiff(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b))
    )


class TestGroupedBatchNorm:
    def _params(self, feat=5):
        return {
            "scale": jnp.abs(jax.random.normal(jax.random.key(2), (feat,))) + 0.5,
            "bias": jax.random.normal(jax.random.key(3), (feat,)),
        }

    def test_matches_flax_batchnorm_at_group_1(self):
        x = jax.random.normal(jax.random.key(0), (8, 6, 6, 5)) * 3 + 1
        ref = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-4)
        mine = GroupedBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-4)
        stats = ref.init(jax.random.key(1), x)["batch_stats"]
        p = self._params()
        yr, ur = ref.apply({"params": p, "batch_stats": stats}, x,
                           mutable=["batch_stats"])
        ym, um = mine.apply({"params": p, "batch_stats": stats}, x,
                            mutable=["batch_stats"])
        assert float(jnp.abs(yr - ym).max()) == 0.0
        assert _leaves_maxdiff(ur, um) == 0.0

    def test_matches_flax_batchnorm_eval_mode(self):
        x = jax.random.normal(jax.random.key(0), (4, 3, 3, 5))
        stats = {"mean": jnp.linspace(-1, 1, 5), "var": jnp.linspace(0.5, 2, 5)}
        p = self._params()
        ref = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-4)
        mine = GroupedBatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-4)
        yr = ref.apply({"params": p, "batch_stats": stats}, x)
        ym = mine.apply({"params": p, "batch_stats": stats}, x)
        assert float(jnp.abs(yr - ym).max()) == 0.0

    def test_group_2_equals_two_sequential_passes(self):
        mine = GroupedBatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
        p = self._params()
        stats0 = {"mean": jnp.zeros(5), "var": jnp.ones(5)}
        x = jax.random.normal(jax.random.key(5), (16, 6, 6, 5)) * 2 - 1
        y1, u1 = mine.apply({"params": p, "batch_stats": stats0}, x[:8],
                            mutable=["batch_stats"])
        y2, u2 = mine.apply({"params": p, "batch_stats": u1["batch_stats"]}, x[8:],
                            mutable=["batch_stats"])
        yg, ug = mine.apply({"params": p, "batch_stats": stats0}, x, 2,
                            mutable=["batch_stats"])
        assert float(jnp.abs(jnp.concatenate([y1, y2]) - yg).max()) == 0.0
        assert _leaves_maxdiff(u2, ug) == 0.0  # sequential EMA composition

    def test_groups_do_not_leak_across_halves(self):
        """Changing group 1's rows must not change group 0's output."""
        mine = GroupedBatchNorm(use_running_average=False)
        p = self._params()
        stats0 = {"mean": jnp.zeros(5), "var": jnp.ones(5)}
        x = jax.random.normal(jax.random.key(7), (8, 4, 4, 5))
        x2 = x.at[4:].mul(7.0)
        ya, _ = mine.apply({"params": p, "batch_stats": stats0}, x, 2,
                           mutable=["batch_stats"])
        yb, _ = mine.apply({"params": p, "batch_stats": stats0}, x2, 2,
                           mutable=["batch_stats"])
        assert float(jnp.abs(ya[:4] - yb[:4]).max()) == 0.0


@pytest.mark.parametrize("solver_name", ["intro", "intro_tc"])
@pytest.mark.slow
def test_paired_step_matches_unpaired(solver_name):
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    def build(fuse):
        ds = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 4, 4))
        kw = dict(cdim=3, zdim=16, channels=(16, 32), image_size=32)
        return make_solver(
            solver_name, dataset=ds,
            encoder=Encoder(arch="conv", **kw), decoder=Decoder(arch="conv", **kw),
            batch_size=8,
            optimizer_e=make_optimizer("adam", 2e-4),
            optimizer_d=make_optimizer("adam", 2e-4),
            beta_kl=0.5, beta_rec=0.75, beta_neg=64.0, gamma_r=1e-8,
            fuse_passes=fuse,
        ), ds

    sA, ds = build(True)
    sB, _ = build(False)
    batch0 = jnp.asarray(ds.get_batch(np.arange(8)))
    stA = sA.init_state(jax.random.key(0), batch0)
    stB = sB.init_state(jax.random.key(0), batch0)
    for i in range(3):
        b = jnp.asarray(ds.get_batch(np.arange(8 * i, 8 * i + 8) % len(ds)))
        stA, mA = sA._step_fn(stA, b)
        stB, mB = sB._step_fn(stB, b)
    for k in ("loss_enc", "loss_dec", "loss_kl", "loss_rec", "expelbo_f"):
        np.testing.assert_allclose(float(mA[k]), float(mB[k]), rtol=2e-4, atol=1e-5)
    assert _leaves_maxdiff(stA.params, stB.params) < 5e-4
    assert _leaves_maxdiff(stA.batch_stats, stB.batch_stats) < 5e-4


@pytest.mark.parametrize("paired", [True, False])
@pytest.mark.slow
def test_remat_passes_matches_plain_step(paired):
    """remat='pass' (jax.checkpoint around whole encode/decode passes,
    solvers/intro.py) is a pure memory/scheduling transform: the backward
    recomputes the same ops, so params and metrics must match the
    un-checkpointed step."""
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    def build(remat_passes):
        ds = Synthetic(image_size=16, cdim=3, sizes=(2, 2, 4, 4))
        kw = dict(cdim=3, zdim=8, channels=(4, 8), image_size=16)
        return make_solver(
            "intro", dataset=ds,
            encoder=Encoder(arch="conv", **kw), decoder=Decoder(arch="conv", **kw),
            batch_size=4,
            optimizer_e=make_optimizer("adam", 2e-4),
            optimizer_d=make_optimizer("adam", 2e-4),
            beta_kl=0.5, beta_rec=0.75, beta_neg=64.0, gamma_r=1e-8,
            fuse_passes=paired, remat_passes=remat_passes,
        ), ds

    sA, ds = build(False)
    sB, _ = build(True)
    batch0 = jnp.asarray(ds.get_batch(np.arange(4)))
    stA = sA.init_state(jax.random.key(0), batch0)
    stB = sB.init_state(jax.random.key(0), batch0)
    for i in range(2):
        b = jnp.asarray(ds.get_batch(np.arange(4 * i, 4 * i + 4) % len(ds)))
        stA, mA = sA._step_fn(stA, b)
        stB, mB = sB._step_fn(stB, b)
    for k in ("loss_enc", "loss_dec", "loss_kl", "loss_rec", "expelbo_f"):
        np.testing.assert_allclose(float(mA[k]), float(mB[k]), rtol=1e-6, atol=1e-8)
    assert _leaves_maxdiff(stA.params, stB.params) < 1e-6
    assert _leaves_maxdiff(stA.batch_stats, stB.batch_stats) < 1e-6
