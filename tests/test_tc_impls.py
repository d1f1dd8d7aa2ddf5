"""TC implementation equivalence: xla vs blockwise vs pallas (interpret on
CPU), values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu import ops
from intro_tc_vae_tpu.ops.tc import tc_logsumexp_blockwise
from intro_tc_vae_tpu.ops import tc_pallas


@pytest.fixture
def inputs(rng):
    b, zdim = 32, 16
    z = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
    mu = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
    logvar = jnp.asarray((rng.randn(b, zdim) * 0.7).astype(np.float32))
    return z, mu, logvar


N = 5000


class TestBlockwise:
    @pytest.mark.parametrize("block", [8, 16, 32])
    def test_matches_xla(self, inputs, block):
        z, mu, logvar = inputs
        pm_ref, qz_ref = ops.minibatch_stratified_sampling(
            ops.gaussian_log_density_nll(
                z[:, None, :], mu[None, :, :], logvar[:, None, :]
            ), z.shape[0], N,
        )
        pm, qz = tc_logsumexp_blockwise(z, mu, logvar, N, block=block)
        np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(qz), np.asarray(qz_ref), rtol=1e-5, atol=1e-4)

    def test_grads_match_xla(self, inputs):
        z, mu, logvar = inputs

        def tc_xla(*a):
            return ops.total_correlation(*a, N, impl="xla")

        def tc_blk(*a):
            return ops.total_correlation(*a, N, impl="blockwise")

        g_ref = jax.grad(tc_xla, argnums=(0, 1, 2))(z, mu, logvar)
        g_blk = jax.grad(tc_blk, argnums=(0, 1, 2))(z, mu, logvar)
        for a, b in zip(g_ref, g_blk):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)

    def test_non_divisible_batch_falls_back(self, rng):
        z = jnp.asarray(rng.randn(24, 4).astype(np.float32))
        pm, qz = tc_logsumexp_blockwise(z, z, z * 0.1, N, block=128)
        assert pm.shape == (24,) and qz.shape == (24,)
        assert np.isfinite(np.asarray(pm)).all()


class TestShardedGlobalBatch:
    """Global-batch TC under a DP8 mesh (SURVEY §5.7): the sharded scaling
    impls must reproduce the single-device estimator on the concatenated
    batch — values and gradients (the all_gather transpose carries the
    cross-chip dmu reduction)."""

    def _mesh(self):
        from intro_tc_vae_tpu.parallel import make_mesh

        return make_mesh(8)

    def test_blockwise_sharded_matches_xla(self, inputs):
        z, mu, logvar = inputs
        mesh = self._mesh()

        ref = ops.total_correlation(z, mu, logvar, N, impl="xla")
        tc = ops.total_correlation_sharded(
            z, mu, logvar, N, mesh, impl="blockwise"
        )
        np.testing.assert_allclose(float(tc), float(ref), rtol=1e-5, atol=1e-5)

        per_sample = ops.total_correlation_sharded(
            z, mu, logvar, N, mesh, impl="blockwise", reduce="none"
        )
        per_ref = ops.total_correlation(z, mu, logvar, N, impl="xla",
                                        reduce="none")
        np.testing.assert_allclose(np.asarray(per_sample), np.asarray(per_ref),
                                   rtol=1e-5, atol=1e-4)

    def test_blockwise_sharded_grads_match_xla(self, inputs):
        z, mu, logvar = inputs
        mesh = self._mesh()

        g_ref = jax.grad(
            lambda *a: ops.total_correlation(*a, N, impl="xla"),
            argnums=(0, 1, 2),
        )(z, mu, logvar)
        g_sh = jax.grad(
            lambda *a: ops.total_correlation_sharded(*a, N, mesh,
                                                     impl="blockwise"),
            argnums=(0, 1, 2),
        )(z, mu, logvar)
        for a, b in zip(g_ref, g_sh):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_pallas_sharded_matches_xla(self, inputs):
        from jax.experimental.pallas import tpu as pltpu

        z, mu, logvar = inputs
        mesh = self._mesh()

        ref = ops.total_correlation(z, mu, logvar, N, impl="xla")
        g_ref = jax.grad(
            lambda *a: ops.total_correlation(*a, N, impl="xla"),
            argnums=(0, 1, 2),
        )(z, mu, logvar)

        with pltpu.force_tpu_interpret_mode():
            tc = ops.total_correlation_sharded(
                z, mu, logvar, N, mesh, impl="pallas"
            )
            g_pal = jax.grad(
                lambda *a: ops.total_correlation_sharded(*a, N, mesh,
                                                         impl="pallas"),
                argnums=(0, 1, 2),
            )(z, mu, logvar)
        np.testing.assert_allclose(float(tc), float(ref), rtol=1e-5, atol=1e-5)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_dispatch_from_total_correlation(self, inputs):
        """ops.total_correlation(mesh=...) routes scaling impls through the
        sharded path (what solvers do via SolverHyper.tc_mesh)."""
        z, mu, logvar = inputs
        mesh = self._mesh()
        ref = ops.total_correlation(z, mu, logvar, N, impl="xla")
        tc = ops.total_correlation(z, mu, logvar, N, impl="blockwise",
                                   mesh=mesh)
        np.testing.assert_allclose(float(tc), float(ref), rtol=1e-5)


class TestPallasInterpret:
    """Pallas kernel in interpreter mode (CPU) — numerics vs XLA path."""

    def test_forward_matches_xla(self, inputs):
        z, mu, logvar = inputs
        pm_ref, qz_ref = tc_logsumexp_blockwise(z, mu, logvar, N)
        pm, qz = tc_pallas._tc_pallas_raw(z, mu, logvar, N, interpret=True)
        np.testing.assert_allclose(np.asarray(pm), np.asarray(pm_ref), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(qz), np.asarray(qz_ref), rtol=1e-5, atol=1e-4)

    def test_tile_picker(self):
        from intro_tc_vae_tpu.ops.tc_pallas import _pick_tiles

        assert _pick_tiles(256, 128) == (32, 128)
        tj, ti = _pick_tiles(64, 128)
        assert 64 % tj == 0 and 64 % ti == 0
        # VMEM budget shrinks the j-tile for wide latents (floor tj=8,
        # the fp32 sublane minimum)
        assert _pick_tiles(256, 1024)[0] == 8
        assert _pick_tiles(256, 256)[0] == 16

    def test_fused_backward_matches_xla_grads(self, inputs):
        """Custom-VJP Pallas backward kernels vs XLA autodiff grads."""
        from jax.experimental.pallas import tpu as pltpu

        z, mu, logvar = inputs
        # include values that exercise the -50 clamp + var floor masks
        logvar = logvar * 4.0

        def tc_from(pm_qz):
            pm, qz = pm_qz
            return jnp.mean(qz - pm) + 0.5 * jnp.sum(pm) * 1e-3

        def f_xla(a, m, l):
            lp = ops.gaussian_log_density_nll(
                a[:, None, :], m[None, :, :], l[:, None, :]
            )
            return tc_from(ops.minibatch_stratified_sampling(lp, a.shape[0], N))

        g_ref = jax.grad(f_xla, argnums=(0, 1, 2))(z, mu, logvar)

        with pltpu.force_tpu_interpret_mode():
            g_pal = jax.grad(
                lambda a, m, l: tc_from(tc_pallas.tc_logsumexp_pallas(a, m, l, N)),
                argnums=(0, 1, 2),
            )(z, mu, logvar)

        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)
