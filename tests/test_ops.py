"""Golden-value tests for ops against the reference formulas.

The expected values are computed with torch (CPU) by writing out the
reference's formulas (/root/reference/ops.py) — including its quirks:
gaussian_nll variance floor eps=1e-4, log-prob clamp at -50, and the
column-structured stratified importance-weight matrix.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from intro_tc_vae_tpu import ops

ATOL = 1e-5


# ---------------------------------------------------------------------------
# torch golden implementations of the reference formulas
# ---------------------------------------------------------------------------

def torch_gaussian_log_density_nll(x, mu, logvar):
    var = torch.exp(logvar)
    log_prob = -F.gaussian_nll_loss(x, mu, var, reduction="none", eps=1e-4, full=True)
    return torch.clamp(log_prob, min=-50)


def torch_log_iw_matrix(batch_size, dataset_size):
    n, m = dataset_size, batch_size - 1
    strat_weight = (n - m) / (n * m)
    w = torch.Tensor(batch_size, batch_size).fill_(1 / m)
    w.view(-1)[:: m + 1] = 1 / n
    w.view(-1)[1 :: m + 1] = strat_weight
    w[m - 1, 0] = strat_weight
    return w.log()


def torch_total_correlation(z, mu, logvar, dataset_size, reduce="mean"):
    b = z.size(0)
    log_qz_prob = torch_gaussian_log_density_nll(
        z.unsqueeze(1), mu.unsqueeze(0), logvar.unsqueeze(1)
    )
    log_iw = torch_log_iw_matrix(b, dataset_size)
    logqz_prodmarginals = torch.logsumexp(
        log_iw.view(b, b, 1) + log_qz_prob, dim=1
    ).sum(dim=1)
    log_qz = torch.logsumexp(log_iw + log_qz_prob.sum(dim=2), dim=1)
    tc = log_qz - logqz_prodmarginals
    return tc.mean() if reduce == "mean" else tc


# ---------------------------------------------------------------------------
# reconstruction_loss
# ---------------------------------------------------------------------------

class TestReconstructionLoss:
    def test_mse_hand_computed(self):
        x = jnp.array([[0.0, 1.0], [2.0, 3.0]])
        r = jnp.array([[1.0, 1.0], [0.0, 0.0]])
        # per-sample: [1, 13]
        assert ops.reconstruction_loss(x, r, "mse", "sum") == pytest.approx(14.0)
        assert ops.reconstruction_loss(x, r, "mse", "mean") == pytest.approx(7.0)
        np.testing.assert_allclose(
            ops.reconstruction_loss(x, r, "mse", "none"), [1.0, 13.0]
        )

    def test_l1_hand_computed(self):
        x = jnp.array([[0.0, 1.0], [2.0, 3.0]])
        r = jnp.array([[1.0, 1.0], [0.0, 0.0]])
        np.testing.assert_allclose(
            ops.reconstruction_loss(x, r, "l1", "none"), [1.0, 5.0]
        )

    @pytest.mark.parametrize("loss_type", ["mse", "l1", "bce"])
    @pytest.mark.parametrize("reduction", ["sum", "mean", "none"])
    def test_vs_torch(self, rng, loss_type, reduction):
        x = rng.rand(4, 3, 8, 8).astype(np.float32)
        r = np.clip(rng.rand(4, 3, 8, 8).astype(np.float32), 1e-6, 1 - 1e-6)
        got = ops.reconstruction_loss(jnp.asarray(x), jnp.asarray(r), loss_type, reduction)

        xt, rt = torch.from_numpy(x).view(4, -1), torch.from_numpy(r).view(4, -1)
        fn = {"mse": F.mse_loss, "l1": F.l1_loss, "bce": F.binary_cross_entropy}[loss_type]
        err = fn(rt, xt, reduction="none").sum(1)
        want = {"sum": err.sum(), "mean": err.mean(), "none": err}[reduction].numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)

    def test_gradient_does_not_flow_to_target(self):
        x = jnp.ones((2, 4))
        r = jnp.full((2, 4), 0.5)
        gx = jax.grad(lambda a: ops.reconstruction_loss(a, r, "mse", "sum"))(x)
        np.testing.assert_allclose(gx, np.zeros_like(gx))
        gr = jax.grad(lambda a: ops.reconstruction_loss(x, a, "mse", "sum"))(r)
        assert np.abs(np.asarray(gr)).sum() > 0


# ---------------------------------------------------------------------------
# kl_divergence / reparameterize
# ---------------------------------------------------------------------------

class TestKL:
    @pytest.mark.parametrize("reduce", ["sum", "mean", "none"])
    def test_vs_torch(self, rng, reduce):
        mu = rng.randn(8, 16).astype(np.float32)
        logvar = rng.randn(8, 16).astype(np.float32)
        got = ops.kl_divergence(jnp.asarray(logvar), jnp.asarray(mu), reduce=reduce)

        lt, mt = torch.from_numpy(logvar), torch.from_numpy(mu)
        kl = -0.5 * (1 + lt - lt.exp() - mt.pow(2)).sum(1)
        want = {"sum": kl.sum(), "mean": kl.mean(), "none": kl}[reduce].numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=ATOL)

    def test_standard_normal_is_zero(self):
        z = jnp.zeros((4, 8))
        assert ops.kl_divergence(z, z) == pytest.approx(0.0)


class TestReparameterize:
    def test_shape_and_determinism(self):
        key = jax.random.key(0)
        mu = jnp.zeros((8, 4))
        logvar = jnp.zeros((8, 4))
        z1 = ops.reparameterize(key, mu, logvar)
        z2 = ops.reparameterize(key, mu, logvar)
        assert z1.shape == (8, 4)
        np.testing.assert_array_equal(z1, z2)

    def test_zero_variance_returns_mu(self):
        key = jax.random.key(0)
        mu = jnp.arange(8.0).reshape(2, 4)
        z = ops.reparameterize(key, mu, jnp.full((2, 4), -1e9))
        np.testing.assert_allclose(z, mu, atol=1e-6)


# ---------------------------------------------------------------------------
# gaussian densities + importance weights
# ---------------------------------------------------------------------------

class TestDensity:
    def test_nll_variant_vs_torch(self, rng):
        x = rng.randn(16, 8).astype(np.float32)
        mu = rng.randn(16, 8).astype(np.float32)
        logvar = (rng.randn(16, 8) * 4).astype(np.float32)  # exercises the var floor
        got = ops.gaussian_log_density_nll(
            jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar)
        )
        want = torch_gaussian_log_density_nll(
            torch.from_numpy(x), torch.from_numpy(mu), torch.from_numpy(logvar)
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_plain_variant_vs_torch(self, rng):
        x = rng.randn(16, 8).astype(np.float32)
        mu = rng.randn(16, 8).astype(np.float32)
        logvar = rng.randn(16, 8).astype(np.float32)
        got = ops.gaussian_log_density(jnp.asarray(x), jnp.asarray(mu), jnp.asarray(logvar))
        norm = math.log(2 * math.pi)
        want = np.maximum(
            -0.5 * ((x - mu) ** 2 * np.exp(-logvar) + logvar + norm), -50.0
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=ATOL)

    @pytest.mark.parametrize("batch,n", [(5, 100), (64, 10000), (3, 7)])
    def test_log_iw_matrix_vs_torch(self, batch, n):
        got = ops.log_importance_weight_matrix(batch, n)
        want = torch_log_iw_matrix(batch, n).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=ATOL)


# ---------------------------------------------------------------------------
# total correlation
# ---------------------------------------------------------------------------

class TestTotalCorrelation:
    @pytest.mark.parametrize("reduce", ["mean", "none"])
    def test_vs_torch_reference(self, rng, reduce):
        b, zdim, n = 16, 10, 5000
        z = rng.randn(b, zdim).astype(np.float32)
        mu = rng.randn(b, zdim).astype(np.float32)
        logvar = (rng.randn(b, zdim) * 0.5).astype(np.float32)

        got = ops.total_correlation(
            jnp.asarray(z), jnp.asarray(mu), jnp.asarray(logvar), n, reduce=reduce
        )
        want = torch_total_correlation(
            torch.from_numpy(z), torch.from_numpy(mu), torch.from_numpy(logvar), n,
            reduce=reduce,
        ).numpy()
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-3)

    @pytest.mark.parametrize("reduce", ["mean", "none"])
    def test_weighted_sampling_vs_torch_reference(self, rng, reduce):
        """Golden test for quirk Q11's last corner: the minibatch-WEIGHTED
        estimator the reference defines but never calls (ops.py:92-101),
        exposed here via total_correlation(sampling='weighted') and the
        tc_sampling config knob."""
        b, zdim, n = 16, 10, 5000
        z = rng.randn(b, zdim).astype(np.float32)
        mu = rng.randn(b, zdim).astype(np.float32)
        logvar = (rng.randn(b, zdim) * 0.5).astype(np.float32)

        got = ops.total_correlation(
            jnp.asarray(z), jnp.asarray(mu), jnp.asarray(logvar), n,
            reduce=reduce, sampling="weighted",
        )
        # torch golden: reference minibatch_weighted_sampling verbatim math
        log_qz_prob = torch_gaussian_log_density_nll(
            torch.from_numpy(z).unsqueeze(1),
            torch.from_numpy(mu).unsqueeze(0),
            torch.from_numpy(logvar).unsqueeze(1),
        )
        log_bn = math.log(b * n)
        prodmarg = (torch.logsumexp(log_qz_prob, dim=1) - log_bn).sum(dim=1)
        log_qz = torch.logsumexp(log_qz_prob.sum(dim=2), dim=1) - log_bn
        want = log_qz - prodmarg
        if reduce == "mean":
            want = want.mean()
        np.testing.assert_allclose(
            np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-3
        )

    def test_weighted_sampling_reaches_solver_via_config_knob(self, rng):
        """tc_sampling='weighted' must flow Config -> SolverHyper -> kl_term
        and change the computed TC term (vs stratified)."""
        from intro_tc_vae_tpu.config import load_config
        from intro_tc_vae_tpu.solvers.base import SolverHyper, kl_term

        cfg = load_config(update_dict={
            "solver": "tc", "dataset": "synthetic", "tc_sampling": "weighted",
        })
        assert cfg.tc_sampling == "weighted"
        b, zdim, n = 16, 8, 5000
        z = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        mu = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        logvar = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        h_w = SolverHyper(kl_kind="tc", dataset_size=n, beta_kl=4.0,
                          tc_sampling="weighted")
        h_s = SolverHyper(kl_kind="tc", dataset_size=n, beta_kl=4.0)
        loss_w, _ = kl_term(h_w, z, mu, logvar)
        loss_s, _ = kl_term(h_s, z, mu, logvar)
        assert np.isfinite(float(loss_w))
        assert float(loss_w) != pytest.approx(float(loss_s))

    def test_weighted_sampling_rejected_for_scaling_impls(self):
        from intro_tc_vae_tpu.config import load_config

        with pytest.raises(ValueError, match="weighted"):
            load_config(update_dict={
                "solver": "tc", "dataset": "synthetic",
                "tc_sampling": "weighted", "tc_impl": "pallas",
            })

    def test_identical_factorized_posteriors_give_small_tc(self, rng):
        # If q(z|x) is the same for all samples, log q(z) ~ log prod_l q(z_l).
        b, zdim = 8, 4
        mu = np.zeros((b, zdim), np.float32)
        logvar = np.zeros((b, zdim), np.float32)
        z = rng.randn(b, zdim).astype(np.float32) * 0.1
        tc = ops.total_correlation(jnp.asarray(z), jnp.asarray(mu), jnp.asarray(logvar), 1000)
        assert abs(float(tc)) < 1.0

    def test_grad_is_finite(self, rng):
        b, zdim, n = 8, 6, 1000
        z = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        mu = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        logvar = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        g = jax.grad(
            lambda a, m, lv: ops.total_correlation(a, m, lv, n), argnums=(0, 1, 2)
        )(z, mu, logvar)
        for gi in g:
            assert np.isfinite(np.asarray(gi)).all()


class TestTCDecomposition:
    def test_terms_sum_to_elbo_surgery(self, rng):
        """mi + tc + kl must equal log q(z|x) - log p(z) (per sample)."""
        b, zdim, n = 12, 6, 4000
        z = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        mu = jnp.asarray(rng.randn(b, zdim).astype(np.float32))
        logvar = jnp.asarray((rng.randn(b, zdim) * 0.3).astype(np.float32))
        mi, tc, kl = ops.tc_decomposition(z, mu, logvar, n)

        logq = jnp.sum(ops.gaussian_log_density(z, mu, logvar), axis=1)
        zeros = jnp.zeros_like(z)
        logp = jnp.sum(ops.gaussian_log_density(z, zeros, zeros), axis=1)
        np.testing.assert_allclose(
            np.asarray(mi + tc + kl), np.asarray(logq - logp), rtol=1e-4, atol=1e-3
        )


class TestMisc:
    def test_on_off_diag(self):
        x = jnp.arange(9.0).reshape(3, 3)
        diag, off = ops.on_off_diag(x)
        np.testing.assert_allclose(diag, [0.0, 4.0, 8.0])
        np.testing.assert_allclose(np.diagonal(off), [0.0, 0.0, 0.0])

    def test_entropy_uniform(self):
        p = np.ones((4, 1))
        h = ops.entropy(p, base=4)
        np.testing.assert_allclose(h, [1.0], atol=1e-6)

    def test_entropy_requires_ndarray(self):
        with pytest.raises(TypeError):
            ops.entropy([1, 2, 3])
