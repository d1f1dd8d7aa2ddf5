"""FID machinery tests: closed-form cases + behavioral sanity."""

import numpy as np
import pytest

from intro_tc_vae_tpu.evaluation.fid import (
    compute_fid,
    frechet_distance,
    gaussian_moments,
)


class TestFrechetDistance:
    def test_identical_distributions_zero(self):
        mu = np.array([1.0, 2.0])
        cov = np.array([[2.0, 0.3], [0.3, 1.0]])
        assert frechet_distance(mu, cov, mu, cov) == pytest.approx(0.0, abs=1e-4)

    def test_mean_shift_closed_form(self):
        """Same covariance, shifted mean: d^2 = |dmu|^2."""
        cov = np.eye(3)
        d = frechet_distance(np.zeros(3), cov, np.array([3.0, 0, 0]), cov)
        assert d == pytest.approx(9.0, rel=1e-4)

    def test_isotropic_scale_closed_form(self):
        """N(0, a^2 I) vs N(0, b^2 I): d^2 = D*(a-b)^2."""
        d = frechet_distance(np.zeros(2), 4.0 * np.eye(2), np.zeros(2), np.eye(2))
        assert d == pytest.approx(2 * (2.0 - 1.0) ** 2, rel=1e-3)

    def test_symmetry(self, rng):
        a = rng.randn(5, 5)
        b = rng.randn(5, 5)
        cov1, cov2 = a @ a.T, b @ b.T
        mu1, mu2 = rng.randn(5), rng.randn(5)
        d12 = frechet_distance(mu1, cov1, mu2, cov2)
        d21 = frechet_distance(mu2, cov2, mu1, cov1)
        assert d12 == pytest.approx(d21, rel=1e-6)


class TestComputeFid:
    def test_same_set_near_zero_and_orders_quality(self, rng):
        def feature_fn(images):
            return images.reshape(len(images), -1)[:, :8]

        real = rng.rand(200, 4, 4, 1).astype(np.float32)
        same = compute_fid(feature_fn, real, real.copy(), batch_size=64)
        assert same == pytest.approx(0.0, abs=1e-6)

        near = real + rng.randn(*real.shape).astype(np.float32) * 0.01
        far = rng.rand(200, 4, 4, 1).astype(np.float32) * 3.0
        assert compute_fid(feature_fn, real, near) < compute_fid(feature_fn, real, far)

    def test_gaussian_moments_shapes(self, rng):
        mu, cov = gaussian_moments(rng.randn(100, 6))
        assert mu.shape == (6,) and cov.shape == (6, 6)
