"""Pallas output-pair-packed 3x3 conv (ops/conv_pallas.py) vs XLA's
conv_general_dilated — forward values and both gradients, interpreter
mode on CPU (the same way the TC kernel is unit-tested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from intro_tc_vae_tpu.ops.conv_pallas import (
    _rot_t,
    conv3x3_hybrid,
    conv3x3_pallas,
    pack_weights,
    supported,
    unpack_grad,
)


def _xla_conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(*shape).astype(np.float32) * scale
    )


class TestPacking:
    def test_pack_unpack_adjoint(self):
        """<pack(w), G> == <w, unpack(G)> — pack/unpack are transposes."""
        w = _rand((3, 3, 64, 64), 0)
        g = _rand((6, 128, 128), 1)
        lhs = jnp.vdot(pack_weights(w), g)
        rhs = jnp.vdot(w, unpack_grad(g))
        np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-4)

    def test_pack_preserves_taps(self):
        """Every plain tap appears in the packed tensor for both output
        parities (9 taps x 2 parities = 18 nonzero placements per
        (ci, co) — 12 K-rows x 2 N-parities minus 6 invalid)."""
        w = jnp.arange(3 * 3 * 64 * 64, dtype=jnp.float32).reshape(3, 3, 64, 64)
        wp = pack_weights(w)
        # each (ky,kx) tap of each (ci,co) appears exactly twice (o=0,1)
        counts = unpack_grad(jnp.ones_like(wp))
        np.testing.assert_array_equal(np.asarray(counts), 2.0)


class TestForward:
    @pytest.mark.parametrize("shape,tile_h", [
        ((1, 16, 8, 64), 16),    # single strip (first == last)
        ((2, 32, 8, 64), 16),    # two strips: first + last, no interior
        ((1, 48, 8, 64), 16),    # interior strip exercised
        ((2, 32, 16, 64), None), # auto tile = whole image
    ])
    def test_matches_xla(self, shape, tile_h):
        x = _rand(shape, 42, 0.5)
        w = _rand((3, 3, 64, 64), 7, 0.1)
        assert supported(x.shape, w.shape)
        with pltpu.force_tpu_interpret_mode():
            y = conv3x3_pallas(x, w, tile_h)
        ref = _xla_conv(x, w)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_supported_gating(self):
        assert supported((4, 64, 64, 64), (3, 3, 64, 64))
        assert supported((4, 32, 32, 64), (3, 3, 64, 64))
        assert supported((4, 128, 128, 64), (3, 3, 64, 64))
        assert not supported((4, 64, 64, 128), (3, 3, 128, 64))
        assert not supported((4, 64, 64, 64), (5, 5, 64, 64))
        assert not supported((4, 60, 64, 64), (3, 3, 64, 64))
        assert not supported((4, 16, 7, 64), (3, 3, 64, 64))
        assert not supported((4, 256, 256, 64), (3, 3, 64, 64))  # VMEM gate


class TestBackward:
    def test_grads_match_xla(self):
        x = _rand((2, 32, 8, 64), 3, 0.5)
        w = _rand((3, 3, 64, 64), 4, 0.1)
        cot = _rand((2, 32, 8, 64), 5)

        def loss_pallas(x, w):
            return jnp.vdot(conv3x3_pallas(x, w, 16), cot)

        def loss_xla(x, w):
            return jnp.vdot(_xla_conv(x, w), cot)

        with pltpu.force_tpu_interpret_mode():
            dx_p, dw_p = jax.grad(loss_pallas, argnums=(0, 1))(x, w)
        dx_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_x),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_x),
                                   rtol=1e-4, atol=1e-4)

    def test_hybrid_matches_xla(self):
        """conv3x3_hybrid: XLA forward must be exact; Pallas backward
        (the same dx/dWp kernels as conv3x3_pallas) must match XLA's
        conv grads — the measured-fastest split (BENCHMARKS)."""
        x = _rand((2, 32, 8, 64), 11, 0.5)
        w = _rand((3, 3, 64, 64), 12, 0.1)
        cot = _rand((2, 32, 8, 64), 13)

        def loss_hybrid(x, w):
            return jnp.vdot(conv3x3_hybrid(x, w, 16, True), cot)

        def loss_xla(x, w):
            return jnp.vdot(_xla_conv(x, w), cot)

        y = conv3x3_hybrid(x, w, 16, True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(_xla_conv(x, w)),
                                   rtol=1e-5, atol=1e-5)
        with pltpu.force_tpu_interpret_mode():
            dx_h, dw_h = jax.grad(loss_hybrid, argnums=(0, 1))(x, w)
        dx_x, dw_x = jax.grad(loss_xla, argnums=(0, 1))(x, w)
        np.testing.assert_allclose(np.asarray(dx_h), np.asarray(dx_x),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dw_h), np.asarray(dw_x),
                                   rtol=1e-4, atol=1e-4)

    def test_rot_t_is_input_grad_kernel(self):
        """conv(g, rot_t(w)) == the true dL/dx of conv(x, w) — the
        identity the dx kernel relies on."""
        x = _rand((1, 8, 4, 64), 8)
        w = _rand((3, 3, 64, 64), 9, 0.1)
        g = _rand((1, 8, 4, 64), 10)
        dx_true = jax.grad(lambda x: jnp.vdot(_xla_conv(x, w), g))(x)
        dx_rot = _xla_conv(g, _rot_t(w))
        np.testing.assert_allclose(np.asarray(dx_rot), np.asarray(dx_true),
                                   rtol=1e-4, atol=1e-5)
