"""Model zoo tests: shapes, arch dispatch, BN statefulness, torch parity.

Param-count parity vs the torch reference is checked for the 'res' arch
(identical topology). 'conv' differs deliberately: the reference allocates
a conv_expand its forward never uses (dead params, models.py:15-26).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from intro_tc_vae_tpu.models import (
    ConvolutionalBlock,
    Decoder,
    Encoder,
    InceptionResnetBlock,
    ResidualBlock,
    SoftIntroVAE,
    get_conv_class,
)
from intro_tc_vae_tpu.models.vae import conv_output_size, num_params

UKIYO64 = dict(cdim=3, zdim=128, channels=(64, 128, 256, 512), image_size=64)


def init_model(model, x_shape, rngs=None):
    rngs = rngs or {"params": jax.random.key(0), "reparam": jax.random.key(1)}
    x = jnp.zeros(x_shape)
    return model.init(rngs, x)


class TestBlocks:
    @pytest.mark.parametrize("arch,cls", [
        ("conv", ConvolutionalBlock),
        ("res", ResidualBlock),
        ("inception", InceptionResnetBlock),
    ])
    def test_get_conv_class(self, arch, cls):
        assert get_conv_class(arch) is cls

    def test_unknown_arch_raises(self):
        with pytest.raises(ValueError):
            get_conv_class("transformer")

    @pytest.mark.parametrize("cls", [ConvolutionalBlock, ResidualBlock, InceptionResnetBlock])
    @pytest.mark.parametrize("inc,outc", [(8, 8), (8, 16)])
    def test_block_shapes(self, cls, inc, outc):
        block = cls(inc=inc, outc=outc)
        x = jnp.ones((2, 16, 16, inc))
        variables = block.init(jax.random.key(0), x)
        y, new_state = block.apply(variables, x, True, mutable=["batch_stats"])
        assert y.shape == (2, 16, 16, outc)
        assert "batch_stats" in new_state


class TestEncoderDecoder:
    def test_conv_output_size_static(self):
        assert conv_output_size(64, (64, 128, 256, 512)) == (4, 4, 512)
        assert conv_output_size(128, (64, 128, 256, 512, 512)) == (4, 4, 512)
        assert conv_output_size(256, (64, 128, 256, 512, 512, 512)) == (4, 4, 512)

    def test_conv_output_size_too_small_raises(self):
        with pytest.raises(ValueError):
            conv_output_size(16, (64, 128, 256, 512, 512))

    @pytest.mark.parametrize("arch", ["conv", "res", "inception"])
    def test_encoder_shapes(self, arch):
        enc = Encoder(arch=arch, **UKIYO64)
        variables = init_model(enc, (2, 64, 64, 3))
        (mu, logvar), _ = enc.apply(variables, jnp.ones((2, 64, 64, 3)), True,
                                    mutable=["batch_stats"])
        assert mu.shape == (2, 128) and logvar.shape == (2, 128)

    @pytest.mark.parametrize("arch", ["conv", "res", "inception"])
    def test_decoder_shapes(self, arch):
        dec = Decoder(arch=arch, **UKIYO64)
        variables = init_model(dec, (2, 128))
        y, _ = dec.apply(variables, jnp.ones((2, 128)), True, mutable=["batch_stats"])
        assert y.shape == (2, 64, 64, 3)
        assert float(y.min()) >= 0.0 and float(y.max()) <= 1.0  # sigmoid head


class TestSoftIntroVAE:
    def test_forward_shapes_and_determinism(self):
        model = SoftIntroVAE(arch="res", **UKIYO64)
        variables = init_model(model, (2, 64, 64, 3))
        x = jnp.ones((2, 64, 64, 3)) * 0.5
        (mu, logvar, z, rec), _ = model.apply(
            variables, x, True, True, mutable=["batch_stats"],
            rngs={"reparam": jax.random.key(2)},
        )
        np.testing.assert_array_equal(np.asarray(z), np.asarray(mu))  # deterministic
        assert rec.shape == x.shape

        (_, _, z2, _), _ = model.apply(
            variables, x, False, True, mutable=["batch_stats"],
            rngs={"reparam": jax.random.key(2)},
        )
        assert not np.allclose(np.asarray(z2), np.asarray(mu))  # sampled

    def test_bn_stats_update_in_train_not_eval(self):
        model = SoftIntroVAE(arch="res", **UKIYO64)
        variables = init_model(model, (2, 64, 64, 3))
        x = jnp.ones((2, 64, 64, 3)) * 0.3

        _, upd = model.apply(variables, x, True, True, mutable=["batch_stats"],
                             rngs={"reparam": jax.random.key(0)})
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(upd["batch_stats"])
        assert any(not np.allclose(b, a) for b, a in zip(before, after))

        # eval mode: no batch_stats mutation needed
        out = model.apply(variables, x, True, False,
                          rngs={"reparam": jax.random.key(0)})
        assert out[3].shape == x.shape

    def test_encode_decode_methods(self):
        model = SoftIntroVAE(arch="res", **UKIYO64)
        variables = init_model(model, (2, 64, 64, 3))
        x = jnp.ones((2, 64, 64, 3)) * 0.5
        (mu, logvar), _ = model.apply(variables, x, False, mutable=["batch_stats"],
                                      method=SoftIntroVAE.encode)
        y, _ = model.apply(variables, mu, False, mutable=["batch_stats"],
                           method=SoftIntroVAE.decode)
        assert y.shape == x.shape


@pytest.mark.skipif(
    not os.path.isdir("/root/reference"), reason="reference repo not mounted"
)
class TestTorchParity:
    def test_res_param_count_matches_reference(self):
        """'res' arch: parameter count must equal the torch reference model."""
        import sys
        import types

        import torch  # noqa: F401

        # Reference models.py does 'from black import out' (unused, quirk Q6);
        # stub it so the import works in clean envs.
        if "black" not in sys.modules:
            stub = types.ModuleType("black")
            stub.out = None
            sys.modules["black"] = stub
        sys.path.insert(0, "/root/reference")
        try:
            try:
                import models as ref_models
            except ImportError as e:
                pytest.skip(f"reference models.py unimportable: {e}")
            ref = ref_models.SoftIntroVAE(
                arch="res", cdim=3, zdim=128, channels=[64, 128, 256, 512],
                image_size=64,
            )
            ref_count = sum(p.numel() for p in ref.parameters() if p.requires_grad)
        finally:
            sys.path.remove("/root/reference")

        model = SoftIntroVAE(arch="res", **UKIYO64)
        variables = init_model(model, (1, 64, 64, 3))
        ours = num_params(variables["params"])
        assert ours == ref_count, f"param count {ours} != reference {ref_count}"


class TestPackedPredictConv:
    """The MXU-packed predict conv must be a drop-in for the plain conv:
    identical param tree/init, identical forward, matching gradients."""

    @pytest.mark.parametrize("size,block,chans", [
        (64, 4, (8, 16)), (64, 8, (8, 16)), (128, 4, (8, 16, 16)),
    ])
    def test_matches_plain_conv(self, size, block, chans):
        kw = dict(cdim=3, zdim=32, channels=chans, image_size=size)
        plain = Decoder(pack_predict=0, **kw)
        packed = Decoder(pack_predict=block, **kw)
        rngs = {"params": jax.random.key(0)}
        z = jax.random.normal(jax.random.key(1), (2, 32))
        va = plain.init(rngs, z, train=False)
        vb = packed.init(rngs, z, train=False)
        # same tree (names, shapes) and same init values -> checkpoints and
        # torch transplants are interchangeable between the two modes
        assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
        for a, b in zip(jax.tree_util.tree_leaves(va), jax.tree_util.tree_leaves(vb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(v, dec):
            y = dec.apply(v, z, train=False)
            w = jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape)
            return jnp.sum(y * w)

        la, ga = jax.value_and_grad(loss)(va, plain)
        lb, gb = jax.value_and_grad(loss)(va, packed)
        ya = plain.apply(va, z, train=False)
        yb = packed.apply(va, z, train=False)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=5e-6)
        assert abs(float(la - lb)) < 1e-4 * (1 + abs(float(la)))
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-12
            assert np.abs(a - b).max() / scale < 1e-3

    def test_indivisible_size_falls_back(self):
        # image_size not divisible by the block -> plain conv path (no crash)
        dec = Decoder(cdim=3, zdim=32, channels=(8, 16), image_size=64,
                      pack_predict=3)
        v = dec.init({"params": jax.random.key(0)},
                     jnp.zeros((1, 32)), train=False)
        y = dec.apply(v, jnp.zeros((1, 32)), train=False)
        assert y.shape == (1, 64, 64, 3)


class TestStripTiledConv:
    """The strip-tiled conv must be a drop-in for the plain conv: identical
    param tree/init, forward equal to accumulation-order noise, matching
    gradients (same taps, different batching — models/blocks.py)."""

    @pytest.mark.parametrize("kernel,use_bias,h,tile_rows,expect_tiled", [
        (3, False, 128, 64, True),    # t=2
        (3, False, 256, 64, True),    # t=4
        (5, True, 256, 64, True),     # predict-conv shape, t=4
        (3, False, 96, 64, False),    # h < 2*tile_rows -> internal fallback
        (3, False, 100, 32, False),   # h % t != 0 -> internal fallback
    ])
    def test_matches_plain_conv(self, kernel, use_bias, h, tile_rows,
                                expect_tiled):
        from intro_tc_vae_tpu.models.blocks import StripTiledConv, conv

        plain = conv(16, kernel, use_bias=use_bias, in_ch=8)
        tiled = conv(16, kernel, use_bias=use_bias, in_ch=8,
                     tile_rows=tile_rows)
        assert isinstance(tiled, StripTiledConv)
        x = jax.random.normal(jax.random.key(1), (2, h, h, 8), jnp.float32)
        v = plain.init(jax.random.key(0), x)
        # identical param tree and init values -> checkpoints interchange
        vt = tiled.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(vt)
        for a, b in zip(jax.tree_util.tree_leaves(v), jax.tree_util.tree_leaves(vt)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        def loss(v, mod):
            y = mod.apply(v, x)
            w = jnp.cos(jnp.arange(y.size, dtype=jnp.float32)).reshape(y.shape)
            return jnp.sum(y * w)

        ya = plain.apply(v, x)
        yb = tiled.apply(v, x)
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                                   rtol=1e-5, atol=1e-5)
        la, ga = jax.value_and_grad(loss)(v, plain)
        lb, gb = jax.value_and_grad(loss)(v, tiled)
        assert abs(float(la - lb)) < 1e-4 * (1 + abs(float(la)))
        for a, b in zip(jax.tree_util.tree_leaves(ga), jax.tree_util.tree_leaves(gb)):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-12
            assert np.abs(a - b).max() / scale < 1e-4

    def test_decoder_drop_in(self):
        kw = dict(cdim=3, zdim=32, channels=(8, 16), image_size=256)
        plain = Decoder(**kw)
        tiled = Decoder(tile_rows=64, **kw)
        rngs = {"params": jax.random.key(0)}
        z = jax.random.normal(jax.random.key(1), (2, 32))
        va = plain.init(rngs, z, train=False)
        vb = tiled.init(rngs, z, train=False)
        assert jax.tree_util.tree_structure(va) == jax.tree_util.tree_structure(vb)
        ya = plain.apply(va, z, train=False)
        yb = tiled.apply(va, z, train=False)  # same params on the tiled path
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=5e-3)


class TestRemat:
    """remat=True must be invisible to numerics: identical param tree,
    bit-equal forward, matching gradients — only the backward's memory
    schedule changes (per-block jax.checkpoint, models/vae.py)."""

    @pytest.mark.parametrize("arch", ["conv", "res", "inception"])
    def test_model_equivalence(self, arch):
        kw = dict(arch=arch, cdim=3, zdim=16, channels=(8, 16), image_size=32)
        m0 = SoftIntroVAE(**kw)
        m1 = SoftIntroVAE(remat=True, **kw)
        rngs = {"params": jax.random.key(0), "reparam": jax.random.key(1)}
        x = jax.random.uniform(jax.random.key(2), (4, 32, 32, 3))
        v0 = m0.init(rngs, x)
        v1 = m1.init(rngs, x)
        assert jax.tree_util.tree_structure(v0) == jax.tree_util.tree_structure(v1)

        def loss(v, m):
            (mu, logvar, z, y), _ = m.apply(
                v, x, train=True, mutable=["batch_stats"],
                rngs={"reparam": jax.random.key(3)})
            return jnp.sum(y**2) + jnp.sum(mu**2) + jnp.sum(logvar**2)

        l0, g0 = jax.value_and_grad(loss)(v0, m0)
        l1, g1 = jax.value_and_grad(loss)(v0, m1)
        assert float(l0) == float(l1)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)
