"""Native C++ data core tests: build, correctness vs numpy/PIL."""

import numpy as np
import pytest

from intro_tc_vae_tpu.runtime import (
    flip_horizontal,
    gather,
    gather_normalize,
    native_available,
    resize_bicubic,
)


def test_native_builds():
    # informative, not fatal: fallback path also must work
    print("native data core available:", native_available())


def test_gather_normalize(rng):
    imgs = (rng.rand(10, 8, 8, 3) * 255).astype(np.uint8)
    idx = np.array([3, 1, 7])
    out = gather_normalize(imgs, idx)
    np.testing.assert_allclose(out, imgs[idx].astype(np.float32) / 255.0)
    assert out.dtype == np.float32


def test_gather_f32(rng):
    imgs = rng.rand(10, 4, 4, 1).astype(np.float32)
    idx = np.array([9, 0])
    np.testing.assert_array_equal(gather(imgs, idx), imgs[idx])


def test_flip_horizontal(rng):
    batch = rng.rand(4, 6, 6, 3).astype(np.float32)
    ref = batch.copy()
    flags = np.array([1, 0, 1, 0], np.uint8)
    out = flip_horizontal(batch.copy(), flags)
    np.testing.assert_allclose(out[0], ref[0, :, ::-1, :])
    np.testing.assert_allclose(out[1], ref[1])
    np.testing.assert_allclose(out[2], ref[2, :, ::-1, :])


@pytest.mark.skipif(not native_available(), reason="native lib not built")
class TestResizeVsPIL:
    @pytest.mark.parametrize("src,dst", [(256, 64), (256, 128), (64, 64), (32, 48)])
    def test_matches_pil_bicubic(self, rng, src, dst):
        from PIL import Image

        img_u8 = (rng.rand(src, src, 3) * 255).astype(np.uint8)
        batch = img_u8[None].astype(np.float32) / 255.0
        ours = resize_bicubic(batch, dst, dst)[0]

        pil = Image.fromarray(img_u8).resize((dst, dst), Image.BICUBIC)
        ref = np.asarray(pil, np.float32) / 255.0
        # PIL uses int16 fixed-point weights; we emulate its uint8
        # intermediate quantization, leaving at most 1 uint8 step (rounding
        # ties) of difference anywhere.
        assert np.abs(ours - ref).max() <= 1.0 / 255.0 + 1e-6
        assert (np.abs(ours - ref) < 1e-6).mean() > 0.99

    def test_identity_resize(self, rng):
        batch = rng.rand(2, 16, 16, 1).astype(np.float32)
        out = resize_bicubic(batch, 16, 16)
        # output is quantized to uint8 steps (PIL 8bpc emulation)
        np.testing.assert_allclose(out, np.clip(batch, 0, 1), atol=0.5 / 255.0)
