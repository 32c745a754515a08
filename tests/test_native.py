"""Native C++ preprocessing library: build, correctness vs golden paths."""
import numpy as np
import pytest

from custom_diffusion360_tpu.data.native import (
    crop_u8,
    dilate7,
    native_available,
    resize_bicubic_to_pm1,
)


def test_native_builds():
    assert native_available(), "g++ build of preprocess.cpp failed"


class TestResize:
    def test_matches_pil_bicubic(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (64, 80, 3), np.uint8)
        got = resize_bicubic_to_pm1(img, 32, 40)
        from PIL import Image

        ref = Image.fromarray(img).resize((40, 32), Image.BICUBIC)
        ref = np.asarray(ref, np.float32) / 255.0 * 2.0 - 1.0
        assert got.shape == (32, 40, 3)
        # same filter family; small numeric differences at edges allowed
        assert np.abs(got - ref).mean() < 0.02
        np.testing.assert_allclose(got.mean(), ref.mean(), atol=0.01)

    def test_upsample(self):
        img = np.full((8, 8, 1), 128, np.uint8)
        got = resize_bicubic_to_pm1(img, 16, 16)
        np.testing.assert_allclose(got, 128 / 255 * 2 - 1, atol=1e-2)


class TestDilate:
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        m = (rng.uniform(size=(33, 47)) > 0.9).astype(np.float32)
        got = dilate7(m)
        h, w = m.shape
        p = np.zeros((h + 6, w + 6), np.float32)
        p[3 : 3 + h, 3 : 3 + w] = m
        ref = np.zeros_like(m)
        for dy in range(7):
            for dx in range(7):
                ref = np.maximum(ref, p[dy : dy + h, dx : dx + w])
        np.testing.assert_array_equal(got, ref)


class TestCrop:
    def test_in_bounds(self):
        img = np.arange(4 * 5 * 2, dtype=np.uint8).reshape(4, 5, 2)
        got = crop_u8(img, 1, 1, 2, 3)
        np.testing.assert_array_equal(got, img[1:3, 1:4])

    def test_zero_padding(self):
        img = np.full((4, 4, 1), 9, np.uint8)
        got = crop_u8(img, -2, -2, 4, 4)
        assert got[0, 0, 0] == 0 and got[3, 3, 0] == 9
        assert got[:2].sum() == 0 and got[:, :2].sum() == 0
