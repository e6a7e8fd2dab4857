"""Native C++ host-preprocessing library vs OpenCV parity."""

import numpy as np
import cv2
import pytest

from avdn_tpu.data import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


class TestAreaResize:
    def test_downscale_matches_cv2(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (240, 320, 3), np.uint8)
        for dh, dw in ((120, 160), (240, 267), (100, 320), (60, 40)):
            want = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_AREA)
            got = native.area_resize(img, dh, dw)
            diff = np.abs(got.astype(int) - want.astype(int))
            # INTER_AREA uses fixed-point arithmetic; allow ±1 intensity
            assert np.percentile(diff, 99.5) <= 1, (dh, dw, diff.max())

    def test_identity(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (64, 64, 3), np.uint8)
        got = native.area_resize(img, 64, 64)
        np.testing.assert_array_equal(got, img)


class TestSwapRB:
    def test_matches_slice_reverse(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (32, 32, 3), np.uint8)
        want = img[:, :, ::-1].copy()
        got = native.swap_rb(img.copy())
        np.testing.assert_array_equal(got, want)


class TestFillCircles:
    def test_matches_cv2_circle(self):
        circles = np.array([[50, 60, 20], [120, 40, 10]], np.float32)
        want = np.zeros((100, 160), np.uint8)
        for cx, cy, r in circles:
            cv2.circle(want, (int(cx), int(cy)), int(r), 255, -1)
        got = native.fill_circles(100, 160, circles)
        # rasterisation boundary conventions differ by <= a 1px ring
        frac_diff = np.mean(got != want)
        assert frac_diff < 0.01, frac_diff
