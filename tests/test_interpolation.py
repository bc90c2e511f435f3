"""Interpolation: TPU op vs NumPy oracle vs scipy ground truth."""

import numpy as np
import pytest

from oclcomputervision_tpu.oracle import interpolation as onp
from oclcomputervision_tpu.ops import interpolation as ops
from oclcomputervision_tpu.utils import psnr


class TestOracle:
    def test_bilinear_matches_scipy_ground_truth(self, lenna_gray):
        # same ground-truth protocol as basic/interpolation.py:126-133
        # (scipy linear interpolation on the index grid == align-corners)
        from scipy.interpolate import RegularGridInterpolator

        src = lenna_gray[:128, :128].astype(np.float64)
        h, w = src.shape
        hn, wn = 2 * h, 2 * w
        interp = RegularGridInterpolator(
            (np.arange(h), np.arange(w)), src, method="linear"
        )
        yy = np.linspace(0, h - 1, hn)
        xx = np.linspace(0, w - 1, wn)
        pts = np.stack(np.meshgrid(yy, xx, indexing="ij"), axis=-1)
        want = interp(pts)
        got = onp.resize_align_corners(src, (hn, wn), "bilinear")
        np.testing.assert_allclose(got, want, atol=1e-9)

    def test_identity_when_same_size(self, lenna_gray):
        src = lenna_gray[:64, :64]
        for m in ("bilinear", "bicubic"):
            out = onp.resize_align_corners(src, (64, 64), m)
            np.testing.assert_allclose(out, src.astype(np.float64), atol=1e-9)

    def test_cubic_weights_sum_to_one(self):
        u = np.linspace(0, 1, 33)
        w = onp.cubic_weights(u)
        np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-12)
        # Catmull-Rom interpolates: u=0 -> tap 1 only
        np.testing.assert_allclose(w[0], [0, 1, 0, 0], atol=1e-12)


class TestOps:
    @pytest.mark.parametrize("method", ["bilinear", "bicubic"])
    @pytest.mark.parametrize("out_scale", [2.0, 1.5, 0.5])
    def test_matches_oracle(self, lenna_gray, method, out_scale):
        src = lenna_gray[:96, :96]
        out_hw = (int(96 * out_scale), int(96 * out_scale))
        want = onp.resize_align_corners(src, out_hw, method)
        got = np.asarray(ops.resize(src, out_hw, method))
        assert np.max(np.abs(got - want)) < 0.01

    @pytest.mark.parametrize("method", ["bilinear", "bicubic"])
    def test_uint8_roundtrip_1ulp(self, lenna_gray, method):
        src = lenna_gray[:96, :96]
        want = onp.resize_uint8(src, (192, 192), method)
        got = np.asarray(ops.resize_uint8(src, (192, 192), method))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_color_and_batch(self, lenna_rgb):
        src = lenna_rgb[:64, :64]
        single = np.asarray(ops.resize(src, (128, 128), "bicubic"))
        batch = np.asarray(ops.resize(np.stack([src, src]), (128, 128), "bicubic"))
        np.testing.assert_allclose(batch[0], single, atol=1e-5)
        np.testing.assert_allclose(batch[1], single, atol=1e-5)

    @pytest.mark.parametrize("mapping", ["hw_sampler", "half_pixel"])
    @pytest.mark.parametrize("out_scale", [2.0, 0.5])
    def test_mapping_variants_match_oracle(self, lenna_gray, mapping, out_scale):
        src = lenna_gray[:96, :96]
        out_hw = (int(96 * out_scale), int(96 * out_scale))
        want = onp.resize_align_corners(src, out_hw, "bilinear", mapping=mapping)
        got = np.asarray(ops.resize(src, out_hw, "bilinear", mapping=mapping))
        assert np.max(np.abs(got - want)) < 0.01

    def test_hw_sampler_formula(self, lenna_gray):
        # bilinear_simple (interpolation.cl:11-13): src = out/(Wout-1)*Win - 0.5,
        # linear filter, clamp-to-edge - checked against a direct per-pixel eval
        src = lenna_gray[:17, :23].astype(np.float64)
        h, w = src.shape
        hn, wn = 2 * h, 2 * w
        got = onp.resize_align_corners(src, (hn, wn), "bilinear", mapping="hw_sampler")
        for oy, ox in [(0, 0), (1, 3), (hn - 1, wn - 1), (7, 11)]:
            sy = oy / (hn - 1) * h - 0.5
            sx = ox / (wn - 1) * w - 0.5
            y0, x0 = int(np.floor(sy)), int(np.floor(sx))
            vy, ux = sy - y0, sx - x0
            c = lambda y, x: src[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)]
            want = (
                (1 - vy) * ((1 - ux) * c(y0, x0) + ux * c(y0, x0 + 1))
                + vy * ((1 - ux) * c(y0 + 1, x0) + ux * c(y0 + 1, x0 + 1))
            )
            assert abs(got[oy, ox] - want) < 1e-9

    def test_half_pixel_matches_cv2(self, lenna_gray):
        import cv2

        src = lenna_gray[:64, :96]
        got = np.asarray(ops.resize(src, (128, 192), "bilinear", mapping="half_pixel"))
        want = cv2.resize(
            src.astype(np.float32), (192, 128), interpolation=cv2.INTER_LINEAR
        )
        assert np.max(np.abs(got - want)) < 1e-3

    def test_quality_vs_cv2(self, lenna_gray):
        # protocol shaped on basic/interpolation.py:139-145 (PSNR harness):
        # our align-corners result should be close to cv2's half-pixel
        # resize in PSNR terms (they differ by a subpixel shift at 2x).
        import cv2

        src = lenna_gray
        got = np.asarray(ops.resize_uint8(src, (1024, 1024), "bilinear"))
        cv2_out = cv2.resize(src, (1024, 1024), interpolation=cv2.INTER_LINEAR)
        assert psnr(got, cv2_out) > 30.0
