"""RAISR: TPU op vs NumPy oracle; trainer sanity; quality vs bilinear."""

import numpy as np
import pytest

from oclcomputervision_tpu.oracle import raisr as onp
from oclcomputervision_tpu.ops import raisr as ops
from oclcomputervision_tpu.models.raisr import RaisrModel, train_filters
from oclcomputervision_tpu.utils import psnr
from oclcomputervision_tpu.utils.config import RaisrConfig


@pytest.fixture(scope="module")
def tiny_cfg():
    return RaisrConfig(fidelity="full")


@pytest.fixture(scope="module")
def trained(lenna_gray_mod, tiny_cfg):
    return train_filters([lenna_gray_mod], tiny_cfg, chunk=512)


@pytest.fixture(scope="module")
def lenna_gray_mod():
    from oclcomputervision_tpu.utils import load_gray

    return load_gray("lenna.png")[:128, :128]


class TestShippedMode:
    def test_matches_oracle(self, lenna_gray_mod):
        cfg = RaisrConfig(fidelity="shipped")
        want = onp.raisr_upsample(lenna_gray_mod, None, cfg)
        got = np.asarray(ops.raisr_upsample(lenna_gray_mod, None, cfg))
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_color_shipped_is_yuv_roundtrip_of_bilinear(self, lenna_rgb):
        cfg = RaisrConfig(fidelity="shipped")
        src = lenna_rgb[:64, :64]
        got = np.asarray(ops.raisr_upsample(src, None, cfg))
        want = onp.raisr_upsample(src, None, cfg)
        diff = np.abs(got.astype(int) - want.astype(int))
        # At 2x, odd pixels are exact neighbor means -> out*255 hits x.5
        # exactly, so fp32-vs-fp64 noise flips the rounding on ~half of
        # them (the reference's own fp16 kernel differs from both). A
        # bitwise match is ill-posed here; bound the error instead.
        assert diff.max() <= 2
        assert psnr(got, want) > 48


class TestHash:
    def test_bucket_agreement_ops_vs_oracle(self, lenna_gray_mod, tiny_cfg):
        x01 = lenna_gray_mod.astype(np.float64) / 255.0
        up = onp.cheap_upscale(x01, 2)
        want = onp.hash_image(up, tiny_cfg)
        got = np.asarray(ops.hash_image(np.asarray(up, np.float32), tiny_cfg))
        agree = (got == want).mean()
        # fp32 separable blur vs fp64 2D blur: disagreements only at
        # quantizer boundaries
        assert agree > 0.99, agree

    def test_bucket_range(self, lenna_gray_mod, tiny_cfg):
        x01 = lenna_gray_mod.astype(np.float32) / 255.0
        up = onp.cheap_upscale(x01, 2).astype(np.float32)
        b = np.asarray(ops.hash_image(up, tiny_cfg))
        assert b.min() >= 0
        assert b.max() < tiny_cfg.num_angle * tiny_cfg.num_strength * tiny_cfg.num_coherence


class TestFullPipeline:
    def test_ops_matches_oracle(self, lenna_gray_mod, trained, tiny_cfg):
        filters = np.asarray(trained)
        lr = lenna_gray_mod[:64, :64]
        want = onp.raisr_upsample(lr, filters, tiny_cfg)
        got = np.asarray(ops.raisr_upsample(lr, filters, tiny_cfg))
        # ~1% of pixels land in a different hash bucket (fp32 vs fp64
        # noise at quantizer edges and the angle 0<->pi wraparound on
        # near-flat gradients, mostly along borders) and get a
        # different-but-valid filter; bound the global error.
        assert psnr(got, want) > 35, psnr(got, want)
        diff = np.abs(got.astype(int) - want.astype(int))
        assert (diff > 2).mean() < 0.02

    def test_apply_filters_matches_oracle_given_same_hash(
        self, lenna_gray_mod, trained, tiny_cfg
    ):
        # the per-pixel filter gather+apply itself is deterministic:
        # identical hash map in -> near-identical output out.
        filters = np.asarray(trained)
        x01 = lenna_gray_mod[:48, :48].astype(np.float64) / 255.0
        up = onp.cheap_upscale(x01, 2)
        bucket = onp.hash_image(up, tiny_cfg)
        ptype = onp.pixel_type_map(*up.shape, tiny_cfg.scale)
        fidx = onp.filter_index(bucket, ptype, tiny_cfg)
        want = onp.apply_filters(up, fidx, filters, tiny_cfg)
        got = np.asarray(
            ops.apply_filters(
                np.asarray(up, np.float32)[..., None],
                np.asarray(fidx),
                np.asarray(filters, np.float32),
                tiny_cfg,
            )
        )[..., 0]
        assert np.max(np.abs(got - want)) < 1e-3

    def test_batched(self, lenna_gray_mod, trained, tiny_cfg):
        lr = lenna_gray_mod[:32, :32]
        s = np.asarray(ops.raisr_upsample(lr, trained, tiny_cfg))
        b = np.asarray(ops.raisr_upsample(np.stack([lr, lr]), trained, tiny_cfg))
        np.testing.assert_array_equal(b[0], s)

    @pytest.mark.parametrize("fidelity", ["shipped", "full"])
    def test_four_channel_bgra(self, lenna_rgb, trained, tiny_cfg, fidelity):
        # the reference's ClRaisr consumes BGRA images; the 4x4 CSC passes
        # alpha through and the learned filter applies to it like YUV
        # (raisr.py:20-33, raisr.cl:322-331)
        cfg = RaisrConfig(fidelity=fidelity)
        filters = None if fidelity == "shipped" else np.asarray(trained)
        src3 = lenna_rgb[:32, :32]
        alpha = np.full(src3.shape[:2] + (1,), 200, np.uint8)
        src4 = np.concatenate([src3, alpha], axis=-1)
        out4 = np.asarray(ops.raisr_upsample(src4, filters, cfg))
        assert out4.shape == (64, 64, 4) and out4.dtype == np.uint8
        # RGB result is independent of the extra channel
        out3 = np.asarray(ops.raisr_upsample(src3, filters, cfg))
        np.testing.assert_array_equal(out4[..., :3], out3)
        # constant alpha stays ~constant through upscale + filtering
        # (filters have ~unit DC response; the tiny test-corpus bank is
        # a few percent off unity in edge buckets)
        adiff = np.abs(out4[..., 3].astype(int) - 200)
        assert adiff.mean() < 2 and adiff.max() <= 32


class TestTraining:
    def test_self_upscale_beats_bilinear(self, lenna_gray_mod, trained, tiny_cfg):
        # degrade lenna, restore with filters trained on it: RAISR must
        # beat the cheap bilinear upscale it starts from.
        from oclcomputervision_tpu.ops.interpolation import resize_uint8

        hr = lenna_gray_mod
        lr = hr.reshape(64, 2, 64, 2).mean(axis=(1, 3)).round().astype(np.uint8)
        bil = np.asarray(resize_uint8(lr, hr.shape, "bilinear"))
        ra = np.asarray(ops.raisr_upsample(lr, trained, tiny_cfg))
        p_b, p_r = psnr(bil, hr), psnr(ra, hr)
        assert p_r > p_b + 0.3, (p_b, p_r)

    def test_filters_near_unit_dc(self, trained):
        # learned filters should roughly preserve flat patches
        dc = np.asarray(trained).sum(axis=(1, 2))
        assert np.abs(np.median(dc) - 1.0) < 0.2

    def test_model_save_load_roundtrip(self, trained, tiny_cfg, tmp_path):
        m = RaisrModel(cfg=tiny_cfg, filters=trained)
        p = str(tmp_path / "bank.npz")
        m.save(p)
        m2 = RaisrModel.load(p)
        np.testing.assert_allclose(np.asarray(m2.filters), np.asarray(trained))
        assert m2.cfg.num_filters == tiny_cfg.num_filters


class TestScale3:
    def test_train_and_upsample_scale3(self, lenna_gray_mod):
        # the reference hard-fails on any scale but 2 (raisr.py:91-93);
        # our trainer/inference are scale-generic
        cfg = RaisrConfig(scale=3, fidelity="full")
        hr = lenna_gray_mod[:96, :96]
        m = RaisrModel(cfg=cfg).train([hr], chunk=256)
        lr = hr.reshape(32, 3, 32, 3).mean(axis=(1, 3)).round().astype(np.uint8)
        ra = np.asarray(m.upsample(lr))
        assert ra.shape == (96, 96)
        from oclcomputervision_tpu.ops.interpolation import resize_uint8

        bil = np.asarray(resize_uint8(lr, (96, 96), "bilinear"))
        assert psnr(ra, hr) > psnr(bil, hr)

    def test_shipped_x3_bank_loads(self):
        from oclcomputervision_tpu.utils import asset_path

        m = RaisrModel.load(asset_path("raisr_filters_x3.npz"))
        assert m.cfg.scale == 3
        assert m.filters.shape == (24 * 3 * 3 * 9, 11, 11)


class TestScale4:
    def test_shipped_x4_bank_upsamples(self, lenna_gray_mod):
        from oclcomputervision_tpu.ops.interpolation import resize_uint8
        from oclcomputervision_tpu.utils import asset_path

        m = RaisrModel.load(asset_path("raisr_filters_x4.npz"))
        assert m.cfg.scale == 4
        assert m.filters.shape == (24 * 3 * 3 * 16, 11, 11)
        hr = lenna_gray_mod[:128, :128]
        lr = hr.reshape(32, 4, 32, 4).mean(axis=(1, 3)).round().astype(np.uint8)
        ra = np.asarray(m.upsample(lr))
        assert ra.shape == (128, 128)
        bil = np.asarray(resize_uint8(lr, (128, 128), "bilinear"))
        assert psnr(ra, hr) > psnr(bil, hr)
