"""Pallas TPU kernels, run in interpret mode on the CPU backend."""

import numpy as np
import pytest

from oclcomputervision_tpu.ops.pallas.histeq_pallas import (
    TILE_P,
    apply_lut_pallas,
    hist256_pallas,
    histeq_global_pallas,
)
from oclcomputervision_tpu import oracle


class TestHistKernel:
    def test_exact_vs_bincount(self, rng):
        x = rng.integers(0, 256, size=(3, TILE_P * 2), dtype=np.uint8)
        got = np.asarray(hist256_pallas(x, interpret=True))
        want = np.stack([np.bincount(r, minlength=256) for r in x])
        np.testing.assert_array_equal(got.astype(np.int64), want)

    def test_multi_chunk_accumulation(self, rng):
        x = rng.integers(0, 256, size=(1, TILE_P * 5), dtype=np.uint8)
        got = np.asarray(hist256_pallas(x, interpret=True))[0]
        np.testing.assert_array_equal(
            got.astype(np.int64), np.bincount(x[0], minlength=256)
        )


class TestApplyKernel:
    def test_exact_vs_gather(self, rng):
        x = rng.integers(0, 256, size=(2, TILE_P), dtype=np.uint8)
        luts = rng.integers(0, 256, size=(2, 256), dtype=np.uint8)
        got = np.asarray(apply_lut_pallas(x, luts, interpret=True))
        want = np.stack([luts[i][x[i]] for i in range(2)])
        np.testing.assert_array_equal(got, want)


class TestFusedHisteq:
    def test_matches_oracle(self, rng):
        img = rng.integers(0, 256, size=(128, 1280), dtype=np.uint8)
        got = np.asarray(histeq_global_pallas(img, interpret=True))
        want = oracle.histeq_global(img)
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_matches_xla_twin(self, under_exposure_gray):
        from oclcomputervision_tpu.ops.histeq import histeq_global

        g = under_exposure_gray[:512, :1024]  # 512*1024 % TILE_P == 0
        got = np.asarray(histeq_global_pallas(g, interpret=True))
        want = np.asarray(histeq_global(g))
        np.testing.assert_array_equal(got, want)

    def test_batched(self, rng):
        imgs = rng.integers(0, 256, size=(2, 64, 1280), dtype=np.uint8)
        got = np.asarray(histeq_global_pallas(imgs, interpret=True))
        for i in range(2):
            single = np.asarray(histeq_global_pallas(imgs[i], interpret=True))
            np.testing.assert_array_equal(got[i], single)

    def test_rejects_unaligned(self, rng):
        img = rng.integers(0, 256, size=(100, 100), dtype=np.uint8)
        with pytest.raises(AssertionError):
            histeq_global_pallas(img, interpret=True)


class TestRaisrApplyKernel:
    def test_matches_reference_apply(self, rng):
        import jax.numpy as jnp

        from oclcomputervision_tpu.oracle import raisr as onp
        from oclcomputervision_tpu.ops.pallas.raisr_pallas import apply_filters_pallas
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        h, w = 128, 256
        up = rng.random((h, w)).astype(np.float32)
        bucket = rng.integers(0, 216, size=(h, w)).astype(np.int32)
        filters = (rng.standard_normal((cfg.num_filters, 11, 11)) * 0.05).astype(
            np.float32
        )
        got = np.asarray(
            apply_filters_pallas(
                jnp.asarray(up), jnp.asarray(bucket), jnp.asarray(filters), cfg,
                interpret=True,
            )
        )
        fidx = bucket * 4 + onp.pixel_type_map(h, w, 2)
        want = onp.apply_filters(up.astype(np.float64), fidx, filters, cfg)
        # bf16 taps/patches: ~0.3% relative response error by design
        assert np.abs(got - want).max() < 0.01

    def test_unaligned_geometry_padded(self, rng):
        import jax.numpy as jnp

        from oclcomputervision_tpu.oracle import raisr as onp
        from oclcomputervision_tpu.ops.pallas.raisr_pallas import apply_filters_pallas
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        h, w = 96, 200  # h2, w2 not tile/lane aligned
        up = rng.random((h, w)).astype(np.float32)
        bucket = rng.integers(0, 216, size=(h, w)).astype(np.int32)
        filters = (rng.standard_normal((cfg.num_filters, 11, 11)) * 0.05).astype(
            np.float32
        )
        got = np.asarray(
            apply_filters_pallas(
                jnp.asarray(up), jnp.asarray(bucket), jnp.asarray(filters), cfg,
                interpret=True,
            )
        )
        fidx = bucket * 4 + onp.pixel_type_map(h, w, 2)
        want = onp.apply_filters(up.astype(np.float64), fidx, filters, cfg)
        assert np.abs(got - want).max() < 0.01

    def test_wide_image_small_row_chunk(self, rng):
        # w2 = 2048 drops the adaptive row chunk to 4 so the response
        # block stays inside VMEM (the RC=16 geometry OOMs scoped vmem)
        import jax.numpy as jnp

        from oclcomputervision_tpu.oracle import raisr as onp
        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            _row_chunk,
            apply_filters_pallas,
        )
        from oclcomputervision_tpu.utils.config import RaisrConfig

        assert _row_chunk(1024) == 8 and _row_chunk(2048) == 4
        cfg = RaisrConfig(fidelity="full")
        h, w = 128, 4096
        up = rng.random((h, w)).astype(np.float32)
        bucket = rng.integers(0, 216, size=(h, w)).astype(np.int32)
        filters = (rng.standard_normal((cfg.num_filters, 11, 11)) * 0.05).astype(
            np.float32
        )
        got = np.asarray(
            apply_filters_pallas(
                jnp.asarray(up), jnp.asarray(bucket), jnp.asarray(filters), cfg,
                interpret=True,
            )
        )
        fidx = bucket * 4 + onp.pixel_type_map(h, w, 2)
        want = onp.apply_filters(up.astype(np.float64), fidx, filters, cfg)
        assert np.abs(got - want).max() < 0.01
