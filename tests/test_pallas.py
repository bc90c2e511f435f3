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

    def test_unaligned_geometry_is_padded_and_exact(self, rng):
        # the public API routes here on TPU for ANY geometry: the pad
        # pixels are subtracted out of the histogram, so the result is
        # bit-identical to the XLA twin
        from oclcomputervision_tpu.ops.histeq import _histeq_global_2d

        img = rng.integers(0, 256, size=(100, 100), dtype=np.uint8)
        got = np.asarray(histeq_global_pallas(img, interpret=True))
        want = np.asarray(_histeq_global_2d(img, 1.0, 0.05, 2.0))
        np.testing.assert_array_equal(got, want)


class TestLocalEqKernel:
    def test_matches_xla_twin_1ulp(self, under_exposure_gray):
        from oclcomputervision_tpu.ops import histeq as H
        from oclcomputervision_tpu.ops.pallas.localeq_pallas import (
            apply_block_mappings_pallas,
        )

        g = under_exposure_gray[:512, :1024]
        m = np.asarray(H.block_mappings(g, 0.5, 0.05, 3.0, (256, 256)))
        want = np.asarray(H.apply_block_mappings(g, m, (256, 256)))
        got = np.asarray(
            apply_block_mappings_pallas(g, m, (256, 256), interpret=True)
        )
        d = np.abs(got.astype(int) - want.astype(int))
        # bf16 int+frac LUT split: flips only values essentially ON an
        # integer boundary
        assert d.max() <= 1 and (d > 0).mean() < 0.001

    def test_batched_matches_single(self, under_exposure_gray):
        from oclcomputervision_tpu.ops import histeq as H
        from oclcomputervision_tpu.ops.pallas.localeq_pallas import (
            apply_block_mappings_pallas,
        )

        g = under_exposure_gray[:512, :512]
        g2 = g[::-1].copy()
        ms = [
            np.asarray(H.block_mappings(x, 0.5, 0.05, 3.0, (256, 256)))
            for x in (g, g2)
        ]
        got = np.asarray(
            apply_block_mappings_pallas(
                np.stack([g, g2]), np.stack(ms), (256, 256), interpret=True
            )
        )
        for i, x in enumerate((g, g2)):
            single = np.asarray(
                apply_block_mappings_pallas(x, ms[i], (256, 256), interpret=True)
            )
            np.testing.assert_array_equal(got[i], single)

    def test_fused_matches_xla_twin(self, under_exposure_gray):
        # the fused path derives block histograms from the half-tile
        # Pallas histograms (4-tile sums); the transfer LUTs must be
        # bit-identical to block_mappings', so the whole pipeline gets
        # the blend kernel's +-1 boundary-flip tolerance
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops import histeq as H
        from oclcomputervision_tpu.ops.pallas.localeq_pallas import (
            histeq_local_fused_pallas,
        )

        g = under_exposure_gray[:512, :1024]
        for clahe in (0.0, 2.0):
            want = np.asarray(
                H.apply_block_mappings(
                    g,
                    H.block_mappings(g, 0.5, 0.05, 3.0, (256, 256), clahe),
                    (256, 256),
                )
            )
            got = np.asarray(
                histeq_local_fused_pallas(
                    jnp.asarray(g)[None], 0.5, 0.05, 3.0, (256, 256), clahe,
                    interpret=True,
                )[0]
            )
            d = np.abs(got.astype(int) - want.astype(int))
            assert d.max() <= 1 and (d > 0).mean() < 0.001


class TestRaisrApplyKernel:
    def test_matches_reference_apply(self, rng):
        import jax.numpy as jnp

        from oclcomputervision_tpu.oracle import raisr as onp
        from oclcomputervision_tpu.ops.pallas.raisr_pallas import apply_filters_pallas
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        h, w = 64, 256  # 2 lane tiles, 4 row chunks - smallest full geometry
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

    def test_planes_wrapper_matches_interleaved(self, rng):
        # apply_filters_planes is the plane-native core; the interleaved
        # apply_filters_pallas wrapper deinterleaves into the same
        # origin-aligned convention, so both must agree bit-for-bit
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            HALO_ROWS,
            apply_filters_pallas,
            apply_filters_planes,
            plane_halo,
        )
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        s = cfg.scale
        h, w = 128, 256
        h2, w2 = h // s, w // s  # 64, 128: already aligned
        up = rng.random((h, w)).astype(np.float32)
        bucket = rng.integers(0, 216, size=(h, w)).astype(np.int32)
        filters = (rng.standard_normal((cfg.num_filters, 11, 11)) * 0.05).astype(
            np.float32
        )
        via_wrapper = np.asarray(
            apply_filters_pallas(
                jnp.asarray(up), jnp.asarray(bucket), jnp.asarray(filters), cfg,
                interpret=True,
            )
        )
        # hand-build the origin-aligned planes + bucket planes
        hp = plane_halo(cfg.filter_len, s, cfg.gauss_len)
        upp = np.pad(up, s * hp, mode="edge")
        upp = np.pad(
            upp,
            ((0, s * (h2 + HALO_ROWS) - upp.shape[0]), (0, s * (w2 + 128) - upp.shape[1])),
        )
        planes = upp.reshape(h2 + HALO_ROWS, s, w2 + 128, s).transpose(1, 3, 0, 2)
        planes = planes.reshape(s * s, h2 + HALO_ROWS, w2 + 128)
        bpl = bucket.reshape(h2, s, w2, s).transpose(1, 3, 0, 2).reshape(s * s, h2, w2)
        phases = np.asarray(
            apply_filters_planes(
                jnp.asarray(planes), jnp.asarray(bpl), jnp.asarray(filters), cfg,
                interpret=True,
            )
        )
        inter = phases.reshape(s, s, h2, w2).transpose(2, 0, 3, 1).reshape(h, w)
        np.testing.assert_array_equal(inter, via_wrapper)

    def test_wide_image_small_row_chunk(self, rng):
        # the adaptive row chunk halves as the response block widens so
        # it stays inside the scoped-vmem budget (rc=16 is run-verified
        # at w2=1024; wider geometry drops to 8)
        import jax.numpy as jnp

        from oclcomputervision_tpu.oracle import raisr as onp
        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            _row_chunk,
            apply_filters_pallas,
        )
        from oclcomputervision_tpu.utils.config import RaisrConfig

        assert _row_chunk(1024) == 16 and _row_chunk(2048) == 8
        cfg = RaisrConfig(fidelity="full")
        h, w = 16, 4096  # 16 rows keep 2 rc=8 chunks; interpret cost 8x down
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


class TestUpscalePlanesKernel:
    def test_matches_xla_twin_1ulp(self, rng):
        # the VMEM-resident upscale emits the same 2-tap f32 stencil
        # expressions as ops.raisr.upscale_planes; backends may contract
        # mul+add to FMA, so the bound is 1 f32 ULP, not bit-equality
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            HALO_ROWS,
            TILE_H,
            plane_halo,
        )
        from oclcomputervision_tpu.ops.pallas.upscale_pallas import (
            upscale_planes_pallas,
        )
        from oclcomputervision_tpu.ops.raisr import upscale_planes
        from oclcomputervision_tpu.utils.config import RaisrConfig

        for s, h, w in [(2, 100, 130), (3, 64, 80), (4, 50, 70)]:
            cfg = RaisrConfig(scale=s)
            hp = plane_halo(cfg.filter_len, s, cfg.gauss_len)
            h2p = -(-h // TILE_H) * TILE_H
            w2p = -(-w // 128) * 128
            hq, wq = h2p + HALO_ROWS, w2p + 128
            x = jnp.asarray(rng.random((2, h, w), np.float32))
            ref = np.asarray(upscale_planes(x, cfg, h2p, w2p, hq, wq, hp))
            got = np.asarray(
                upscale_planes_pallas(x, cfg, hq, wq, hp, interpret=True)
            )
            assert got.shape[2] % {2: 64, 3: 32}.get(s, 16) == 0
            assert np.abs(got[:, :, :hq] - ref).max() <= 1.2e-7
            # zero tail rows (consumers never read them)
            assert not np.any(got[:, :, hq:])


class TestHashKernel:
    def test_hash_pallas_agrees_with_xla_twin(self, lenna_gray):
        # the Pallas hash (default ratio_sym_roll_ns: one division per
        # boundary + symmetric-pair blur + lane-rotate column reads +
        # sqrt-free coherence) vs the XLA hash_planes twin - only
        # fp-rounding-adjacent quantizer edges may differ
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            HALO_ROWS, hash_planes_pallas, plane_halo,
        )
        from oclcomputervision_tpu.ops.pallas.upscale_pallas import (
            upscale_planes_pallas,
        )
        from oclcomputervision_tpu.ops.raisr import hash_planes
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        hp = plane_halo(cfg.filter_len, cfg.scale, cfg.gauss_len)
        img = lenna_gray[:256, :256].astype(np.float32) / 255.0
        h2p = w2p = 256
        hq, wq = h2p + HALO_ROWS, w2p + 128
        planes = upscale_planes_pallas(jnp.asarray(img[None]), cfg, hq, wq, hp, True)
        got = np.asarray(hash_planes_pallas(planes, cfg, True, h2p=h2p))
        want = np.asarray(hash_planes(planes, cfg, hp, h2p, w2p))
        assert (got == want).mean() > 0.9999

    def test_roll_mode_bit_identical_to_slice_mode(self, lenna_gray):
        # the default 'ratio_sym_roll' reads the SAME elements as
        # 'ratio_sym' (lane rotate + aligned head slice vs misaligned
        # slice), so its buckets must be bit-identical - this is what
        # lets the faster form ship without a parity caveat
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            HALO_ROWS, hash_planes_pallas, plane_halo,
        )
        from oclcomputervision_tpu.ops.pallas.upscale_pallas import (
            upscale_planes_pallas,
        )
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        hp = plane_halo(cfg.filter_len, cfg.scale, cfg.gauss_len)
        img = lenna_gray[:256, :256].astype(np.float32) / 255.0
        h2p = w2p = 256
        hq, wq = h2p + HALO_ROWS, w2p + 128
        planes = upscale_planes_pallas(jnp.asarray(img[None]), cfg, hq, wq, hp, True)
        a = np.asarray(
            hash_planes_pallas(planes, cfg, True, h2p=h2p, angle_mode="ratio_sym")
        )
        b = np.asarray(
            hash_planes_pallas(
                planes, cfg, True, h2p=h2p, angle_mode="ratio_sym_roll"
            )
        )
        assert (a == b).all()
        # the default '_ns' mode squares the coherence test instead of
        # taking both eigenvalue sqrts - algebraically the same
        # predicate, so only fp-boundary-adjacent pixels may flip
        # (measured 1.000000 agreement on hardware, ROADMAP)
        c = np.asarray(
            hash_planes_pallas(
                planes, cfg, True, h2p=h2p, angle_mode="ratio_sym_roll_ns"
            )
        )
        assert (c == b).mean() > 0.9999

    def test_mm_blur_mode_agrees_and_plumbs(self, lenna_gray):
        # '_mm'/'_mmx': the horizontal structure-tensor blur as banded
        # MXU matmuls. The matmul re-associates the tap sums, so buckets
        # are only boundary-flip-close, not bit-identical; on the CPU
        # interpret backend both precisions run fp32, so agreement is
        # near-total. The hardware gate is |dPSNR| <= 0.02 dB on frame11
        # (benchmarks/raisr_kernel_variants.py psnr; ROADMAP table).
        import dataclasses

        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
            HALO_ROWS, hash_planes_pallas, plane_halo,
        )
        from oclcomputervision_tpu.ops.pallas.upscale_pallas import (
            upscale_planes_pallas,
        )
        from oclcomputervision_tpu.utils.config import RaisrConfig

        cfg = RaisrConfig(fidelity="full")
        hp = plane_halo(cfg.filter_len, cfg.scale, cfg.gauss_len)
        img = lenna_gray[:128, :128].astype(np.float32) / 255.0
        h2p = w2p = 128
        hq, wq = h2p + HALO_ROWS, w2p + 128
        planes = upscale_planes_pallas(jnp.asarray(img[None]), cfg, hq, wq, hp, True)
        ref = np.asarray(
            hash_planes_pallas(
                planes, cfg, True, h2p=h2p, angle_mode="ratio_sym_roll_ns"
            )
        )
        for mode in ("ratio_sym_roll_ns_mm", "ratio_sym_roll_ns_mmx"):
            got = np.asarray(
                hash_planes_pallas(planes, cfg, True, h2p=h2p, angle_mode=mode)
            )
            assert (got == ref).mean() > 0.999, mode
        # cfg.hash_mode plumbs through the plane-native pipeline:
        # outputs of the mm mode differ from the default only at
        # bucket-flip pixels
        from oclcomputervision_tpu.ops.raisr import _raisr_planes_batched

        rng = np.random.default_rng(0)
        filters = jnp.asarray(
            rng.standard_normal((cfg.num_filters, cfg.filter_len**2), np.float32)
            * 0.01
        )
        small = jnp.asarray(lenna_gray[:96, :96])[None]
        a = np.asarray(
            _raisr_planes_batched(small, filters, cfg, 1, interpret=True)
        )
        cfg_mm = dataclasses.replace(cfg, hash_mode="ratio_sym_roll_ns_mm")
        b = np.asarray(
            _raisr_planes_batched(small, filters, cfg_mm, 1, interpret=True)
        )
        assert (a == b).mean() > 0.995


class TestApplyVariants:
    @pytest.mark.parametrize(
        "variant,w2",
        [("g4", 512), ("g8", 768), ("g4s", 512), ("g8s", 768)],
        # g8/g8s at w2=768 exercise the non-power-of-two degrade (6
        # column groups - the x3 pipeline's geometry). The unshipped
        # measured-negative variants (g4r lane-rotate taps, g4p
        # cross-chunk pipeline) stay in the code for probes but are
        # dropped from CI - each cost ~19 s of interpret time for
        # coverage of paths no dispatcher selects.
    )
    def test_variant_bit_identical_to_base(self, variant, w2):
        # every hardware variant (column-group pipeline, lane-roll taps,
        # double-Pm pipeline) reorders work, never values: outputs must
        # match the straight-line kernel bit for bit
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.pallas import raisr_pallas as rp

        s, fl = 2, 11
        hp = rp.plane_halo(fl, s)
        rng = np.random.default_rng(7)
        nimg, h2 = 1, 64  # 4 row chunks at rc=16
        planes = jnp.asarray(
            rng.random((nimg, s * s, h2 + rp.HALO_ROWS, w2 + 128), dtype=np.float32)
        )
        bucket = jnp.asarray(rng.integers(0, 216, (nimg, h2, w2)).astype(np.int32))
        wm = rng.standard_normal((rp.NB_PAD, 128)).astype(np.float32) * 0.1
        wm[216:] = 0
        wm[:, fl * fl :] = 0
        wmat = jnp.asarray(wm).astype(jnp.bfloat16)
        base = np.asarray(
            rp._apply_phase(
                planes, bucket, wmat, fl, s, 0, 0, hp, interpret=True,
                variant="base",
            )
        )
        got = np.asarray(
            rp._apply_phase(
                planes, bucket, wmat, fl, s, 0, 0, hp, interpret=True,
                variant=variant,
            )
        )
        assert (got == base).all()


class TestHashTileRule:
    def test_budget_rule_matches_verified_points(self):
        # pin the empirically-verified scoped-vmem fit points (OOM data
        # in the _hash_tile_h docstring); a rule change that violates
        # one of these will OOM on hardware or waste throughput
        from oclcomputervision_tpu.ops.pallas.raisr_pallas import _hash_tile_h

        assert _hash_tile_h(512, 2) == 64   # verified fits
        assert _hash_tile_h(1024, 2) == 32  # 64 OOMs by 9.25M
        assert _hash_tile_h(256, 3) == 32   # verified fits
        assert _hash_tile_h(512, 3) == 16   # 32 OOMs by 1.3M
        assert _hash_tile_h(256, 4) == 16   # verified fits
        assert _hash_tile_h(512, 4) == 8    # verified fits
        assert _hash_tile_h(2048, 4) == 0   # no tile fits -> XLA twin


class TestMeExactKernel:
    """Fused exact block-matching search (ops/pallas/me_pallas.py):
    bit-identical to the XLA S-map twin (itself bit-identical to
    oracle/motion) across geometries, costs, batches, and odd shapes."""

    @pytest.mark.parametrize(
        "ss,ps,h,w,costfn",
        [
            (15, 5, 48, 70, "sad"),   # default geometry
            (15, 5, 33, 129, "sad"),  # odd rows, >1 lane tile
            (9, 3, 64, 80, "sad"),    # two-round schedule
            (11, 5, 25, 31, "ssd"),   # ssd cost, tiny frame
        ],
    )
    def test_bit_identical_to_xla_twin(self, rng, ss, ps, h, w, costfn):
        from oclcomputervision_tpu.ops.motion import _estimate_2d_smap
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas,
            me_exact_pallas_supported,
        )

        assert me_exact_pallas_supported(ss, ps, costfn)
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        ref = np.asarray(_estimate_2d_smap(g0, g1, ss, ps, costfn))
        got = np.asarray(
            me_exact_pallas(g0, g1, ss, ps, costfn, interpret=True)
        )
        np.testing.assert_array_equal(got, ref)

    def test_batched_real_content(self, rng):
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.motion import _estimate_2d_smap
        from oclcomputervision_tpu.ops.pallas.me_pallas import me_exact_pallas
        from oclcomputervision_tpu.utils import load_gray

        f10 = np.asarray(load_gray("frame10.png"))[::6, ::6]
        f11 = np.asarray(load_gray("frame11.png"))[::6, ::6]
        b0, b1 = np.stack([f10, f11]), np.stack([f11, f10])
        got = np.asarray(me_exact_pallas(b0, b1, 15, 5, interpret=True))
        for i in range(2):
            ref = np.asarray(
                _estimate_2d_smap(jnp.asarray(b0[i]), jnp.asarray(b1[i]), 15, 5)
            )
            np.testing.assert_array_equal(got[i], ref)

    def test_geometry_gate(self):
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_supported,
        )

        assert me_exact_pallas_supported(15, 5, "sad")
        assert me_exact_pallas_supported(15, 5, "ssd")
        assert not me_exact_pallas_supported(15, 5, "wsad")
        assert not me_exact_pallas_supported(21, 7, "sad")  # unroll blowup
        assert not me_exact_pallas_supported(5, 5, "sad")  # no steps

    def test_scoped_vmem_overflow_degrades_to_xla(self, rng, monkeypatch):
        # an unverified geometry overflowing Mosaic scoped vmem must
        # warn and fall back to the XLA S-map path, not raise (the same
        # contract as the RAISR dispatcher, test_raisr.TestVmemFallback)
        import jax

        from oclcomputervision_tpu.ops import motion
        from oclcomputervision_tpu.ops.motion import (
            _estimate_2d_smap,
            estimate_motion_vector,
        )
        from oclcomputervision_tpu.ops.pallas import me_pallas

        g0 = rng.integers(0, 256, (40, 60)).astype(np.uint8)
        g1 = rng.integers(0, 256, (40, 60)).astype(np.uint8)
        want = np.asarray(_estimate_2d_smap(g0, g1, 15, 5))

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            me_pallas,
            "me_exact_pallas",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("RESOURCE_EXHAUSTED: scoped vmem limit")
            ),
        )
        with pytest.warns(RuntimeWarning, match="scoped VMEM"):
            got = estimate_motion_vector(g0, g1, 15, 5, method="exact")
        np.testing.assert_array_equal(np.asarray(got), want)

        monkeypatch.setattr(
            me_pallas,
            "me_exact_pallas",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
        )
        with pytest.raises(RuntimeError, match="boom"):
            estimate_motion_vector(g0, g1, 15, 5, method="exact")


@pytest.mark.usefixtures("no_persistent_cache")
class TestMeExactSeededKernel:
    """Seeded fused exact search (ops/pallas/me_pallas.py
    me_exact_pallas_seeded): bit-identical to the clamped-base XLA twin
    _estimate_2d_smap_seeded across geometries, costs, seed modes,
    bounds, and batches (transitively bit-identical to oracle/motion
    whenever |trunc(seed)| <= seed_bound).

    The whole class runs with the persistent compilation cache OFF
    (class-scoped no_persistent_cache): every r4/r5 suite segfault was
    XLA CPU executable (de)serialization of a seeded-ME executable deep
    into long runs (jax compilation_cache get/put_executable_and_time;
    VERDICT r4 item 1), and covering only the two rebased tests left
    test_scoped_vmem_overflow_degrades_to_xla to kill the suite at
    test 198/257. Recompiling this class every run (~30 s warm) is the
    price of a suite that finishes."""

    @pytest.mark.parametrize(
        "ss,ps,h,w,costfn,mode,B",
        [
            (15, 5, 48, 70, "sad", "shipped", 8),   # pyramid defaults
            (15, 5, 33, 129, "sad", "fresh", 8),    # odd rows, 2 lane tiles
            (9, 3, 40, 56, "ssd", "shipped", 8),    # two rounds, ssd
            (15, 5, 30, 40, "sad", "shipped", 12),  # wider clamp
        ],
    )
    def test_bit_identical_to_xla_twin(self, rng, ss, ps, h, w, costfn, mode, B):
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.motion import _estimate_2d_smap_seeded
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_seeded,
            me_exact_pallas_seeded_supported,
        )

        assert me_exact_pallas_seeded_supported(ss, ps, costfn, B)
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        # seeds straddling the clamp (|seed| up to 1.5x the bound)
        seed = rng.uniform(-1.5 * B, 1.5 * B, (h, w, 2)).astype(np.float32)
        ref = np.asarray(
            _estimate_2d_smap_seeded(
                jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(seed),
                ss, ps, mode, costfn, B,
            )
        )
        got = np.asarray(
            me_exact_pallas_seeded(
                g0, g1, seed, ss, ps, costfn, mode, B, interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_batched_real_content(self, rng):
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.motion import _estimate_2d_smap_seeded
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_seeded,
        )
        from oclcomputervision_tpu.utils import load_gray

        f10 = np.asarray(load_gray("frame10.png"))[::6, ::6]
        f11 = np.asarray(load_gray("frame11.png"))[::6, ::6]
        b0, b1 = np.stack([f10, f11]), np.stack([f11, f10])
        seed = rng.uniform(-6, 6, b0.shape + (2,)).astype(np.float32)
        got = np.asarray(
            me_exact_pallas_seeded(b0, b1, seed, 15, 5, interpret=True)
        )
        for i in range(2):
            ref = np.asarray(
                _estimate_2d_smap_seeded(
                    jnp.asarray(b0[i]), jnp.asarray(b1[i]),
                    jnp.asarray(seed[i]), 15, 5, "shipped", "sad", 8,
                )
            )
            np.testing.assert_array_equal(got[i], ref)

    def test_geometry_gate(self):
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_seeded_supported,
        )

        assert me_exact_pallas_seeded_supported(15, 5, "sad", 8)
        assert me_exact_pallas_seeded_supported(15, 5, "ssd", 16)
        # B up to 32 hardware-validated round 4 (covers the benchmark's
        # 29 px finest-level seeds; bit-identical, linear device cost)
        assert me_exact_pallas_seeded_supported(15, 5, "sad", 24)
        assert me_exact_pallas_seeded_supported(15, 5, "sad", 32)
        assert not me_exact_pallas_seeded_supported(15, 5, "sad", 33)
        assert not me_exact_pallas_seeded_supported(15, 5, "wsad", 8)
        assert not me_exact_pallas_seeded_supported(5, 5, "sad", 8)  # no steps

    def test_rebased_bit_identical(self, rng, no_persistent_cache):
        # per-band seed rebasing (rebase_bound < seed_bound) must be
        # bit-identical to the unrebased kernel whenever every band's
        # midpoint residual fits the bound (seeded_rebase_bound sizes it)
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_seeded,
            seeded_rebase_bound,
        )

        h, w, B = 40, 56, 12
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        # banded seed: two 32-row bands with distinct bases (+-10) and
        # DIFFERENT in-band spreads (band 0 +-1, band 1 +-3.4), so
        # rebasing shrinks the scan to +-4 AND band 0's dynamic
        # column-residual trim engages (rx_b=1 < B_eff=4)
        band0 = np.arange(h)[:, None, None] < 32
        base = np.where(band0, 10.0, -10.0)
        spread = rng.uniform(-3.4, 3.4, (h, w, 2)) * np.where(band0, 0.29, 1.0)
        seed = (base + spread).astype(np.float32)
        rb = seeded_rebase_bound(seed, h, B)
        assert rb == 4
        ref = np.asarray(
            me_exact_pallas_seeded(
                g0, g1, seed, 9, 3, "sad", "shipped", B, interpret=True
            )
        )
        got = np.asarray(
            me_exact_pallas_seeded(
                g0, g1, seed, 9, 3, "sad", "shipped", B,
                rebase_bound=rb, interpret=True,
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_rebase_bound_sizing(self, rng):
        import jax

        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            seeded_rebase_bound,
        )

        h, w = 40, 56
        # narrow banded seed -> smallest covering quantum
        seed = np.full((h, w, 2), 7.3, np.float32)
        assert seeded_rebase_bound(seed, h, 16) == 4
        # in-band spread wider than every quantum < B -> None
        wide = rng.uniform(-15, 15, (h, w, 2)).astype(np.float32)
        assert seeded_rebase_bound(wide, h, 16) is None
        # tracer seeds (under jit) -> None, never a concrete sizing
        out = []
        jax.make_jaxpr(
            lambda s: out.append(seeded_rebase_bound(s, h, 16)) or s
        )(seed)
        assert out == [None]

    def test_dynamic_rebase_bit_identical(self, rng, no_persistent_cache):
        # rebase_bound='dynamic' (tracer-safe): the per-band residual
        # bound is computed on device and a lax.switch selects the
        # static variant - must be bit-identical to the unrebased
        # kernel for ANY seed, eager and under jit. The banded seed's
        # residual (~5) straddles the 4/8 quantum boundary: a selector
        # off by one quantum would CLAMP band residuals and corrupt
        # the flow, so bit-identity also pins the selection rule.
        import jax

        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_seeded,
        )

        h, w, B = 40, 56, 12
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        band0 = np.arange(h)[:, None, None] < 32
        base = np.where(band0, 9.0, -9.0)
        seed = (base + rng.uniform(-5.0, 5.0, (h, w, 2))).astype(np.float32)
        kw = dict(
            search_size=9, patch_size=3, costfn="sad",
            seed_mode="shipped", seed_bound=B, interpret=True,
        )
        ref = np.asarray(
            me_exact_pallas_seeded(g0, g1, seed, rebase_bound=None, **kw)
        )
        dyn = np.asarray(
            me_exact_pallas_seeded(g0, g1, seed, rebase_bound="dynamic", **kw)
        )
        np.testing.assert_array_equal(dyn, ref)
        jdyn = np.asarray(
            jax.jit(
                lambda a, b, s: me_exact_pallas_seeded(
                    a, b, s, rebase_bound="dynamic", **kw
                )
            )(g0, g1, seed)
        )
        np.testing.assert_array_equal(jdyn, ref)
        # wide seed -> no quantum covers it -> the unrebased tail branch
        wide = rng.uniform(-11, 11, (h, w, 2)).astype(np.float32)
        refw = np.asarray(
            me_exact_pallas_seeded(g0, g1, wide, rebase_bound=None, **kw)
        )
        dynw = np.asarray(
            me_exact_pallas_seeded(g0, g1, wide, rebase_bound="dynamic", **kw)
        )
        np.testing.assert_array_equal(dynw, refw)

    def test_scoped_vmem_overflow_degrades_to_xla(self, rng, monkeypatch):
        import jax
        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.motion import (
            _estimate_2d_smap_seeded,
            estimate_motion_vector,
        )
        from oclcomputervision_tpu.ops.pallas import me_pallas

        g0 = rng.integers(0, 256, (40, 60)).astype(np.uint8)
        g1 = rng.integers(0, 256, (40, 60)).astype(np.uint8)
        seed = rng.uniform(-4, 4, (40, 60, 2)).astype(np.float32)
        want = np.asarray(
            _estimate_2d_smap_seeded(
                jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(seed),
                15, 5, "shipped", "sad", 8,
            )
        )

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            me_pallas,
            "me_exact_pallas_seeded",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("RESOURCE_EXHAUSTED: scoped vmem limit")
            ),
        )
        with pytest.warns(RuntimeWarning, match="scoped VMEM"):
            got = estimate_motion_vector(
                g0, g1, 15, 5, seed=seed, method="exact", seed_bound=8
            )
        np.testing.assert_array_equal(np.asarray(got), want)

        monkeypatch.setattr(
            me_pallas,
            "me_exact_pallas_seeded",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
        )
        with pytest.raises(RuntimeError, match="boom"):
            estimate_motion_vector(
                g0, g1, 15, 5, seed=seed, method="exact", seed_bound=8
            )


class TestMeFastKernel:
    """Fused fast-mode kernel (ops/pallas/me_fast_pallas.py): the
    masked-shift residual iteration, bit-identical to the XLA twin
    _estimate_2d_fast across geometries, seeds, bounds, and batches."""

    @pytest.mark.parametrize(
        "ss,ps,h,w,costfn",
        [
            (15, 5, 48, 70, "sad"),   # pyramid defaults
            (15, 5, 33, 129, "ssd"),  # odd rows, 2 lane tiles
            (9, 3, 40, 56, "sad"),    # two rounds, small patch
            (7, 5, 24, 40, "sad"),    # single round
        ],
    )
    def test_unseeded_bit_identical(self, rng, ss, ps, h, w, costfn):
        from oclcomputervision_tpu.ops.motion import (
            _fast_pallas,
            estimate_motion_vector,
        )
        from oclcomputervision_tpu.ops.pallas.me_fast_pallas import (
            me_fast_pallas_supported,
        )

        assert me_fast_pallas_supported(ss, ps, costfn)
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        ref = np.asarray(
            estimate_motion_vector(
                g0, g1, ss, ps, method="fast", costfn=costfn, warp_bound=8
            )
        )
        got = np.asarray(
            _fast_pallas(
                g0, g1, None, ss, ps, "shipped", 8, costfn, interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    @pytest.mark.parametrize("wb", [8, -1])
    def test_seeded_bit_identical(self, rng, wb):
        # wb=8: the legacy one-time base clamp; wb=-1 ('auto' on TPU):
        # the unclamped one-time base gather. Reference is the XLA
        # masked-shift twin at the SAME bound (the per-round 'gather'
        # path differs by design for spatially varying seeds - it
        # re-evaluates the base at the shifted pixel)
        import warnings

        import jax.numpy as jnp

        from oclcomputervision_tpu.ops.motion import (
            _estimate_2d_fast,
            _fast_pallas,
        )

        h, w = 40, 60
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        seed = rng.uniform(-12, 12, (h, w, 2)).astype(np.float32)
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            ref = np.asarray(
                _estimate_2d_fast(
                    jnp.asarray(g0), jnp.asarray(g1), jnp.asarray(seed),
                    15, 5, "shipped", True, "sad", warp_bound=wb,
                )
            )
        got = np.asarray(
            _fast_pallas(
                g0, g1, seed, 15, 5, "shipped", wb, "sad", interpret=True
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_batched_real_content(self, rng):
        from oclcomputervision_tpu.ops.motion import (
            _fast_pallas,
            estimate_motion_vector,
        )
        from oclcomputervision_tpu.utils import load_gray

        f10 = np.asarray(load_gray("frame10.png"))[::6, ::6]
        f11 = np.asarray(load_gray("frame11.png"))[::6, ::6]
        b0, b1 = np.stack([f10, f11]), np.stack([f11, f10])
        got = np.asarray(
            _fast_pallas(b0, b1, None, 15, 5, "shipped", 8, "sad", interpret=True)
        )
        for i in range(2):
            ref = np.asarray(
                estimate_motion_vector(
                    b0[i], b1[i], 15, 5, method="fast", warp_bound=8
                )
            )
            np.testing.assert_array_equal(got[i], ref)

    def test_geometry_gate(self):
        from oclcomputervision_tpu.ops.pallas.me_fast_pallas import (
            me_fast_pallas_supported,
        )

        assert me_fast_pallas_supported(15, 5, "sad")
        assert me_fast_pallas_supported(15, 5, "ssd")
        assert not me_fast_pallas_supported(15, 5, "wsad")
        assert not me_fast_pallas_supported(21, 5, "sad")  # step 8 > slack
        assert not me_fast_pallas_supported(5, 5, "sad")   # no steps

    def test_scoped_vmem_overflow_degrades_to_xla(self, rng, monkeypatch):
        import jax

        from oclcomputervision_tpu.ops import motion

        g0 = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        g1 = rng.integers(0, 256, (32, 48)).astype(np.uint8)
        want = np.asarray(
            motion.estimate_motion_vector(
                g0, g1, 15, 5, method="fast", warp_bound=8
            )
        )

        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(
            motion,
            "_fast_pallas",
            lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("RESOURCE_EXHAUSTED: scoped vmem limit")
            ),
        )
        with pytest.warns(RuntimeWarning, match="scoped VMEM"):
            got = motion.estimate_motion_vector(
                g0, g1, 15, 5, method="fast", warp_bound=8
            )
        np.testing.assert_array_equal(np.asarray(got), want)

        monkeypatch.setattr(
            motion,
            "_fast_pallas",
            lambda *a, **k: (_ for _ in ()).throw(RuntimeError("boom")),
        )
        with pytest.raises(RuntimeError, match="boom"):
            motion.estimate_motion_vector(
                g0, g1, 15, 5, method="fast", warp_bound=8
            )

    def test_multi_band_bit_identical(self, rng, monkeypatch):
        # every other geometry here resolves to a single band; force
        # tiny bands so the riskiest logic (G-halo accounting, garbage
        # creep isolation, r0-dependent global-row median masks, band
        # DMA offsets) is actually exercised across band seams
        from oclcomputervision_tpu.ops.motion import (
            _fast_pallas,
            estimate_motion_vector,
        )
        from oclcomputervision_tpu.ops.pallas import me_fast_pallas as mod

        monkeypatch.setattr(mod, "_VMEM_BUDGET", 0)  # _pick_bh -> 8
        h, w = 64, 70
        wp = -(-(w + 80) // 128) * 128
        assert mod._pick_bh(h, wp, [5, 2, 1], 5) == 8  # 8 bands
        g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
        ref = np.asarray(
            estimate_motion_vector(g0, g1, 15, 5, method="fast", warp_bound=8)
        )
        got = np.asarray(
            _fast_pallas(g0, g1, None, 15, 5, "shipped", 8, "sad", interpret=True)
        )
        np.testing.assert_array_equal(got, ref)

    def test_gate_rejects_margin_overflow(self, rng, monkeypatch):
        # search 16 / patch 1 -> steps [8,4,2,1]: slice offsets fit
        # (8 - 0 - 8 = 0) but 2*VM + G = 48 > _CM = 40; the gate must
        # reject it so the public API falls back to XLA instead of
        # tripping the kernel's margin assert on TPU
        import jax

        from oclcomputervision_tpu.ops import motion
        from oclcomputervision_tpu.ops.pallas.me_fast_pallas import (
            me_fast_pallas_supported,
        )

        assert not me_fast_pallas_supported(16, 1, "sad")
        g0 = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        g1 = rng.integers(0, 256, (24, 32)).astype(np.uint8)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        # must not raise (and must not try the Pallas kernel at all)
        motion.estimate_motion_vector(
            g0, g1, 16, 1, method="fast", warp_bound=8
        )
