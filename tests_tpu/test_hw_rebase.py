"""Hardware bit-identity for the rebased seeded-ME kernel (ADVICE r4).

The rebased kernel's correctness leans on hardware-only behaviors the
CPU interpret backend cannot exercise: the pl.multiple_of(., 8)
dynamic-DMA alignment proof, whole-array SMEM BlockSpecs, and stale
rot/Rs VMEM scratch reads consumed only under all-False masks. These
tests pin rebase_bound=N and rebase_bound='dynamic' against the
unrebased kernel ON THE REAL CHIP, covering a partial last band and a
band whose clipped plane index engages.
"""

import numpy as np

from oclcomputervision_tpu.ops.pallas.me_pallas import (
    me_exact_pallas_seeded,
    seeded_rebase_bound,
)


def _frames(rng, h, w):
    g0 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    g1 = rng.integers(0, 256, (h, w)).astype(np.uint8)
    return g0, g1


class TestRebasedHardware:
    def test_rebased_partial_band_and_clipped_plane(self, rng):
        # h=40: band 0 full (32 rows), band 1 PARTIAL (8 rows).
        # band 1's base sits at +B, so its scanned absolute column
        # displacements overrun +-vmax and the kernel's plane-index
        # clip engages (the clipped slabs must die in all-False masks).
        h, w, B = 40, 56, 12
        g0, g1 = _frames(rng, h, w)
        band0 = np.arange(h)[:, None, None] < 32
        base = np.where(band0, -3.0, float(B))
        seed = (base + rng.uniform(-2.5, 2.5, (h, w, 2))).astype(np.float32)
        rb = seeded_rebase_bound(seed, h, B)
        assert rb is not None and rb < B
        kw = dict(
            search_size=9, patch_size=3, costfn="sad",
            seed_mode="shipped", seed_bound=B,
        )
        ref = np.asarray(
            me_exact_pallas_seeded(g0, g1, seed, rebase_bound=None, **kw)
        )
        got = np.asarray(
            me_exact_pallas_seeded(g0, g1, seed, rebase_bound=rb, **kw)
        )
        np.testing.assert_array_equal(got, ref)

    def test_dynamic_rebase_matches_on_hardware(self, rng):
        # rebase_bound='dynamic' (the tracer-safe lax.switch form the
        # jitted pyramid uses) against the unrebased kernel on chip
        import jax

        h, w, B = 40, 56, 12
        g0, g1 = _frames(rng, h, w)
        band0 = np.arange(h)[:, None, None] < 32
        base = np.where(band0, 9.0, -9.0)
        seed = (base + rng.uniform(-5.0, 5.0, (h, w, 2))).astype(np.float32)
        kw = dict(
            search_size=9, patch_size=3, costfn="sad",
            seed_mode="shipped", seed_bound=B,
        )
        ref = np.asarray(
            me_exact_pallas_seeded(g0, g1, seed, rebase_bound=None, **kw)
        )
        dyn = np.asarray(
            jax.jit(
                lambda a, b, s: me_exact_pallas_seeded(
                    a, b, s, rebase_bound="dynamic", **kw
                )
            )(g0, g1, seed)
        )
        np.testing.assert_array_equal(dyn, ref)
