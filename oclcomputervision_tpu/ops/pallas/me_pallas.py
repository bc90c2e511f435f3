"""Pallas TPU kernel for the exact (bit-identical) block-matching search.

The XLA S-map formulation (ops/motion._estimate_2d_smap) is HBM-bound:
every shifted cost map is materialized in HBM and the shrinking-step
rounds stream ~530 masked map adds per pixel back through HBM (~3.4 KB
/pixel -> a ~235 MP/s roofline; 133 measured). This kernel runs the
SAME search per row band with every cost map TRANSIENT in VMEM:

  per [BAND_H, Wp] row band (grid = batch x bands):
    DMA frame0's band (+patch halo) and frame1's band (+patch+search
      halo) into VMEM
    stage the 2*vmax+1 column-rotated copies of the frame1 band ONCE
      (pltpu.roll by non-negative lane shifts - the hash kernel's
      bit-identical aligned-read trick; every later read is aligned)
    per search round (static unroll over the reachable displacement
      sets, exactly oracle/motion.py's shrinking-step sets):
      for each needed displacement v, build S_v = box(|f0 - rot[vx]
        shifted vy|) in registers (separable patch sums; sublane
        offsets for rows, lane rolls for columns) and immediately
        accumulate it into the 9 candidate costs through the
        (state == v - offset) one-hot masks
      first-minimum argmin in row-major candidate order -> update the
        per-pixel displacement state

  Integer addition commutes exactly, candidate order matches, and the
  zero padding is baked into the pre-padded inputs, so the result is
  BIT-IDENTICAL to oracle/motion.estimate_motion_vector (and to the
  XLA twin) - asserted by tests/test_pallas.py.

The search geometry (me_pyramid.py:130-205: search 15, patch 5) builds
379 transient maps over the 3 rounds (~15 VPU ops each) plus ~730
mask-selected accumulations - compute-bound on the VPU instead of
HBM-bound, which is the whole point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclcomputervision_tpu.oracle.motion import me_steps

BAND_H = 32  # output rows per grid step
CHAIN_K = 4  # map builds allowed in flight (see the kernel's chain note)


def _reachable_sets(steps):
    """Per-axis displacement sets entering each round (ops/motion twin)."""
    cur = {0}
    sets = []
    for st in steps:
        sets.append(sorted(cur))
        cur = {v + o * st for v in cur for o in (-1, 0, 1)}
    return sets


def _build_count(steps) -> int:
    """Transient map builds the kernel unrolls (incl. cross-round
    rebuilds - caching across rounds would spill VMEM)."""
    total = 0
    for st, vals in zip(steps, _reachable_sets(steps)):
        need = {v + o * st for v in vals for o in (-1, 0, 1)}
        total += len(need) ** 2
    return total


def _band_rows(bh: int, pm: int, vmax: int):
    """DMA'd rows per band, rounded to sublane multiples (Mosaic
    requires memref slices 8-aligned along the sublane dim)."""
    f0_rows = -(-(bh + 2 * pm) // 8) * 8
    f1_rows = f0_rows + -(-2 * vmax // 8) * 8
    return f0_rows, f1_rows


def _make_me_kernel(
    steps, bh: int, wp: int, pm: int, vmax: int, costfn: str,
    chain: bool = True,
):
    patch = 2 * pm + 1
    f0_rows, f1_rows = _band_rows(bh, pm, vmax)
    axis_sets = _reachable_sets(steps)

    def boxsum(d):
        # d: [f0_rows, wp] diff rows for this map (tail pad rows unused);
        # returns [bh, wp]
        # patch sums at offset 0 (S(y, x) = sum_{k,j < patch} d[y+k, x+j])
        v = d[:bh]
        for k in range(1, patch):
            v = v + d[k : k + bh]
        s = v
        for j in range(1, patch):
            # left-shift by j lanes = roll right by wp - j (pltpu.roll
            # takes non-negative shifts); bit-identical to the slice,
            # wrap garbage stays in the cropped tail columns
            s = s + pltpu.roll(v, wp - j, 1)
        return s

    def kernel(f0_hbm, f1_hbm, u_ref, v_ref, f0b, f1b, rot, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * bh
        cp0 = pltpu.make_async_copy(
            f0_hbm.at[b, pl.ds(r0, f0_rows), :], f0b, sems.at[0]
        )
        cp1 = pltpu.make_async_copy(
            f1_hbm.at[b, pl.ds(r0, f1_rows), :], f1b, sems.at[1]
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        # stage the column-rotated frame1 copies: rot[s] holds
        # f1b shifted left by s lanes (s = vx + vmax >= 0, so no head
        # wrap; reads stay < wp - 2*vmax by the wrapper's geometry)
        for sft in range(2 * vmax + 1):
            rot[sft] = pltpu.roll(f1b[:], wp - sft, 1) if sft else f1b[:]

        f0 = f0b[:]

        # every map build is data-independent, so Mosaic's scheduler
        # keeps hundreds of [band, wp] temporaries live at once (the
        # pure-value form hit a 279 MB vmem stack). ``chain`` threads a
        # semantic no-op dependency (min(S[0,0], 0) == 0 for SAD/SSD,
        # but opaque to the compiler) from each map into the next
        # build, bounding the live set to ~CHAIN_K maps' temporaries.
        chain_q = []

        def smap(vy: int, vx: int):
            # transient cost map S_{vy,vx} [bh, wp] (int32)
            # row alignment: f0b row r is image row r0 + r - pm;
            # f1b row r is image row r0 + r - pad1. f0 row (y + k)
            # pairs with f1 row (y + k + vy)  =>  f1b index is
            # (y + k) + vy + vmax relative to f0b's.
            sl = rot[vx + vmax, pl.ds(vy + vmax, f0_rows), :]
            if chain and chain_q:
                # [1, wp] row: sublane-only broadcast (Mosaic cannot
                # broadcast a [1, 1] in both dims)
                sl = sl + jnp.minimum(chain_q[0][0:1, :], 0)
            if costfn == "sad":
                d = jnp.abs(f0 - sl)
            else:  # ssd
                d = (f0 - sl) * (f0 - sl)
            s = boxsum(d)
            chain_q.append(s)
            if len(chain_q) > CHAIN_K:
                chain_q.pop(0)
            return s

        dy = jnp.zeros((bh, wp), jnp.int32)
        dx = jnp.zeros((bh, wp), jnp.int32)
        for st, vals in zip(steps, axis_sets):
            offs = (-st, 0, st)
            costs = [None] * 9
            if vals == [0]:
                # first round: single state, no masks
                for ci in range(9):
                    costs[ci] = smap(offs[ci // 3], offs[ci % 3])
            else:
                for vy_s in vals:
                    for vx_s in vals:
                        m = (dy == vy_s) & (dx == vx_s)
                        for ci in range(9):
                            s = smap(vy_s + offs[ci // 3], vx_s + offs[ci % 3])
                            sel = jnp.where(m, s, 0)
                            costs[ci] = sel if costs[ci] is None else costs[ci] + sel
            # first-minimum argmin in row-major candidate order
            best_c = costs[0]
            best_i = jnp.zeros((bh, wp), jnp.int32)
            for ci in range(1, 9):
                better = costs[ci] < best_c
                best_c = jnp.where(better, costs[ci], best_c)
                best_i = jnp.where(better, ci, best_i)
            dy = dy + (best_i // 3 - 1) * st
            dx = dx + (best_i % 3 - 1) * st

        u_ref[0] = dx.astype(jnp.float32)
        v_ref[0] = dy.astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("search_size", "patch_size", "costfn", "interpret"),
)
def me_exact_pallas(
    gray0,
    gray1,
    search_size: int = 15,
    patch_size: int = 5,
    costfn: str = "sad",
    interpret: bool = False,
):
    """Unseeded exact block-matching flow [..., H, W, 2] float32,
    bit-identical to ops/motion._estimate_2d_smap / oracle/motion.

    Accepts [H, W] or [B, H, W] uint8/int frames. The caller (the
    ops/motion dispatcher) is responsible for geometry/costfn gating
    (SAD/SSD, tractable unroll count - see me_exact_pallas_supported).
    """
    gray0 = jnp.asarray(gray0)
    gray1 = jnp.asarray(gray1)
    squeeze = gray0.ndim == 2
    if squeeze:
        gray0, gray1 = gray0[None], gray1[None]
    bsz, h, w = gray0.shape
    pm = patch_size // 2
    steps = me_steps(search_size, patch_size)
    vmax = max(
        abs(v + o * st)
        for st, vals in zip(steps, _reachable_sets(steps))
        for v in vals
        for o in (-1, 0, 1)
    )
    pad1 = pm + vmax
    bh = min(BAND_H, max(8, -(-h // 8) * 8))
    hp = -(-h // bh) * bh
    # lane geometry: rotated reads reach col (w - 1 + patch - 1) and the
    # largest left-rotation is 2*vmax, whose wrap garbage occupies the
    # LAST 2*vmax columns - w + 2*pad1 already separates them
    wp = -(-(w + 2 * pad1) // 128) * 128
    f0_rows, f1_rows = _band_rows(bh, pm, vmax)
    # rows sized so the LAST band's (8-aligned) DMA stays in bounds
    f0e = jnp.zeros((bsz, hp - bh + f0_rows, wp), jnp.int32)
    f0e = jax.lax.dynamic_update_slice(
        f0e, gray0.astype(jnp.int32), (0, pm, pm)
    )
    f1e = jnp.zeros((bsz, hp - bh + f1_rows, wp), jnp.int32)
    f1e = jax.lax.dynamic_update_slice(
        f1e, gray1.astype(jnp.int32), (0, pad1, pad1)
    )

    # the scheduling chain is a Mosaic-only concern; it adds exactly 0
    # (min(S, 0) with S >= 0) but makes XLA's CPU compile of the
    # interpreted kernel pathologically slow
    kernel = _make_me_kernel(
        steps, bh, wp, pm, vmax, costfn, chain=not interpret
    )
    u, v = pl.pallas_call(
        kernel,
        grid=(bsz, hp // bh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec((1, bh, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f0_rows, wp), jnp.int32),
            pltpu.VMEM((f1_rows, wp), jnp.int32),
            pltpu.VMEM((2 * vmax + 1, f1_rows, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        # headroom for scheduler-hoisted rot reads (the chain bounds
        # everything downstream; the raw reads only depend on rot and
        # may still be scheduled ahead)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(f0e, f1e)
    # S(y, x) sums f0e/f1e starting at row/col (y, x), i.e. image patch
    # rows/cols (y - pm + k, x - pm + j) - exactly the oracle's
    # zero-padded patch; valid pixels are [:, :h, :w]
    flow = jnp.stack([u[:, :h, :w], v[:, :h, :w]], axis=-1)
    return flow[0] if squeeze else flow


def me_exact_pallas_supported(
    search_size: int, patch_size: int, costfn: str, max_builds: int = 600
) -> bool:
    """Geometry gate for the dispatcher: SAD/SSD and a tractable
    static unroll (the default 15/5 geometry builds 379 maps)."""
    if costfn not in ("sad", "ssd"):
        return False
    steps = me_steps(search_size, patch_size)
    if not steps:
        return False
    return _build_count(steps) <= max_builds
