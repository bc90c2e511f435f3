"""Fused Pallas TPU kernel for the FAST (masked-shift warp) motion mode.

The XLA fast path (ops/motion._estimate_2d_fast, warp_bound != None)
streams every intermediate - the warped frame, 27 shifted cost maps,
argmins and medians - through HBM: the device profile is ~50 small
slice-add fusions totalling ~8 ms per 16 VGA frames (619 MP/s device).
This kernel runs the SAME residual iteration per VMEM-resident row
band, so every warp/cost/median round-trips registers instead of HBM:

  per [BH, Wp] output band (grid = batch x bands), with G halo rows on
  each side (G = sum over rounds of (1 + step + pm): a median spreads
  state influence by 1 row, a candidate shift by step, a patch sum by
  pm - computing the state on BH + 2G rows makes the emitted interior
  EXACT while per-round garbage creeps inward from the band edges):
    DMA frame0's band and frame1's band (+ VM row reach) into VMEM
    stage the reachable column rotations of frame1 (union of the
      per-round reachable sets - 9 planes at 15/5, pltpu.roll)
    per round (step, vals = reachable residual set entering the round;
      see ops/motion's reachable-set warp note):
      w1 = sum_{vy,vx in vals^2} (dy==vy & dx==vx) * rot[vx][rows+vy]
      9 shifted SAD box sums over w1 vs frame0 -> first-minimum argmin
      dy/dx updated then 3x3-median-filtered with EDGE replication at
      the true image borders (global-row masks built from the band
      offset; global-column masks are static)

  Residuals start at 0 and integer select/min/median operations are
  order-exact, so the emitted flow is BIT-IDENTICAL to the XLA twin
  (asserted by tests/test_pallas.py across geometries, seeds, batches).

Reference scope: this accelerates the repo's own `fast` extension mode
(the reference's motion estimator is the exact per-pixel Python search,
me_pyramid.py:130-205, covered by the exact kernels in me_pallas.py).

Index conventions (band at output row r0 = i * bh):
  state row s        <-> global image row r0 - G + s          (S rows)
  f0b / dd row z     <-> global image row r0 - G - pm + z     (D rows)
  f1b / rot row z    <-> global image row r0 - G - pm - VM + z
  w1 state row s stages at w1s row s + 8
  lane c             <-> global image column c - CM
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclcomputervision_tpu.oracle.motion import MEDIAN9_EXCHANGES, me_steps
from oclcomputervision_tpu.ops.pallas.me_pallas import _reachable_sets

# column margin: rot wrap junk (<= 2*VM lanes) + the per-round garbage
# creep (G <= 17 at 15/5) must stay outside the image columns
_CM = 40
# VMEM budget for picking the band height. Hardware-calibrated at VGA:
# bh=256 (est. ~24 MB) compiles and runs; bh=480 (est. ~42 MB) hits a
# 113 MB scoped-vmem stack OOM - Mosaic's live set runs ~2.5x this
# estimate, so 24 MB maps to ~60-70 MB actual
_VMEM_BUDGET = 24 * 2**20


def _fast_geometry(steps, patch_size: int):
    """(G, VM, union) for a step schedule: per-side state halo (rounded
    so 2G is a sublane multiple), max reachable |displacement|, and the
    union of per-round reachable sets (the rot planes to stage)."""
    pm = patch_size // 2
    sets = _reachable_sets(steps)
    G = -(-sum(1 + st + pm for st in steps) // 4) * 4
    union = sorted({v for vals in sets for v in vals})
    VM = max(abs(v) for v in union)
    return G, VM, union


def _pick_bh(h: int, wp: int, steps, patch_size: int) -> int:
    """Band height minimizing TOTAL computed rows, ceil(h/bh)*(bh+2G),
    among multiple-of-8 heights whose VMEM working set (rot planes +
    ~16 live band-sized arrays) fits the budget. Rounding waste
    matters as much as halo amortization: at VGA, bh=368 computes
    2x(368+40) = 816 state rows while bh=240 computes 2x280 = 560
    (hardware: 485 vs ~600 MP/s)."""
    G, VM, union = _fast_geometry(steps, patch_size)
    best = None
    for bh in range(8, max(8, -(-h // 8) * 8) + 1, 8):
        S = bh + 2 * G
        rot = len(union) * (S + 8 + 2 * VM + 8) * wp * 4
        work = 16 * (S + 24) * wp * 4
        if rot + work > _VMEM_BUDGET:
            continue
        total = -(-h // bh) * S
        if best is None or total < best[0] or (
            total == best[0] and bh > best[1]
        ):
            best = (total, bh)
    return best[1] if best else 8


def _make_fast_kernel(steps, bh, wp, pm, h, w, costfn):
    patch = 2 * pm + 1
    G, VM, union = _fast_geometry(steps, patch)
    axis_sets = _reachable_sets(steps)
    S = bh + 2 * G               # state rows per band
    D = S + 8                    # diff rows (pm slack each side)
    f1_rows = -(-(D + 2 * VM) // 8) * 8
    pidx = {v: i for i, v in enumerate(union)}
    max_step = max(steps)
    assert 8 - pm - max_step >= 0, "w1s slice offset must stay >= 0"

    def kernel(f0_hbm, f1_hbm, u_ref, v_ref, f0b, f1b, rot, w1s, dys, dxs, sems):
        b = pl.program_id(0)
        i = pl.program_id(1)
        r0 = i * bh
        cp0 = pltpu.make_async_copy(
            f0_hbm.at[b, pl.ds(r0, D), :], f0b, sems.at[0]
        )
        cp1 = pltpu.make_async_copy(
            f1_hbm.at[b, pl.ds(r0, f1_rows), :], f1b, sems.at[1]
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        # stage the reachable column rotations: rot[pidx[v]][., c] =
        # f1b[., c + v] (wrap junk lands in the column margins)
        for v in union:
            sft = v + VM  # >= 0
            rot[pidx[v]] = pltpu.roll(f1b[:], (wp - sft) % wp, 1) if sft else f1b[:]

        f0 = f0b[:]  # [D, wp]

        # true-image edge masks for the median (rows depend on the
        # dynamic band offset; columns are static)
        gi = jax.lax.broadcasted_iota(jnp.int32, (S, wp), 0) + (r0 - G)
        gok_u = gi >= 1        # an up-neighbor row exists in the image
        gok_d = gi <= h - 2    # a down-neighbor row exists
        cg = jax.lax.broadcasted_iota(jnp.int32, (S, wp), 1) - _CM
        cok_l = cg >= 1        # a left-neighbor column exists
        cok_r = cg <= w - 2    # a right-neighbor column exists

        # the XLA twin zero-pads the DIFF beyond the image before its
        # box sum, but a shifted w1 read can carry real in-image data
        # into those positions (e.g. image col -1 reading col 0 after
        # a +1 shift) - mask every diff to the true image region
        giD = jax.lax.broadcasted_iota(jnp.int32, (D, wp), 0) + (r0 - G - pm)
        cgD = jax.lax.broadcasted_iota(jnp.int32, (D, wp), 1) - _CM
        dmask = (giD >= 0) & (giD < h) & (cgD >= 0) & (cgD < w)
        # ... and the XLA twin's w1 is zero OUTSIDE the image no matter
        # what (it only exists on [h, w] and is zero-padded): out-of-
        # image state rows here hold garbage displacements that could
        # index back into real frame data - zero them
        smask = (gi >= 0) & (gi < h) & (cg >= 0) & (cg < w)

        def boxsum(dd):
            # dd: [D, wp] diffs (dd row z <-> image row r0 - G - pm + z);
            # returns the CENTERED patch sum on the S state rows:
            # cost(s) = sum_{k,j in [0,patch)} dd[s + k, c + j - pm]
            v = dd[:S]
            for k in range(1, patch):
                v = v + dd[k : k + S]
            s = pltpu.roll(v, pm, 1)  # col c reads v col c - pm
            for j in range(1, patch):
                s = s + pltpu.roll(v, (pm - j) % wp, 1)
            return s

        def median3x3(a_ref):
            # 3x3 median of the staged state (rows [8, 8+S)) with
            # edge replication at the true image borders
            c = a_ref[pl.ds(8, S)]
            up = jnp.where(gok_u, a_ref[pl.ds(7, S)], c)
            dn = jnp.where(gok_d, a_ref[pl.ds(9, S)], c)
            vals9 = []
            for row in (up, c, dn):
                lf = jnp.where(cok_l, pltpu.roll(row, 1, 1), row)
                rt = jnp.where(cok_r, pltpu.roll(row, wp - 1, 1), row)
                vals9.extend([lf, row, rt])
            v = vals9

            def cx(a_, b_):
                lo = jnp.minimum(v[a_], v[b_])
                v[b_] = jnp.maximum(v[a_], v[b_])
                v[a_] = lo

            for a_, b_ in MEDIAN9_EXCHANGES:
                cx(a_, b_)
            return v[4]

        # zero the scratch edge rows once (diff slices / medians read
        # them; their contribution lands only in the garbage zone)
        w1s[pl.ds(0, 8)] = jnp.zeros((8, wp), jnp.int32)
        w1s[pl.ds(8 + S, 16)] = jnp.zeros((16, wp), jnp.int32)
        for ref in (dys, dxs):
            ref[pl.ds(0, 8)] = jnp.zeros((8, wp), jnp.int32)
            ref[pl.ds(8 + S, 8)] = jnp.zeros((8, wp), jnp.int32)

        dy = jnp.zeros((S, wp), jnp.int32)
        dx = jnp.zeros((S, wp), jnp.int32)

        for st, vals in zip(steps, axis_sets):
            # --- warp over the reachable residual set: w1 state row s
            # = f1[global(s) + dy, c + dx] -> rot row s + vy + pm + VM
            if vals == [0]:
                w1 = rot[pidx[0], pl.ds(pm + VM, S), :]
            else:
                w1 = jnp.zeros((S, wp), jnp.int32)
                mx = {v: dx == v for v in vals}
                for vy in vals:
                    inner = jnp.zeros((S, wp), jnp.int32)
                    for vx in vals:
                        sl = rot[pidx[vx], pl.ds(vy + pm + VM, S), :]
                        inner = inner + jnp.where(mx[vx], sl, 0)
                    w1 = w1 + jnp.where(dy == vy, inner, 0)
                w1 = jnp.where(smask, w1, 0)
            w1s[pl.ds(8, S)] = w1

            # --- 9 candidate costs + first-minimum argmin
            costs = []
            for oy in (-st, 0, st):
                # dd row z needs w1 state row (z - pm) + oy -> w1s row
                # z + oy + 8 - pm; offset 8 - pm + oy >= 0 by assert
                wsl = w1s[pl.ds(8 - pm + oy, D), :]
                for ox in (-st, 0, st):
                    sh = pltpu.roll(wsl, (wp - ox) % wp, 1) if ox else wsl
                    if costfn == "sad":
                        dd = jnp.abs(f0 - sh)
                    else:  # ssd
                        dd = (f0 - sh) * (f0 - sh)
                    costs.append(boxsum(jnp.where(dmask, dd, 0)))
            best_c = costs[0]
            best_i = jnp.zeros((S, wp), jnp.int32)
            for k in range(1, 9):
                better = costs[k] < best_c
                best_c = jnp.where(better, costs[k], best_c)
                best_i = jnp.where(better, k, best_i)

            dys[pl.ds(8, S)] = dy + (best_i // 3 - 1) * st
            dxs[pl.ds(8, S)] = dx + (best_i % 3 - 1) * st
            dy = median3x3(dys)
            dx = median3x3(dxs)

        u_ref[0] = dx[G : G + bh].astype(jnp.float32)
        v_ref[0] = dy[G : G + bh].astype(jnp.float32)

    return kernel, S, D, f1_rows


@functools.partial(
    jax.jit,
    static_argnames=("search_size", "patch_size", "costfn", "interpret"),
)
def me_fast_residual_pallas(
    gray0,
    base1,
    search_size: int = 15,
    patch_size: int = 5,
    costfn: str = "sad",
    interpret: bool = False,
):
    """Residual flow of the fast mode's masked-shift iteration,
    bit-identical to ops/motion._estimate_2d_fast's residual loop
    (match: the repo's own fast extension; the reference searches
    per-pixel in Python, me_pyramid.py:130-205).

    ``base1`` is the (already seed-base-warped) second frame; the
    caller owns seed/base handling. Accepts [H, W] or [B, H, W];
    returns int-valued float32 [..., H, W, 2] residuals (u, v).
    """
    gray0 = jnp.asarray(gray0)
    base1 = jnp.asarray(base1)
    squeeze = gray0.ndim == 2
    if squeeze:
        gray0, base1 = gray0[None], base1[None]
    bsz, h, w = gray0.shape
    pm = patch_size // 2
    steps = me_steps(search_size, patch_size)
    G, VM, union = _fast_geometry(steps, patch_size)

    # wrap junk from the rot staging occupies <= 2*VM lanes at the
    # array tail and creeps inward <= G columns over the rounds; the
    # gate (max step <= 8 - pm) bounds the worst case at exactly 40
    assert 2 * VM + G <= _CM, (VM, G, _CM)
    wp = -(-(w + 2 * _CM) // 128) * 128
    bh = _pick_bh(h, wp, steps, patch_size)
    hp = -(-h // bh) * bh
    kernel, S, D, f1_rows = _make_fast_kernel(
        steps, bh, wp, pm, h, w, costfn
    )

    f0e = jnp.zeros((bsz, hp - bh + D, wp), jnp.int32)
    f0e = jax.lax.dynamic_update_slice(
        f0e, gray0.astype(jnp.int32), (0, G + pm, _CM)
    )
    # the rot staging shifts by v + VM (non-negative rolls), so the
    # image sits VM columns further right in f1e to compensate
    f1e = jnp.zeros((bsz, hp - bh + f1_rows, wp), jnp.int32)
    f1e = jax.lax.dynamic_update_slice(
        f1e, base1.astype(jnp.int32), (0, G + pm + VM, _CM + VM)
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
            pltpu.VMEM((D, wp), jnp.int32),
            pltpu.VMEM((f1_rows, wp), jnp.int32),
            pltpu.VMEM((len(union), f1_rows, wp), jnp.int32),
            pltpu.VMEM((S + 24, wp), jnp.int32),  # w1 staging
            pltpu.VMEM((S + 16, wp), jnp.int32),  # dy staging
            pltpu.VMEM((S + 16, wp), jnp.int32),  # dx staging
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(f0e, f1e)
    du = u[:, :h, _CM : _CM + w]
    dv = v[:, :h, _CM : _CM + w]
    out = jnp.stack([du, dv], axis=-1)
    return out[0] if squeeze else out


def me_fast_pallas_supported(
    search_size: int, patch_size: int, costfn: str
) -> bool:
    """Dispatcher gate: SAD/SSD, a step schedule, slice offsets that
    stay non-negative (8 - pm - max step >= 0), and a reachable-set
    footprint whose wrap junk + garbage creep fits the column margin
    (2*VM + G <= _CM; e.g. search 16 / patch 1 gives steps [8,4,2,1]
    with 2*14 + 20 = 48 > 40 and must fall back to XLA)."""
    if costfn not in ("sad", "ssd"):
        return False
    steps = me_steps(search_size, patch_size)
    if not steps:
        return False
    if 8 - patch_size // 2 - max(steps) < 0:
        return False
    G, VM, _ = _fast_geometry(steps, patch_size)
    return 2 * VM + G <= _CM
