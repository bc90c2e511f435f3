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


def _make_boxsum(patch: int, bh: int, f0_rows: int, wp: int):
    """patch x patch box sum: [f0_rows, wp] diff rows -> [bh, wp]
    patch sums at offset 0 (S(y, x) = sum_{k,j < patch} d[y+k, x+j]).
    Row sums use sublane value slices, column sums lane rolls; the
    left-shift by j lanes = roll right by wp - j (pltpu.roll takes
    non-negative shifts), wrap garbage stays in the cropped tail
    columns.
    ``f0_rows`` is the diff-row count the sublane slices read from -
    asserted here so a mis-sized band fails at trace time, not with
    out-of-range slices inside Mosaic.

    DELIBERATELY SEQUENTIAL: every slice/roll reads the SAME source
    value (d resp. v), so the shuffles are mutually independent and
    pipeline behind the add chain. A balanced log-tree runsum
    (~2*log2(n) ops instead of 2*(n-1)) was measured on hardware at
    87.7 MP/s vs 149.3 for this form — the tree's rolls each read the
    PREVIOUS partial sum, a fully serial chain that costs far more
    than the saved ops (ROADMAP, round 3)."""
    assert f0_rows >= bh + patch - 1, (f0_rows, bh, patch)

    def boxsum(d):
        v = d[:bh]
        for k in range(1, patch):
            v = v + d[k : k + bh]
        s = v
        for j in range(1, patch):
            s = s + pltpu.roll(v, wp - j, 1)
        return s

    return boxsum


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
):
    patch = 2 * pm + 1
    f0_rows, f1_rows = _band_rows(bh, pm, vmax)
    axis_sets = _reachable_sets(steps)
    boxsum = _make_boxsum(patch, bh, f0_rows, wp)

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

        def smap(vy: int, vx: int):
            # transient cost map S_{vy,vx} [bh, wp] (int32)
            # row alignment: f0b row r is image row r0 + r - pm;
            # f1b row r is image row r0 + r - pad1. f0 row (y + k)
            # pairs with f1 row (y + k + vy)  =>  f1b index is
            # (y + k) + vy + vmax relative to f0b's.
            # NOTE: the builds are left data-independent ON PURPOSE.
            # A "scheduling chain" variant (each map's band read
            # perturbed by min(prev_map, 0), an opaque zero) was
            # measured on hardware and BLEW UP register allocation —
            # 203 MB of spill slots vs a clean compile without it;
            # Mosaic handles the unordered straight-line form fine.
            sl = rot[vx + vmax, pl.ds(vy + vmax, f0_rows), :]
            if costfn == "sad":
                d = jnp.abs(f0 - sl)
            else:  # ssd
                d = (f0 - sl) * (f0 - sl)
            return boxsum(d)

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
                # per-axis masks built once (|vals| + |vals| compares
                # instead of 2 per state pair): 162.7 vs 154.6 MP/s on
                # hardware, bit-identical (ROADMAP, round 3)
                mys = {vy_s: dy == vy_s for vy_s in vals}
                mxs = {vx_s: dx == vx_s for vx_s in vals}
                for vy_s in vals:
                    for vx_s in vals:
                        m = mys[vy_s] & mxs[vx_s]
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

    kernel = _make_me_kernel(steps, bh, wp, pm, vmax, costfn)
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
        # headroom for the rot scratch + scheduler lookahead
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


def _band_bases(ay, ax, bh: int, hp: int):
    """Per-band bases + max residuals of the clipped integer seed planes.

    ``ay``/``ax`` are [bsz, h, w] int32 (already clipped to [-B, B]);
    rows are edge-extended to ``hp`` so a partial last band is sized
    from real data, not padding zeros. Returns four [bsz, hp//bh] int32
    arrays (by, bx, ry, rx): midpoint bases and the max |value - base|
    residual per band per axis. The ROW base is additionally rounded to
    the nearest multiple of 8 (cost: <= 4 extra residual): it offsets
    the band's f1 DMA start, and Mosaic requires dynamic sublane starts
    provably divisible by the (8, 128) tile - the rounding is what lets
    the kernel assert pl.multiple_of(. , 8). Plain jnp so the
    dispatcher can evaluate the SAME formula eagerly when sizing the
    static residual bound (seeded_rebase_bound) - one implementation,
    no drift."""
    bsz, h, w = ay.shape

    def bases(a, sublane_quant):
        a = jnp.pad(a, ((0, 0), (0, hp - h), (0, 0)), mode="edge")
        a = a.reshape(bsz, hp // bh, bh * w)
        lo = jnp.min(a, axis=2)
        hi = jnp.max(a, axis=2)
        base = (lo + hi) // 2
        if sublane_quant:
            base = ((base + 4) // 8) * 8
        resid = jnp.maximum(hi - base, base - lo)
        return base, resid

    by, ry = bases(ay, True)
    bx, rx = bases(ax, False)
    return by, bx, ry, rx


REBASE_QUANTA = (4, 8, 12, 16, 20, 24)


@functools.partial(jax.jit, static_argnames=("bh", "hp"))
def _band_minmax_jit(seed, bh: int, hp: int):
    """Per-band min/max of the raw [bsz, h, w, 2] seed: [bsz, nb, 2, 2]
    (last dims: component u/v, min/max). Rows edge-extended to hp like
    _band_bases, so a partial last band reduces over real data only."""
    bsz, h = seed.shape[0], seed.shape[1]
    s = jnp.pad(seed, ((0, 0), (0, hp - h), (0, 0), (0, 0)), mode="edge")
    s = s.transpose(0, 3, 1, 2).reshape(bsz, 2, hp // bh, -1)
    mm = jnp.stack([jnp.min(s, axis=3), jnp.max(s, axis=3)], axis=-1)
    return mm.transpose(0, 2, 1, 3)  # [bsz, nb, comp, min/max]


def seed_band_stats(seed, h: int):
    """ONE tiny device->host readback with everything the host-side
    seed sizing needs: per-band min/max of the raw seed.

    Every host decision about a concrete seed (seed_bound='auto'
    quantization, saturation warnings, rebase-bound sizing) reduces to
    per-band extrema, and min/max commute with the monotone trunc/clip
    those decisions apply - so ONE [bsz, nbands, 2, 2] readback
    replaces three full-field [H, W, 2] transfers through the tunnel
    per seeded call (~2.4 MB each at VGA; the stats are < 1 KB).
    Returns np [bsz, nbands, 2, 2] (component u/v, min/max), or None
    for tracers."""
    if seed is None or isinstance(seed, jax.core.Tracer):
        return None
    bh = min(BAND_H, max(8, -(-h // 8) * 8))
    hp = -(-h // bh) * bh
    if isinstance(seed, np.ndarray):  # host seed: no device round trip
        if seed.ndim == 3:
            seed = seed[None]
        s = np.pad(
            seed, ((0, 0), (0, hp - seed.shape[1]), (0, 0), (0, 0)),
            mode="edge",
        )
        s = s.transpose(0, 3, 1, 2).reshape(seed.shape[0], 2, hp // bh, -1)
        mm = np.stack([s.min(axis=3), s.max(axis=3)], axis=-1)
        return mm.transpose(0, 2, 1, 3)
    seed = jnp.asarray(seed)
    if seed.ndim == 3:
        seed = seed[None]
    return np.asarray(_band_minmax_jit(seed, bh, hp))


def stats_base_max(stats) -> float:
    """max |trunc(seed)| over the whole field, from seed_band_stats
    output (|trunc| attains its max at a per-band extremum)."""
    return float(np.max(np.abs(np.trunc(stats))))


def seeded_rebase_bound(seed, h: int, seed_bound: int, stats=None):
    """Static per-band rebase residual bound for me_exact_pallas_seeded.

    The seeded search's device cost is quadratic in the scan width
    2*bound + O(1) (round-4 probe: 9.7 ms/VGA frame at B=8 -> 63.4 at
    B=32), but a pyramid seed's RANGE within one 32-row band is far
    narrower than its global range (Middlebury finest level: global
    |seed| reaches 29 px, per-band midpoint residuals max 20). Rebasing
    each band at its midpoint lets the kernel scan +-B_eff around a
    per-band base instead of +-B around zero - bit-identical (same
    absolute candidates, same tie order), just indexed differently.

    ``stats`` (from seed_band_stats) sizes the bound from per-band
    extrema without touching the full field: min/max commute with the
    monotone trunc/clip, so clip(trunc(extremum)) IS the extremum of
    the clipped trunc planes the device-side _band_bases reduces -
    the two computations agree exactly by construction.

    Returns the smallest quantum in REBASE_QUANTA that covers every
    band's midpoint residual of trunc(seed) clipped to [-seed_bound,
    seed_bound], or None when the seed is a tracer (no concrete bands
    to size) or no quantum < seed_bound covers it (rebasing would not
    shrink the scan). Quantized so compile variants stay bounded."""
    if stats is None:
        stats = seed_band_stats(seed, h)
    if stats is None:  # tracer
        return None
    B = int(seed_bound)
    ext = np.clip(np.trunc(stats), -B, B).astype(np.int32)
    lo_x, hi_x = ext[:, :, 0, 0], ext[:, :, 0, 1]
    lo_y, hi_y = ext[:, :, 1, 0], ext[:, :, 1, 1]
    # same base/residual formulas as the device-side _band_bases
    by = ((((lo_y + hi_y) // 2) + 4) // 8) * 8
    bx = (lo_x + hi_x) // 2
    ry = np.maximum(hi_y - by, by - lo_y)
    rx = np.maximum(hi_x - bx, bx - lo_x)
    resid = max(int(ry.max()), int(rx.max()))
    for q in REBASE_QUANTA:
        if q >= B:
            return None
        if resid <= q:
            return q
    return None


def _make_me_seeded_kernel(
    steps, bh: int, wp: int, pm: int, vmax: int, B: int, costfn: str,
    B_eff=None,
):
    """Seeded twin of _make_me_kernel (pyramid levels > 0).

    Same VMEM-resident band search, but the per-pixel state starts at
    the CLAMPED seed base (|a| <= B) instead of 0, so the per-round
    reachable sets are the contiguous ranges aset_k = [-B,B] (+) vals_k
    (ops/motion._estimate_2d_smap_seeded's closure). The column-
    displacement loop becomes a lax.fori_loop over rot plane indices
    (a static unroll of the ~2800 builds would be a ~70K-op program),
    with the row-displacement builds unrolled inside the body - row
    reads stay STATIC sublane slices (a dynamic sublane start would
    need an alignment proof Mosaic can't make), and loop overhead
    amortizes over ~ny builds. The hierarchical per-axis selection
    accumulates into a VMEM scratch R[oi, j] = sum_vy (ay == vy) *
    S_{vy + off[oi], xneed[j]} (stage A), then 9 candidate costs are
    selected per column displacement (stage B) - O(|aset|) masked adds
    per candidate instead of O(|aset|^2).

    ``B_eff`` (< B) switches on PER-BAND REBASING: the kernel receives
    per-band bases (by, bx) as SMEM scalars and scans only +-B_eff
    around them instead of +-B around zero - the quadratic scan width
    shrinks from 2B+O(1) to 2*B_eff+O(1). Rows rebase in the f1 DMA
    start (row bases are sublane-quantized to multiples of 8 by
    _band_bases, so the dynamic start carries a pl.multiple_of(., 8)
    proof Mosaic demands of tiled dynamic slices);
    columns rebase in the rot-plane index (dim 0 of the scratch is
    already a dynamic index). Bit-identical to the unrebased kernel
    whenever every band's residual fits B_eff (seeded_rebase_bound
    guarantees it); residuals beyond B_eff clamp to the band-local
    window [base - B_eff, base + B_eff]. A scanned absolute
    displacement can exceed +-vmax when |base| + B_eff + rel > B + rel
    - such candidates are unreachable by any valid state (|state| <= B
    + max vals), so their plane index clamps into range and their
    garbage slabs die in all-False masks (integer zeros, no poison).
    """
    patch = 2 * pm + 1
    rebase = B_eff is not None
    vmax_b = (vmax - B + B_eff) if rebase else vmax  # rows f1b must span
    f0_rows, f1_rows = _band_rows(bh, pm, vmax_b)
    BB = B_eff if rebase else B
    axis_sets = _reachable_sets(steps)
    boxsum = _make_boxsum(patch, bh, f0_rows, wp)

    def kernel(*refs):
        if rebase:
            (f0_hbm, f1_hbm, ay_ref, ax_ref, by_ref, bx_ref, rx_ref,
             u_ref, v_ref, f0b, f1b, rot, Rs, sems) = refs
        else:
            (f0_hbm, f1_hbm, ay_ref, ax_ref,
             u_ref, v_ref, f0b, f1b, rot, Rs, sems) = refs
        b = pl.program_id(0)
        i = pl.program_id(1)
        if rebase:
            by = by_ref[b, i]
            bx = bx_ref[b, i]
            # this band's actual max column residual (<= B_eff): lets
            # the column scan and the rot build skip planes no pixel
            # of the band can reach (their R slabs would only ever be
            # consumed under all-False ax==vx masks)
            rx_b = rx_ref[b, i]
        else:
            by = bx = 0
        r0 = i * bh
        cp0 = pltpu.make_async_copy(
            f0_hbm.at[b, pl.ds(r0, f0_rows), :], f0b, sems.at[0]
        )
        # rebased f1 band: image sits at row pm + vmax_b + Bq in f1e,
        # so reading from r0 + by + Bq centers the band's +-vmax_b
        # reach on its base displacement (start >= 0 since by >= -Bq).
        # by is a multiple of 8 by construction (_band_bases) and Bq
        # rounds B up to one, so the dynamic start provably satisfies
        # the (8, 128) sublane tiling - assert it via pl.multiple_of.
        Bq = -(-B // 8) * 8
        f1_start = (
            pl.multiple_of(r0 + by + Bq, 8) if rebase else r0
        )
        cp1 = pltpu.make_async_copy(
            f1_hbm.at[b, pl.ds(f1_start, f1_rows), :],
            f1b, sems.at[1],
        )
        cp0.start()
        cp1.start()
        cp0.wait()
        cp1.wait()

        for sft in range(2 * vmax + 1):
            if rebase and sft:
                # only planes within this band's column reach (its
                # actual residual rx_b plus the rounds' total step
                # reach) are ever read - skip the rest
                @pl.when(jnp.abs(sft - (bx + vmax)) <= rx_b + (vmax - B))
                def _build(sft=sft):
                    rot[sft] = pltpu.roll(f1b[:], wp - sft, 1)
            else:
                rot[sft] = pltpu.roll(f1b[:], wp - sft, 1) if sft else f1b[:]

        f0 = f0b[:]
        ay = ay_ref[0]
        ax = ax_ref[0]
        if rebase:
            # band-local residual state (clip bounds misuse; a no-op
            # whenever seeded_rebase_bound sized B_eff)
            ay = jnp.clip(ay - by, -BB, BB)
            ax = jnp.clip(ax - bx, -BB, BB)

        for st, vals in zip(steps, axis_sets):
            a_lo = -BB + min(vals)
            a_hi = BB + max(vals)
            na = a_hi - a_lo + 1
            x_lo = a_lo - st
            nx = na + 2 * st
            offs = (-st, 0, st)

            # stage A loops the COLUMN displacement dynamically (a rot
            # plane index - dim 0 of the scratch needs no alignment
            # proof) and unrolls the ROW displacement statically (a
            # dynamic sublane start would need a static multiple-of-8
            # proof Mosaic can't make). R[oi, k] = sum_vy (ay == vy) *
            # S_{vy+offs[oi], x_lo+k} is complete within iteration k,
            # so it accumulates in REGISTERS and stores ONCE (an RMW
            # variant through the scratch measured 1.6x slower: 19 MB
            # of VMEM round-trips per iteration vs 0.3 of stores).
            def body_u(k, carry, ay=ay, x_lo=x_lo, nx=nx, offs=offs,
                       a_lo=a_lo, a_hi=a_hi):
                # rebased plane index: absolute dx = (x_lo + k) + bx.
                # The clip keeps unreachable extremes (|bx| + vmax_b >
                # vmax) in bounds; their slabs die in all-False masks.
                pidx = k + (x_lo + vmax)
                if rebase:
                    pidx = jnp.clip(pidx + bx, 0, 2 * vmax)
                acc = [None, None, None]
                for u in range(x_lo, x_lo + nx):  # static row displ.
                    sl = rot[
                        pl.ds(pidx, 1),
                        pl.ds(u + vmax_b, f0_rows),
                        :,
                    ][0]
                    if costfn == "sad":
                        d = jnp.abs(f0 - sl)
                    else:  # ssd
                        d = (f0 - sl) * (f0 - sl)
                    s = boxsum(d)
                    for oi, oy in enumerate(offs):
                        vy = u - oy
                        if a_lo <= vy <= a_hi:  # static edge skip
                            sel = jnp.where(ay == vy, s, 0)
                            acc[oi] = sel if acc[oi] is None else acc[oi] + sel
                for oi in range(3):
                    Rs[oi, pl.ds(k, 1)] = acc[oi][None]
                return carry
            if rebase:
                # trim the column scan to this band's actual residual
                # range: slabs outside [BB - rx_b, nx - (BB - rx_b))
                # are only ever consumed under all-False ax==vx masks
                # (no pixel's state can reach them), so their garbage
                # is harmless and their build is skippable
                mx = jnp.maximum(BB - rx_b, 0)
                jax.lax.fori_loop(mx, nx - mx, body_u, 0, unroll=False)
            else:
                jax.lax.fori_loop(0, nx, body_u, 0, unroll=False)

            # stage B: static unroll (aset is a static range, so every
            # slab index and mask compare is static; the 9 cost
            # accumulators stay in registers like the unseeded kernel's)
            costs = [None] * 9
            for vx in range(a_lo, a_hi + 1):
                m = ax == vx
                for ci in range(9):
                    slab = Rs[ci // 3, vx + offs[ci % 3] - x_lo]
                    sel = jnp.where(m, slab, 0)
                    costs[ci] = sel if costs[ci] is None else costs[ci] + sel

            best_c = costs[0]
            best_i = jnp.zeros((bh, wp), jnp.int32)
            for ci in range(1, 9):
                better = costs[ci] < best_c
                best_c = jnp.where(better, costs[ci], best_c)
                best_i = jnp.where(better, ci, best_i)
            ay = ay + (best_i // 3 - 1) * st
            ax = ax + (best_i % 3 - 1) * st

        u_ref[0] = ((ax + bx) if rebase else ax).astype(jnp.float32)
        v_ref[0] = ((ay + by) if rebase else ay).astype(jnp.float32)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_size", "patch_size", "costfn", "seed_mode", "seed_bound",
        "rebase_bound", "interpret",
    ),
)
def me_exact_pallas_seeded(
    gray0,
    gray1,
    seed,
    search_size: int = 15,
    patch_size: int = 5,
    costfn: str = "sad",
    seed_mode: str = "shipped",
    seed_bound: int = 8,
    rebase_bound=None,
    interpret: bool = False,
):
    """Seeded exact block-matching flow, bit-identical to
    ops/motion._estimate_2d_smap_seeded (and to oracle/motion whenever
    |trunc(seed)| <= seed_bound).

    Accepts [H, W] or [B, H, W] frames with seed [..., H, W, 2].

    ``rebase_bound`` (static, < seed_bound) turns on per-band seed
    rebasing: each 32-row band scans only +-rebase_bound around its
    midpoint base instead of +-seed_bound around zero, cutting the
    quadratic scan cost (see _make_me_seeded_kernel). Bit-identical to
    rebase_bound=None whenever every band's midpoint residual fits the
    bound - size it with seeded_rebase_bound (the dispatcher does).

    ``rebase_bound='dynamic'`` makes the rebasing TRACER-SAFE: the
    per-band residual bound is computed ON DEVICE (the same
    _band_bases formula the host sizing uses) and a lax.switch selects
    among the precompiled static variants - the quanta in
    REBASE_QUANTA that fit under ``seed_bound``, plus the unrebased
    kernel as the covering fallback. The selected branch is exactly
    the variant the eager dispatcher would have picked from a concrete
    seed (same formula, same quanta, same covering rule), so
    jit(pyramid) is bit-identical to the eager pyramid while keeping
    the rebased scan cost. Costs one compile per variant (cached);
    runtime executes only the selected branch.
    """
    gray0 = jnp.asarray(gray0)
    gray1 = jnp.asarray(gray1)
    seed = jnp.asarray(seed)
    squeeze = gray0.ndim == 2
    if squeeze:
        gray0, gray1, seed = gray0[None], gray1[None], seed[None]
    if rebase_bound == "dynamic":
        B = int(seed_bound)
        quanta = [q for q in REBASE_QUANTA if q < B]
        impl = functools.partial(
            _seeded_impl,
            gray0, gray1, seed, search_size, patch_size, costfn,
            seed_mode, B, interpret=interpret,
        )
        if not quanta:
            out = impl(rebase_bound=None)
            return out[0] if squeeze else out
        # device-side twin of seeded_rebase_bound: per-band midpoint
        # residuals of the clipped trunc planes (identical formula via
        # the shared _band_bases), covered by the smallest quantum
        bsz, h = gray0.shape[0], gray0.shape[1]
        bh = min(BAND_H, max(8, -(-h // 8) * 8))
        hp = -(-h // bh) * bh
        ay0 = jnp.clip(jnp.trunc(seed[..., 1]).astype(jnp.int32), -B, B)
        ax0 = jnp.clip(jnp.trunc(seed[..., 0]).astype(jnp.int32), -B, B)
        _, _, ry, rx = _band_bases(ay0, ax0, bh, hp)
        resid = jnp.maximum(jnp.max(ry), jnp.max(rx))
        # branch index: first quantum >= resid, else the unrebased tail
        idx = sum((resid > q).astype(jnp.int32) for q in quanta)
        branches = [
            functools.partial(impl, rebase_bound=q) for q in quanta
        ] + [functools.partial(impl, rebase_bound=None)]
        out = jax.lax.switch(idx, branches)
        return out[0] if squeeze else out
    out = _seeded_impl(
        gray0, gray1, seed, search_size, patch_size, costfn, seed_mode,
        int(seed_bound), rebase_bound, interpret=interpret,
    )
    return out[0] if squeeze else out


def _seeded_impl(
    gray0,
    gray1,
    seed,
    search_size: int,
    patch_size: int,
    costfn: str,
    seed_mode: str,
    seed_bound: int,
    rebase_bound,
    interpret: bool = False,
):
    """One static-variant seeded search (see me_exact_pallas_seeded)."""
    bsz, h, w = gray0.shape
    pm = patch_size // 2
    B = int(seed_bound)
    steps = me_steps(search_size, patch_size)
    axis_sets = _reachable_sets(steps)
    rel_max = max(
        abs(v + o * st)
        for st, vals in zip(steps, axis_sets)
        for v in vals
        for o in (-1, 0, 1)
    )
    vmax = B + rel_max
    rebase = rebase_bound is not None and int(rebase_bound) < B
    B_eff = int(rebase_bound) if rebase else None
    BB = B_eff if rebase else B
    vmax_b = BB + rel_max  # per-band reach (== vmax when not rebasing)
    nxmax = max(
        (BB + max(vals)) - (-BB + min(vals)) + 2 * st + 1
        for st, vals in zip(steps, axis_sets)
    )
    pad1 = pm + vmax
    bh = min(BAND_H, max(8, -(-h // 8) * 8))
    hp = -(-h // bh) * bh
    wp = -(-(w + 2 * pad1) // 128) * 128
    f0_rows, f1_rows = _band_rows(bh, pm, vmax_b)
    f0e = jnp.zeros((bsz, hp - bh + f0_rows, wp), jnp.int32)
    f0e = jax.lax.dynamic_update_slice(
        f0e, gray0.astype(jnp.int32), (0, pm, pm)
    )
    # rebased rows need slack for the dynamic band start r0 + by + Bq
    # (by a multiple of 8 in [-Bq, Bq], Bq = B rounded up to one): the
    # image sits at row pm + vmax_b + Bq and the buffer carries 2*Bq
    # extra rows; columns keep the full +-vmax pad (the rot planes
    # span every absolute column displacement)
    Bq = -(-B // 8) * 8
    row_img = pm + vmax_b + Bq if rebase else pad1
    row_slack = 2 * Bq if rebase else 0
    f1e = jnp.zeros((bsz, hp - bh + f1_rows + row_slack, wp), jnp.int32)
    f1e = jax.lax.dynamic_update_slice(
        f1e, gray1.astype(jnp.int32), (0, row_img, pad1)
    )

    seed_u = seed[..., 0].astype(jnp.float32)
    seed_v = seed[..., 1].astype(jnp.float32)
    ay0 = jnp.clip(jnp.trunc(seed_v).astype(jnp.int32), -B, B)
    ax0 = jnp.clip(jnp.trunc(seed_u).astype(jnp.int32), -B, B)
    aye = jnp.zeros((bsz, hp, wp), jnp.int32)
    aye = jax.lax.dynamic_update_slice(aye, ay0, (0, 0, 0))
    axe = jnp.zeros((bsz, hp, wp), jnp.int32)
    axe = jax.lax.dynamic_update_slice(axe, ax0, (0, 0, 0))

    band_spec = lambda: pl.BlockSpec(
        (1, bh, wp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
        band_spec(),
        band_spec(),
    ]
    inputs = [f0e, f1e, aye, axe]
    if rebase:
        # whole [bsz, nbands] arrays in SMEM (blocked scalar specs are
        # rejected by the compiled lowering); the kernel indexes them
        # with its program ids. rx (per-band max column residual) lets
        # the kernel trim its column scan and rot build per band.
        by, bx, _, rx = _band_bases(ay0, ax0, bh, hp)
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ]
        inputs += [by, bx, rx]

    kernel = _make_me_seeded_kernel(
        steps, bh, wp, pm, vmax, B, costfn, B_eff=B_eff
    )
    u, v = pl.pallas_call(
        kernel,
        grid=(bsz, hp // bh),
        in_specs=in_specs,
        out_specs=[band_spec(), band_spec()],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, hp, wp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((f0_rows, wp), jnp.int32),
            pltpu.VMEM((f1_rows, wp), jnp.int32),
            pltpu.VMEM((2 * vmax + 1, f1_rows, wp), jnp.int32),
            pltpu.VMEM((3, nxmax, bh, wp), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20
        ),
        interpret=interpret,
    )(*inputs)
    du = u[:, :h, :w]
    dv = v[:, :h, :w]
    if seed_mode == "shipped":
        out = jnp.stack([seed_u + du, seed_v + dv], axis=-1)
    else:
        out = jnp.stack([du, dv], axis=-1)
    return out


def me_exact_pallas_seeded_supported(
    search_size: int, patch_size: int, costfn: str, seed_bound: int
) -> bool:
    """Geometry gate for the seeded kernel: SAD/SSD, a step schedule,
    and a bounded clamp (rot + R scratches scale with the bound).

    B <= 32 is hardware-validated at the 15/5 geometry (round-4 probe:
    B = 20/24/32 all compile under the 100 MB VMEM limit - ~54 MB of
    declared scratch at B = 32 - and are bit-identical to the XLA
    seeded path; device cost scales linearly with the nx^2 build count,
    9.7 ms/VGA frame at B=8 -> 63 ms at B=32). B=32 covers the repo's
    own Middlebury benchmark, whose finest-level seeds reach 29 px over
    9.6% of pixels - clamping at the old 16 cap cost 0.05 EPE."""
    if costfn not in ("sad", "ssd"):
        return False
    if not (0 < int(seed_bound) <= 32):
        return False
    return bool(me_steps(search_size, patch_size))


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
