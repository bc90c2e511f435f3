"""TPU-native pyramidal dense block-matching motion estimation.

The reference runs a per-pixel Python loop with a shrinking-step SAD
search (motion_estimation/me_pyramid.py:130-205) - the slowest path in
the toolkit (SURVEY.md §3.4). Here every pixel searches simultaneously:
each of the 3 shrinking-step rounds gathers one (patch+2*step)^2 window
per pixel around its current center, evaluates the 3x3 candidate offsets
{-step,0,+step}^2 with integer SAD on the VPU, and recenters via argmin.
The sequential structure that remains (3 rounds) is the algorithm's own
data dependence; each round is one fused device pass over the image
instead of ~300k Python iterations.

Semantics (incl. zero-padded out-of-bounds windows, first-minimum
tie-breaking in row-major (dy, dx) order, and the 'shipped' seed
double-count quirk) match oracle/motion.py exactly - see its docstring.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oclcomputervision_tpu.oracle.motion import MEDIAN9_EXCHANGES, gaussian2d, me_steps


def _cost(patches, cand, costfn: str, patch_size: int):
    """Candidate cost over the trailing [ps, ps] axes (me_pyramid.py:29-48).

    SAD/SSD stay in int32 (exact, VPU-friendly); the WSAD variants use
    float32 with the reference's 5x5 sigma=2 Gaussian - 'wsad_shipped'
    keeps the np.dot-as-matmul quirk (fidelity note 9), 'wsad' is the
    intended elementwise weighting.
    """
    if costfn == "sad":
        return jnp.sum(jnp.abs(patches - cand), axis=(2, 3))
    if costfn == "ssd":
        d = patches - cand
        return jnp.sum(d * d, axis=(2, 3))
    w = jnp.asarray(
        gaussian2d((patch_size, patch_size), 2.0), jnp.float32
    )
    p0 = patches.astype(jnp.float32)
    p1 = cand.astype(jnp.float32)
    if costfn == "wsad_shipped":
        return jnp.sum(jnp.abs(p0 @ w - p1 @ w), axis=(2, 3))
    if costfn == "wsad":
        return jnp.sum(jnp.abs(p0 - p1) * w, axis=(2, 3))
    raise ValueError(f"unknown costfn {costfn!r}")


def _gather_padded_u8(img: jnp.ndarray, yy: jnp.ndarray, xx: jnp.ndarray) -> jnp.ndarray:
    """img[yy, xx] with zeros outside (me_pyramid.py:89-127 semantics)."""
    h, w = img.shape
    valid = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
    flat = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
    vals = jnp.take(img.reshape(-1), flat)
    return jnp.where(valid, vals, jnp.uint8(0))


@functools.partial(
    jax.jit,
    static_argnames=("search_size", "patch_size", "seed_mode", "has_seed", "costfn"),
)
def _estimate_2d(
    gray0, gray1, seed, search_size, patch_size, seed_mode, has_seed, costfn="sad"
):
    h, w = gray0.shape
    pm = patch_size // 2
    ys, xs = jnp.mgrid[0:h, 0:w]
    ys = ys.astype(jnp.int32)
    xs = xs.astype(jnp.int32)

    if has_seed:
        seed_u = seed[..., 0].astype(jnp.float32)
        seed_v = seed[..., 1].astype(jnp.float32)
    else:
        seed_u = jnp.zeros((h, w), jnp.float32)
        seed_v = jnp.zeros((h, w), jnp.float32)

    cy = ys + jnp.trunc(seed_v).astype(jnp.int32)
    cx = xs + jnp.trunc(seed_u).astype(jnp.int32)

    offs = jnp.arange(patch_size, dtype=jnp.int32) - pm
    patches = _gather_padded_u8(
        gray0,
        ys[:, :, None, None] + offs[None, None, :, None],
        xs[:, :, None, None] + offs[None, None, None, :],
    ).astype(jnp.int32)

    for step in me_steps(search_size, patch_size):
        k = patch_size + 2 * step  # candidate window extent
        woffs = jnp.arange(k, dtype=jnp.int32) - (pm + step)
        window = _gather_padded_u8(
            gray1,
            cy[:, :, None, None] + woffs[None, None, :, None],
            cx[:, :, None, None] + woffs[None, None, None, :],
        ).astype(jnp.int32)

        sads = []
        for iy in range(3):
            for ix in range(3):
                cand = jax.lax.slice(
                    window,
                    (0, 0, iy * step, ix * step),
                    (h, w, iy * step + patch_size, ix * step + patch_size),
                )
                sads.append(_cost(patches, cand, costfn, patch_size))
        best = jnp.argmin(jnp.stack(sads), axis=0).astype(jnp.int32)
        cy = cy + (best // 3 - 1) * step
        cx = cx + (best % 3 - 1) * step

    du = (cx - xs).astype(jnp.float32)
    dv = (cy - ys).astype(jnp.float32)
    if seed_mode == "shipped":
        u, v = seed_u + du, seed_v + dv
    else:  # 'fixed'
        u, v = du, dv
    return jnp.stack([u, v], axis=-1)


def _reachable_sets(steps):
    """Per-axis displacement sets entering each search round."""
    cur = {0}
    sets = []
    for st in steps:
        sets.append(sorted(cur))
        cur = {v + o * st for v in cur for o in (-1, 0, 1)}
    return sets


def _smap_count(steps) -> int:
    """Distinct displacement maps the S-map search would build."""
    total = set()
    for st, vals in zip(steps, _reachable_sets(steps)):
        q = {v + o * st for v in vals for o in (-1, 0, 1)}
        total |= {(a, b) for a in q for b in q}
    return len(total)


@functools.partial(
    jax.jit, static_argnames=("search_size", "patch_size", "costfn")
)
def _estimate_2d_smap(gray0, gray1, search_size, patch_size, costfn="sad"):
    """Gather-free exact search for the unseeded case.

    The per-pixel candidate-window gather (the oracle's
    get_region_padded, me_pyramid.py:89-127) is the lane-hostile pattern
    that capped the exact path at ~0.2 MP/s. Without a seed, every
    pixel's displacement after round r lies in a SMALL static set (the
    cumulative sums of the shrinking steps), so the whole search
    reformulates as static shifts:

      S_v(p) = sum_q cost(f0[p+q], f1[p+v+q])   (zero-padded shifts +
                                                 separable box sums)
      round r, candidate o: cost_o(p) = S_{d(p) + o*step}(p), selected
      by the (d == v) masks over the reachable set.

    Everything is integer adds of the same values the oracle sums
    (order differs; integer addition commutes exactly), so the result
    is BIT-IDENTICAL to oracle/motion.py including first-minimum
    tie-breaking. ~380 displacement maps for the default 15/5 geometry;
    SAD maps are int16 (patch sums <= 6375 - half the vregs of every
    masked select).
    """
    h, w = gray0.shape
    pm = patch_size // 2
    steps = me_steps(search_size, patch_size)
    axis_sets = _reachable_sets(steps)
    vmax = max(
        abs(v + o * st)
        for st, vals in zip(steps, axis_sets)
        for v in vals
        for o in (-1, 0, 1)
    )
    map_dt = jnp.int16 if costfn == "sad" and patch_size <= 11 else jnp.int32
    f0e = jnp.pad(gray0.astype(jnp.int32), pm)  # zeros (oracle padding)
    pad1 = pm + vmax
    f1e = jnp.pad(gray1.astype(jnp.int32), pad1)
    he, we = h + 2 * pm, w + 2 * pm

    smaps = {}

    def smap(vy, vx):
        if (vy, vx) in smaps:
            return smaps[(vy, vx)]
        y0, x0 = pad1 - pm + vy, pad1 - pm + vx
        sl = jax.lax.slice(f1e, (y0, x0), (y0 + he, x0 + we))
        if costfn == "sad":
            d = jnp.abs(f0e - sl)
        elif costfn == "ssd":
            d = (f0e - sl) * (f0e - sl)
        else:  # pragma: no cover - dispatcher falls back for WSAD
            raise ValueError(costfn)
        v = jnp.zeros((h, we), jnp.int32)
        for k in range(patch_size):
            v = v + jax.lax.slice(d, (k, 0), (k + h, we))
        s = jnp.zeros((h, w), jnp.int32)
        for k in range(patch_size):
            s = s + jax.lax.slice(v, (0, k), (h, k + w))
        smaps[(vy, vx)] = s.astype(map_dt)
        return smaps[(vy, vx)]

    dy = jnp.zeros((h, w), jnp.int32)
    dx = jnp.zeros((h, w), jnp.int32)
    for st, vals in zip(steps, axis_sets):
        mys = {v: dy == v for v in vals}
        mxs = {v: dx == v for v in vals}
        costs = []
        for oy in (-st, 0, st):
            for ox in (-st, 0, st):
                acc = jnp.zeros((h, w), map_dt)
                for vy in vals:
                    for vx in vals:
                        acc = acc + jnp.where(
                            mys[vy] & mxs[vx], smap(vy + oy, vx + ox), 0
                        )
                costs.append(acc)
        best = jnp.argmin(jnp.stack(costs), axis=0).astype(jnp.int32)
        dy = dy + (best // 3 - 1) * st
        dx = dx + (best % 3 - 1) * st

    return jnp.stack([dx.astype(jnp.float32), dy.astype(jnp.float32)], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("search_size", "patch_size", "seed_mode", "costfn", "seed_bound"),
)
def _estimate_2d_smap_seeded(
    gray0, gray1, seed, search_size, patch_size, seed_mode, costfn="sad",
    seed_bound=8,
):
    """Gather-free exact search for the SEEDED case (pyramid levels > 0).

    The round-2 analysis rejected a seeded S-map closure because seed
    bases are unbounded (ROADMAP). Clamping the base to [-B, B] closes
    it: the per-pixel ABSOLUTE displacement a(p) = clip(trunc(seed), B)
    + search deltas always lies in a static per-round set A_k (|A_k| <=
    2B+1 + reachable sum), so every candidate cost is a static shifted
    cost map S_v selected by (a == v) masks - the same formulation as
    the unseeded path, BIT-IDENTICAL to the oracle whenever
    |trunc(seed)| <= B (the caller warns when a concrete seed
    saturates). Two refinements keep the op count tractable:

    - hierarchical per-axis selection: stage A selects over the row
      displacement (per candidate row offset and needed column shift),
      stage B over the column displacement - O(|A|) instead of O(|A|^2)
      masked adds per candidate;
    - the (2(B+r)+1)^2 maps (r = sum of steps) are built by ONE
      lax.scan into a stacked [nmaps, H, W] tensor and the per-round
      selections are scans with jnp.take slabs, keeping the HLO graph
      a few hundred ops (a fully unrolled build measured ~100 s of
      compile); per-iteration slabs are CONTIGUOUS dynamic_slices (the
      base range is contiguous, so the per-round sets are integer
      ranges - jnp.take with an index vector lowered to mini-gathers
      ~50x slower). SAD maps are int16 (patch sums <= 6375), halving
      stack traffic; at VGA/B=16 the stack is ~0.7 GB in HBM - the
      dispatcher falls back to the windowed gather above a size budget.

    Integer addition commutes exactly and candidate order is row-major
    (dy, dx), so first-minimum tie-breaking matches oracle/motion.py.
    """
    h, w = gray0.shape
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
    nper = 2 * vmax + 1  # per-axis absolute shifts; id = (vy+vmax)*nper + vx+vmax
    f0e = jnp.pad(gray0.astype(jnp.int32), pm)  # zeros (oracle padding)
    pad1 = pm + vmax
    f1e = jnp.pad(gray1.astype(jnp.int32), pad1)
    he, we = h + 2 * pm, w + 2 * pm

    # SAD patch sums fit int16 only while patch^2 * 255 <= 32767, i.e.
    # patch_size <= 11 (11^2*255 = 30855; 13^2*255 = 43095 would wrap
    # negative and silently corrupt the argmin): halving the map dtype
    # halves the stack's HBM traffic and the VPU vregs of every masked
    # select (SSD sums can reach 25*255^2 - int32 there)
    map_dt = jnp.int16 if costfn == "sad" and patch_size <= 11 else jnp.int32

    # all (2*vmax+1)^2 shifted cost maps, ONE scan iteration per ROW of
    # shifts (a per-map scan paid ~0.2 ms of while-iteration overhead
    # x 2401 maps; a fully unrolled build measured ~100 s of compile -
    # row chunking gets both: ~50 iterations of a ~600-op body)
    def build_row(_, vy):
        rows = jax.lax.dynamic_slice(
            f1e, (pad1 - pm + vy, 0), (he, w + 2 * pad1)
        )
        row_maps = []
        for vx in range(-vmax, vmax + 1):  # static unroll
            sl = jax.lax.slice(
                rows, (0, pad1 - pm + vx), (he, pad1 - pm + vx + we)
            )
            if costfn == "sad":
                d = jnp.abs(f0e - sl)
            else:  # 'ssd' (dispatcher falls back for WSAD)
                d = (f0e - sl) * (f0e - sl)
            v = jnp.zeros((h, we), jnp.int32)
            for k in range(patch_size):
                v = v + jax.lax.slice(d, (k, 0), (k + h, we))
            sm = jnp.zeros((h, w), jnp.int32)
            for k in range(patch_size):
                sm = sm + jax.lax.slice(v, (0, k), (h, k + w))
            row_maps.append(sm.astype(map_dt))
        return 0, jnp.stack(row_maps)

    _, smap_stack = jax.lax.scan(
        build_row, 0, jnp.arange(-vmax, vmax + 1, dtype=jnp.int32)
    )  # [nper, nper, h, w]
    smap_stack = smap_stack.reshape(nper * nper, h, w)

    seed_u = seed[..., 0].astype(jnp.float32)
    seed_v = seed[..., 1].astype(jnp.float32)
    ay = jnp.clip(jnp.trunc(seed_v).astype(jnp.int32), -B, B)
    ax = jnp.clip(jnp.trunc(seed_u).astype(jnp.int32), -B, B)

    for st, vals in zip(steps, axis_sets):
        aset = sorted({vb + v for vb in range(-B, B + 1) for v in vals})
        offs = (-st, 0, st)
        xneed = sorted({vx + o for vx in aset for o in offs})
        nx = len(xneed)
        # the base range [-B, B] is contiguous, so aset and xneed are
        # contiguous integer ranges - every per-iteration slab below is
        # a contiguous dynamic_slice (full-bandwidth DMA; jnp.take with
        # an index vector lowered to mini-gathers ~50x slower)
        assert aset == list(range(aset[0], aset[-1] + 1))
        assert xneed == list(range(xneed[0], xneed[-1] + 1))

        # stage A (scan over row displacements): R[oi, j] =
        # S_{ay + offs[oi], xneed[j]}
        def stage_a(acc, vy):
            m = (ay == vy)[None]
            slabs = []
            for oy in offs:  # static: 3 contiguous [nx, h, w] slabs
                slabs.append(
                    jax.lax.dynamic_slice(
                        smap_stack,
                        ((vy + oy + vmax) * nper + (xneed[0] + vmax), 0, 0),
                        (nx, h, w),
                    )
                )
            return acc + jnp.where(m[None], jnp.stack(slabs), 0), None

        r_sel, _ = jax.lax.scan(
            stage_a,
            jnp.zeros((3, nx, h, w), map_dt),
            jnp.asarray(aset, jnp.int32),
        )

        # stage B (scan over column displacements): costs in row-major
        # (oy, ox) candidate order - the oracle's tie-break order
        def stage_b(acc, vx):
            m = (ax == vx)[None]
            slabs = []
            for oi in range(3):
                for ox in offs:
                    slabs.append(
                        jax.lax.dynamic_slice(
                            r_sel, (oi, vx + ox - xneed[0], 0, 0), (1, 1, h, w)
                        )[0]
                    )
            return acc + jnp.where(m, jnp.concatenate(slabs), 0), None

        costs, _ = jax.lax.scan(
            stage_b,
            jnp.zeros((9, h, w), map_dt),
            jnp.asarray(aset, jnp.int32),
        )
        best = jnp.argmin(costs, axis=0).astype(jnp.int32)
        ay = ay + (best // 3 - 1) * st
        ax = ax + (best % 3 - 1) * st

    du = ax.astype(jnp.float32)
    dv = ay.astype(jnp.float32)
    if seed_mode == "shipped":
        return jnp.stack([seed_u + du, seed_v + dv], axis=-1)
    return jnp.stack([du, dv], axis=-1)


def _me_boxsum(img, S, w, patch_size):
    """Separable (2*pm+1)-tap zero-padded patch sum (the fast mode's
    cost aggregation; shared by the full-image loop and its band twin)."""
    pm = patch_size // 2
    p = jnp.pad(img, ((pm, pm), (0, 0)))
    v = jnp.zeros_like(img)
    for k in range(patch_size):
        v = v + jax.lax.slice(p, (k, 0), (k + S, w))
    p = jnp.pad(v, ((0, 0), (pm, pm)))
    o = jnp.zeros_like(img)
    for k in range(patch_size):
        o = o + jax.lax.slice(p, (0, k), (S, k + w))
    return o


def _residual_shift_warp(f1pad, rb, S, w, dy, dx, vals):
    """Masked-shift residual warp: the residual state provably stays in
    this round's reachable set ``vals`` (it starts at 0; each update
    adds -step/0/step and the median-of-9 SELECTS one of its inputs),
    so the select only needs |vals|^2 terms, not the full (2 rb + 1)^2
    square: 0 + 9 + 81 selects across the 15/5 rounds instead of
    3 x 289 (dropped terms have all-false masks and add exactly 0 -
    bit-identical)."""
    if vals == [0]:
        return jax.lax.slice(f1pad, (rb, rb), (rb + S, rb + w))
    mx = {v: dx == v for v in vals}
    w1 = jnp.zeros((S, w), jnp.int32)
    for vy in vals:
        inner = jnp.zeros((S, w), jnp.int32)
        for vx in vals:
            sl = jax.lax.slice(
                f1pad, (rb + vy, rb + vx), (rb + vy + S, rb + vx + w)
            )
            inner = inner + jnp.where(mx[vx], sl, 0)
        w1 = w1 + jnp.where(dy == vy, inner, 0)
    return w1


def _fast_rounds(
    f0, steps, patch_size, costfn, warp_fn, S, w,
    init_dy=None, init_dx=None, in_img=None, grow=None, h_img=None,
):
    """The fast mode's round loop, shared VERBATIM by _estimate_2d_fast
    and _fast_residual_band (their bit-identity is the sharding
    correctness contract - one implementation, not two copies): warp ->
    9 statically-shifted boxsum costs -> argmin update -> median-of-9
    regularization, once per shrinking step.

    ``in_img``/``grow`` carry the band twin's true-image-edge masks
    ([S, 1] global-row predicates); None means full image - every mask
    branch disappears at trace time, so the full-image path pays
    nothing for the sharing. ``init_dy/dx`` seed the state for the
    legacy full-field gather mode (residual modes start at 0).

    The 3x3 state median uses Paeth's 19-exchange median-of-9 network
    (~6x cheaper on the VPU than jnp.sort of the 9-stack); column
    neighbors edge-replicate at the true (full-width) image columns,
    row neighbors at the true image rows (a band edge is not an image
    edge)."""

    def median3x3(a):
        pd = jnp.pad(a, ((1, 1), (1, 1)), mode="edge")
        ctr = pd[1:-1, 1:-1]
        if grow is None:
            up, dn = pd[:-2, 1:-1], pd[2:, 1:-1]
        else:
            up = jnp.where(grow >= 1, pd[:-2, 1:-1], ctr)
            dn = jnp.where(grow <= h_img - 2, pd[2:, 1:-1], ctr)
        v = []
        for row in (up, ctr, dn):
            rp = jnp.pad(row, ((0, 0), (1, 1)), mode="edge")
            v.extend([rp[:, :-2], row, rp[:, 2:]])

        def cx(i, j):
            lo = jnp.minimum(v[i], v[j])
            v[j] = jnp.maximum(v[i], v[j])
            v[i] = lo

        for i, j in MEDIAN9_EXCHANGES:
            cx(i, j)
        return v[4]

    dy = jnp.zeros((S, w), jnp.int32) if init_dy is None else init_dy
    dx = jnp.zeros((S, w), jnp.int32) if init_dx is None else init_dx
    for step, vals in zip(steps, _reachable_sets(steps)):
        w1 = warp_fn(dy, dx, vals)
        if in_img is not None:
            # a band row outside the global image could otherwise warp
            # real frame rows into view (the full-image w1 only exists
            # on [h, w])
            w1 = jnp.where(in_img, w1, 0)
        w1p = jnp.pad(w1, ((step, step), (step, step)))
        sads = []
        for oy in (-step, 0, step):
            for ox in (-step, 0, step):
                shifted = jax.lax.slice(
                    w1p, (step + oy, step + ox), (step + oy + S, step + ox + w)
                )
                if costfn == "sad":
                    diff = jnp.abs(f0 - shifted)
                elif costfn == "ssd":
                    diff = (f0 - shifted) * (f0 - shifted)
                else:
                    # the WSAD matmul cost has no shifted-boxsum form;
                    # it exists only on the exact path
                    raise ValueError(f"costfn {costfn!r} requires method='exact'")
                if in_img is not None:
                    # a +-step candidate shift can carry in-image w1
                    # data into an out-of-image diff row, which the
                    # full-image box sum zero-pads
                    diff = jnp.where(in_img, diff, 0)
                sads.append(_me_boxsum(diff, S, w, patch_size))
        best = jnp.argmin(jnp.stack(sads), axis=0).astype(jnp.int32)
        dy = median3x3(dy + (best // 3 - 1) * step)
        dx = median3x3(dx + (best % 3 - 1) * step)
    return dy, dx


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_size", "patch_size", "seed_mode", "has_seed", "costfn", "warp_bound",
    ),
)
def _estimate_2d_fast(
    gray0, gray1, seed, search_size, patch_size, seed_mode, has_seed, costfn="sad",
    warp_bound=None,
):
    """Warp-based approximate search: one warp per round.

    Instead of gathering a per-pixel candidate window (exact path,
    lane-hostile on TPU), each round warps frame1 by the current
    displacement field ONCE, then evaluates the 3x3 candidate offsets
    with statically-shifted absolute differences box-filtered to patch
    sums (separable adds on the VPU). The candidate cost uses the
    neighbor's displacement at the window edge (w1[p+o+q] carries
    d(p+o+q), not d(p)), so results are not bit-identical to the exact
    search, but quality on smooth fields matches (EPE parity on the
    Middlebury pair) at ~40x the speed.

    ``warp_bound`` != None replaces the per-pixel warp GATHER (2.5 ms
    per round at VGA on v5e - 77% of the whole mode) with masked static
    shifts. The field decomposes as d = trunc(seed) + r: frame1 is
    warped by the seed base ONCE (a single gather - or not at all when
    unseeded), and each round's warp handles only the search residual
    r, which is bounded by sum(steps) BY CONSTRUCTION (each round moves
    the center by at most its step; the median is order-preserving), so
    the (2*sum(steps)+1)^2 shift set is exact - no re-clamp cycles, no
    silent saturation (the round-2 'auto' mode re-clamped the FULL
    field to [-16, 16] every round, walking seeded flows > 16 px to
    wrong values). The residual warp samples the seed at p + r instead
    of p (seed fields are smooth upscaled flows; EPE on the Middlebury
    pair is unchanged - see tests). A non-negative int ``warp_bound``
    additionally clamps the seed BASE to [-B, B] once on entry (the
    legacy saturation contract, now one-time; the public wrapper warns
    when a concrete seed actually saturates). None keeps the per-round
    gather of the full field.
    """
    h, w = gray0.shape
    ys, xs = jnp.mgrid[0:h, 0:w]
    ys = ys.astype(jnp.int32)
    xs = xs.astype(jnp.int32)

    if has_seed:
        seed_u = seed[..., 0].astype(jnp.float32)
        seed_v = seed[..., 1].astype(jnp.float32)
    else:
        seed_u = jnp.zeros((h, w), jnp.float32)
        seed_v = jnp.zeros((h, w), jnp.float32)

    dy = jnp.trunc(seed_v).astype(jnp.int32)
    dx = jnp.trunc(seed_u).astype(jnp.int32)
    # int32 throughout: an int16 variant measured 3x SLOWER here (the
    # VPU computes one int16 per 32-bit lane, so the narrow type only
    # buys pack/unpack glue; it wins in the HBM-traffic-bound S-map
    # paths, not in this VMEM-resident one)
    pix_dt = jnp.int32
    f0 = gray0.astype(pix_dt)

    steps = me_steps(search_size, patch_size)
    if warp_bound is not None:
        if warp_bound >= 0:
            # legacy saturation contract: clamp the seed base ONCE
            dy = jnp.clip(dy, -warp_bound, warp_bound)
            dx = jnp.clip(dx, -warp_bound, warp_bound)
        base_y, base_x = dy, dx
        if has_seed:
            base1 = _gather_padded_u8(gray1, ys + base_y, xs + base_x)
        else:
            base1 = gray1
        rb = sum(steps)  # exact residual bound (see docstring)
        f1pad = jnp.pad(base1.astype(pix_dt), rb)
        rdy, rdx = _fast_rounds(
            f0, steps, patch_size, costfn,
            lambda a, b, vals: _residual_shift_warp(f1pad, rb, h, w, a, b, vals),
            h, w,
        )
        dy = base_y + rdy
        dx = base_x + rdx
    else:
        # legacy unbounded mode: gather the FULL field every round
        def warp_gather(ry, rx, vals):
            return _gather_padded_u8(gray1, ys + ry, xs + rx).astype(pix_dt)

        dy, dx = _fast_rounds(
            f0, steps, patch_size, costfn, warp_gather, h, w,
            init_dy=dy, init_dx=dx,
        )
    du = dx.astype(jnp.float32)
    dv = dy.astype(jnp.float32)
    if seed_mode == "shipped":
        u, v = seed_u + du, seed_v + dv
    else:
        u, v = du, dv
    return jnp.stack([u, v], axis=-1)


def exact_halo_rows(search_size: int = 15, patch_size: int = 5) -> int:
    """Per-side row halo that makes a band-local EXACT search exact:
    every output pixel of _estimate_2d_smap reads frame rows within
    pm (patch) + vmax (max reachable displacement) of itself and
    nothing else (the search is purely per-pixel - unlike the fast
    iteration there is no cross-pixel state flow), so a band holding
    that many true rows beyond its kept region reproduces the
    full-image result bit-exactly (19 rows at the 15/5 geometry).
    The spatial-parallel building block of parallel.mesh
    motion_exact_sharded."""
    pm = patch_size // 2
    steps = me_steps(search_size, patch_size)
    vmax = max(
        abs(v + o * st)
        for st, vals in zip(steps, _reachable_sets(steps))
        for v in vals
        for o in (-1, 0, 1)
    )
    return pm + vmax


def fast_halo_rows(search_size: int = 15, patch_size: int = 5) -> int:
    """Per-side row halo that makes a band-local fast iteration exact:
    each round spreads state influence by 1 (median) + step (candidate
    shift) + pm (patch sum) rows, so garbage creeps inward from a band
    edge by sum(1 + step + pm) rows total (me_fast_pallas.py's own halo
    calculus at _fast_geometry)."""
    pm = patch_size // 2
    return sum(1 + st + pm for st in me_steps(search_size, patch_size))


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "search_size", "patch_size", "costfn"),
)
def _fast_residual_band(
    f0_ext, f1_ext, r0, h, w,
    search_size=15, patch_size=5, costfn="sad",
):
    """XLA twin of me_fast_pallas's BAND semantics: the fast residual
    iteration computed on a row band with true-image-edge masks.

    ``f0_ext``/``f1_ext`` are [S, w] integer row bands covering global
    rows [r0, r0 + S) of frame0 / the (seed-base-warped) frame1, ZERO
    outside the global image; ``r0`` may be negative and is a traced
    scalar (shard-dependent under shard_map). Returns [S, w, 2] int
    residual flow whose rows at distance >= fast_halo_rows() from both
    band edges are BIT-IDENTICAL to the full-image _estimate_2d_fast
    residual loop - masks reproduce its exact edge semantics:

    - w1 is zeroed outside the global image (the full-image w1 only
      exists on [h, w]; a band row outside the image could otherwise
      warp real frame rows into view),
    - the DIFF is also masked to true image rows: a +-step candidate
      shift can carry in-image w1 data into an out-of-image diff row,
      which the full-image box sum zero-pads (the same guard as the
      Pallas kernel's dmask),
    - the 3x3 state medians edge-REPLICATE at the true image rows via
      global-row masks (columns are full-width, so plain edge pad).

    This is the spatial-parallel building block (parallel.mesh
    motion_fast_sharded): shards exchange fast_halo_rows() true rows
    via ppermute, run this band locally, and crop the halo.
    """
    S = f0_ext.shape[0]
    steps = me_steps(search_size, patch_size)
    f0 = f0_ext.astype(jnp.int32)
    rb = sum(steps)
    grow = r0 + jnp.arange(S, dtype=jnp.int32)[:, None]  # global row ids
    in_img = (grow >= 0) & (grow < h)  # [S, 1], broadcasts over w
    f1pad = jnp.pad(f1_ext.astype(jnp.int32), rb)
    dy, dx = _fast_rounds(
        f0, steps, patch_size, costfn,
        lambda a, b, vals: _residual_shift_warp(f1pad, rb, S, w, a, b, vals),
        S, w, in_img=in_img, grow=grow, h_img=h,
    )
    return jnp.stack([dx, dy], axis=-1)


def _vmem_fallback_warn(e: Exception, kernel: str, shape, fallback: str):
    """Re-raise unless ``e`` is a Mosaic scoped-vmem overflow; else warn
    (the caller then falls through to its XLA twin).

    This protection only works for EAGER calls: under an enclosing
    jax.jit the Mosaic compile happens after tracing returns, so an
    overflow at an uncalibrated geometry would surface at the outer
    jit's compile instead. The kernels' geometry gates and
    hardware-calibrated VMEM budgets are sized so that does not happen
    in practice.
    """
    if "vmem" not in str(e).lower() and "scoped" not in str(e).lower():
        raise e
    import warnings

    warnings.warn(
        f"{kernel} Pallas kernel exceeded scoped VMEM at this geometry "
        f"({shape}); falling back to the {fallback}: {e}",
        RuntimeWarning,
        stacklevel=3,
    )


def _warn_seed_saturation(seed, bound, what, stats=None):
    """Host-side guard: warn when a CONCRETE seed's base exceeds the
    clamp (tracers skip - the check is advisory, not semantic).
    ``stats`` (me_pallas.seed_band_stats output) avoids re-reading the
    full field: |trunc| attains its max at a per-band extremum."""
    if seed is None or isinstance(seed, jax.core.Tracer):
        return
    if stats is not None:
        from oclcomputervision_tpu.ops.pallas.me_pallas import stats_base_max

        base_max = stats_base_max(stats)
    else:
        base_max = float(np.max(np.abs(np.trunc(np.asarray(seed)))))
    if base_max > bound:
        import warnings

        warnings.warn(
            f"seed displacements reach {base_max:.0f} px but {what}={bound} "
            f"clamps the seed base to [-{bound}, {bound}]; the flow "
            "saturates there. Raise the bound (or disable the masked "
            "path) for larger motion.",
            RuntimeWarning,
            stacklevel=3,
        )


def estimate_motion_vector(
    gray0: jnp.ndarray,
    gray1: jnp.ndarray,
    search_size: int = 15,
    patch_size: int = 5,
    seed: Optional[jnp.ndarray] = None,
    seed_mode: str = "shipped",
    method: str = "exact",
    costfn: str = "sad",
    warp_bound="auto",
    seed_bound="auto",
) -> jnp.ndarray:
    """Dense integer block-matching flow [H, W, 2] (u=x, v=y) float32.

    Defaults match me_pyramid.py:130. Accepts [H, W] or batched [B, H, W]
    frames (seed batched alike). ``method='exact'`` is bit-identical to
    the reference search; ``method='fast'`` uses the warp-based
    approximation (~40x faster on TPU, EPE parity on Middlebury).
    ``costfn`` in {'sad', 'ssd', 'wsad_shipped', 'wsad'} selects the
    match cost (me_pyramid.py:29-48; the reference search only ever uses
    SAD at :70; the WSAD variants are exact-mode only).

    ``warp_bound`` (fast mode only): 'auto' uses the masked-shift warp
    on TPU (the per-pixel warp gather is the mode's bottleneck there -
    see _estimate_2d_fast) with NO clamp: the seed base is gather-warped
    once and only the bounded search residual uses masked shifts, so
    arbitrarily large seeds are preserved. 'gather' forces the per-round
    gather; an int B >= 0 additionally clamps the seed base to [-B, B]
    once on entry (the legacy saturation contract) - a warning is
    emitted when a concrete seed actually saturates.

    ``seed_bound`` (exact mode with a seed): routes seeded exact
    searches to the gather-free S-map formulation with the seed base
    clamped to [-B, B] - bit-identical to the oracle whenever
    |trunc(seed)| <= B, with a warning when a concrete seed saturates;
    ~2 orders of magnitude faster than the windowed gather it replaces.
    'auto' sizes B from the seed itself when concrete (quantized to
    {8, 12, 16, 20, 24, 32}); a tracer seed gets the full 32 whenever
    the Pallas seeded kernel takes the call (its dynamic per-band
    rebasing recovers the concrete-seed scan cost on device), else 8.
    An int sets B directly; 'none' keeps the windowed gather
    (unbounded seeds, also the WSAD route).
    """
    gray0 = jnp.asarray(gray0)
    gray1 = jnp.asarray(gray1)
    if gray0.ndim == 3:
        from oclcomputervision_tpu.ops._layout import guard_batch_first

        guard_batch_first(gray0.shape, "estimate_motion_vector")
    has_seed = seed is not None
    if warp_bound == "auto":
        wb = -1 if jax.default_backend() == "tpu" else None
    elif warp_bound == "gather":
        wb = None
    else:
        wb = int(warp_bound)
        if wb < 0:
            raise ValueError(
                "warp_bound must be 'auto', 'gather', or an int >= 0"
            )
    # ONE tiny per-band min/max readback serves every host-side seed
    # decision below (auto bound sizing, saturation warnings, rebase
    # sizing) - previously each forced its own full-field transfer
    # through the tunnel (~2.4 MB at VGA vs < 1 KB of stats). Computed
    # LAZILY: the readback is a synchronous device->host round trip
    # (~13 ms through the tunnel), and some dispatch branches (e.g.
    # method='fast' with warp_bound='gather') never consume it.
    _stats_cache = []

    def seed_stats():
        if not _stats_cache:
            if has_seed and not isinstance(seed, jax.core.Tracer):
                from oclcomputervision_tpu.ops.pallas.me_pallas import (
                    seed_band_stats,
                )

                _stats_cache.append(seed_band_stats(seed, gray0.shape[-2]))
            else:
                _stats_cache.append(None)
        return _stats_cache[0]

    if method == "fast" and wb is not None and wb >= 0 and has_seed:
        _warn_seed_saturation(seed, wb, "warp_bound", stats=seed_stats())
    steps = me_steps(search_size, patch_size)
    if (
        method == "exact"
        and not has_seed
        and costfn in ("sad", "ssd")
        and _smap_count(steps) <= 1500
    ):
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas,
            me_exact_pallas_supported,
        )

        if jax.default_backend() == "tpu" and me_exact_pallas_supported(
            search_size, patch_size, costfn
        ):
            # fused Pallas search: cost maps transient in VMEM instead
            # of ~530 masked map adds streamed through HBM (bit-
            # identical; see ops/pallas/me_pallas.py)
            try:
                return me_exact_pallas(
                    gray0, gray1, search_size, patch_size, costfn
                )
            except Exception as e:  # Mosaic scoped-vmem OOM -> XLA twin
                _vmem_fallback_warn(e, "exact-ME", gray0.shape, "XLA S-map path")
        # gather-free exact search (bit-identical, ~300x faster than
        # the windowed gather)
        if gray0.ndim == 3:
            return jax.vmap(
                lambda g0, g1: _estimate_2d_smap(
                    g0, g1, search_size, patch_size, costfn
                )
            )(gray0, gray1)
        return _estimate_2d_smap(gray0, gray1, search_size, patch_size, costfn)
    seed_is_tracer = has_seed and isinstance(seed, jax.core.Tracer)
    if seed_bound == "auto":
        # size the bound from the seed itself when it is concrete (the
        # pyramid driver's seeds always are), quantized to {8, 12, 16,
        # 20, 24, 32} so recompiles stay bounded. Tracer seeds get the
        # FULL 32 px coverage whenever the Pallas seeded kernel will
        # take the call (its per-band DYNAMIC rebasing keeps the scan
        # cost at the concrete-seed level - see me_exact_pallas_seeded
        # rebase_bound='dynamic'); on backends without the kernel a
        # tracer keeps the old 8 default (the XLA S-map stack at B=32
        # would cost ~4x with no in-kernel trim to claw it back).
        sb = 8
        if has_seed and seed_stats() is not None:
            from oclcomputervision_tpu.ops.pallas.me_pallas import (
                stats_base_max,
            )

            base_max = stats_base_max(seed_stats())
            for q in (8, 12, 16, 20, 24, 32):
                sb = q
                if base_max <= q:
                    break
        elif seed_is_tracer and method == "exact":
            from oclcomputervision_tpu.ops.pallas.me_pallas import (
                me_exact_pallas_seeded_supported,
            )

            if (
                jax.default_backend() == "tpu"
                and costfn in ("sad", "ssd")
                and me_exact_pallas_seeded_supported(
                    search_size, patch_size, costfn, 32
                )
            ):
                sb = 32
    elif seed_bound in (None, "none"):
        sb = None
    else:
        sb = int(seed_bound)
    if (
        method == "exact"
        and has_seed
        and sb is not None
        and costfn in ("sad", "ssd")
        and _smap_count(steps) <= 1500
    ):
        from oclcomputervision_tpu.ops.pallas.me_pallas import (
            me_exact_pallas_seeded,
            me_exact_pallas_seeded_supported,
            seeded_rebase_bound,
        )

        sd = jnp.asarray(seed)
        if (
            jax.default_backend() == "tpu"
            and me_exact_pallas_seeded_supported(
                search_size, patch_size, costfn, sb
            )
        ):
            # fused band-resident Pallas search: 9.7 ms/VGA frame
            # device vs ~33 for the XLA S-map stack (bit-identical).
            # No HBM budget gate applies - the bands live in VMEM
            _warn_seed_saturation(seed, sb, "seed_bound", stats=seed_stats())
            # per-band seed rebasing (bit-identical, concrete seeds
            # only): scan +-rb around each band's midpoint instead of
            # +-sb around zero - the scan cost is quadratic in the
            # bound and pyramid seeds vary far less within a 32-row
            # band than globally (Middlebury finest level: 32 -> 20)
            rb = seeded_rebase_bound(
                seed, gray0.shape[-2], sb, stats=seed_stats()
            )
            if seed_is_tracer:
                # tracer-safe rebasing: the per-band residual bound is
                # computed ON DEVICE and a lax.switch picks the same
                # static variant the eager sizing would have - the
                # jitted pyramid keeps the eager scan cost instead of
                # silently paying the unrebased 2-2.5x (round-4 gap)
                rb = "dynamic"
            try:
                return me_exact_pallas_seeded(
                    gray0, gray1, sd, search_size, patch_size,
                    costfn, seed_mode, sb, rebase_bound=rb,
                )
            except Exception as e:  # Mosaic scoped-vmem OOM -> XLA
                _vmem_fallback_warn(
                    e, "seeded exact-ME", gray0.shape, "XLA S-map path"
                )
        rel_max = max(
            abs(v + o * st)
            for st, vals in zip(steps, _reachable_sets(steps))
            for v in vals
            for o in (-1, 0, 1)
        )
        nmaps = (2 * (sb + rel_max) + 1) ** 2
        hw = gray0.shape[-2] * gray0.shape[-1]
        map_bytes = 2 if costfn == "sad" and patch_size <= 11 else 4
        # live S-map stack budget (HBM only; int16 SAD maps halve it)
        if nmaps * hw * map_bytes <= 6e9:
            _warn_seed_saturation(seed, sb, "seed_bound", stats=seed_stats())
            if gray0.ndim == 3:
                return jax.vmap(
                    lambda g0, g1, s_: _estimate_2d_smap_seeded(
                        g0, g1, s_, search_size, patch_size, seed_mode,
                        costfn, sb,
                    )
                )(gray0, gray1, sd)
            return _estimate_2d_smap_seeded(
                gray0, gray1, sd, search_size, patch_size, seed_mode, costfn, sb
            )
    if method == "fast" and wb is not None and costfn in ("sad", "ssd"):
        from oclcomputervision_tpu.ops.pallas.me_fast_pallas import (
            me_fast_pallas_supported,
        )

        if jax.default_backend() == "tpu" and me_fast_pallas_supported(
            search_size, patch_size, costfn
        ):
            # fused band-resident Pallas iteration (bit-identical to
            # _estimate_2d_fast's masked-shift loop; see
            # ops/pallas/me_fast_pallas.py)
            try:
                return _fast_pallas(
                    gray0, gray1,
                    jnp.asarray(seed) if has_seed else None,
                    search_size, patch_size, seed_mode, wb, costfn,
                )
            except Exception as e:  # Mosaic scoped-vmem OOM -> XLA twin
                _vmem_fallback_warn(
                    e, "fast-ME", gray0.shape, "XLA masked-shift path"
                )
    if method == "fast":
        impl = functools.partial(_estimate_2d_fast, warp_bound=wb)
    else:
        impl = _estimate_2d
    s = jnp.asarray(seed) if has_seed else jnp.zeros((1,), jnp.float32)
    if gray0.ndim == 3:
        return jax.vmap(
            lambda g0, g1, sd: impl(
                g0, g1, sd, search_size, patch_size, seed_mode, has_seed, costfn
            )
        )(gray0, gray1, s if has_seed else jnp.zeros((gray0.shape[0], 1), jnp.float32))
    return impl(gray0, gray1, s, search_size, patch_size, seed_mode, has_seed, costfn)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_size", "patch_size", "seed_mode", "warp_bound", "costfn",
        "interpret",
    ),
)
def _fast_pallas(
    gray0,
    gray1,
    seed,
    search_size: int,
    patch_size: int,
    seed_mode: str,
    warp_bound: int,
    costfn: str,
    interpret: bool = False,
):
    """Fast mode through the fused Pallas kernel: the seed base is
    gather-warped once here (exactly _estimate_2d_fast's base prep,
    incl. the warp_bound >= 0 legacy clamp), the bounded residual
    iteration runs in ops/pallas/me_fast_pallas.py, and the base/seed
    recombination matches _estimate_2d_fast:541-550."""
    from oclcomputervision_tpu.ops.pallas.me_fast_pallas import (
        me_fast_residual_pallas,
    )

    gray0 = jnp.asarray(gray0)
    gray1 = jnp.asarray(gray1)
    squeeze = gray0.ndim == 2
    if squeeze:
        gray0, gray1 = gray0[None], gray1[None]
        if seed is not None:
            seed = seed[None]
    bsz, h, w = gray0.shape
    if seed is not None:
        seed_u = seed[..., 0].astype(jnp.float32)
        seed_v = seed[..., 1].astype(jnp.float32)
        base_y = jnp.trunc(seed_v).astype(jnp.int32)
        base_x = jnp.trunc(seed_u).astype(jnp.int32)
        if warp_bound >= 0:
            base_y = jnp.clip(base_y, -warp_bound, warp_bound)
            base_x = jnp.clip(base_x, -warp_bound, warp_bound)
        ys, xs = jnp.mgrid[0:h, 0:w]
        base1 = jax.vmap(
            lambda g1, by, bx: _gather_padded_u8(
                g1, ys.astype(jnp.int32) + by, xs.astype(jnp.int32) + bx
            )
        )(gray1, base_y, base_x)
    else:
        seed_u = seed_v = jnp.zeros((bsz, h, w), jnp.float32)
        base_y = base_x = jnp.zeros((bsz, h, w), jnp.int32)
        base1 = gray1
    res = me_fast_residual_pallas(
        gray0, base1, search_size, patch_size, costfn, interpret=interpret
    )
    du = base_x.astype(jnp.float32) + res[..., 0]
    dv = base_y.astype(jnp.float32) + res[..., 1]
    if seed_mode == "shipped":
        u, v = seed_u + du, seed_v + dv
    else:
        u, v = du, dv
    out = jnp.stack([u, v], axis=-1)
    return out[0] if squeeze else out


def _halfpixel_taps(n_out: int, n_in: int):
    """cv2.INTER_LINEAR tap indices/weights (constants under jit)."""
    x = (np.arange(n_out, dtype=np.float64) + 0.5) * (n_in / n_out) - 0.5
    x0 = np.floor(x)
    u = x - x0
    i0 = x0.astype(np.int64)
    u = np.where(i0 < 0, 0.0, u)
    u = np.where(i0 >= n_in - 1, 1.0, u)
    i0 = np.clip(i0, 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    return i0, i1, u.astype(np.float32)


@functools.partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear_halfpixel(img: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """cv2.INTER_LINEAR-style float resize (half-pixel centers) of [H, W]."""
    h_out, w_out = out_hw
    y0, y1, vy = _halfpixel_taps(h_out, img.shape[0])
    x0, x1, ux = _halfpixel_taps(w_out, img.shape[1])
    a = img.astype(jnp.float32)
    rows = a[jnp.asarray(y0)] * (1 - vy)[:, None] + a[jnp.asarray(y1)] * vy[:, None]
    out = rows[:, jnp.asarray(x0)] * (1 - ux)[None, :] + rows[:, jnp.asarray(x1)] * ux[None, :]
    return out


def upscale_mv(mv: jnp.ndarray, scale: int, mode: str = "shipped") -> jnp.ndarray:
    """Coarse-to-fine flow seeding (me_test.py:51-63 semantics).

    'shipped' reproduces the reference's max-normalized resize (wrong for
    all-negative components, div-by-zero if max==0 - fidelity note 8);
    'fixed' resizes and scales directly. Accepts [H, W, 2] or batched
    [B, H, W, 2] (per-frame max-normalization, matching the reference's
    single-frame semantics).
    """
    mv = jnp.asarray(mv)
    if mv.ndim == 4:
        return jax.vmap(lambda m: upscale_mv(m, scale, mode))(mv)
    h, w = mv.shape[:2]
    out_hw = (h * scale, w * scale)
    u = mv[..., 0].astype(jnp.float32)
    v = mv[..., 1].astype(jnp.float32)
    if mode == "shipped":
        u_max = jnp.max(u)
        v_max = jnp.max(v)
        u = resize_bilinear_halfpixel(u / u_max, out_hw) * (u_max * scale)
        v = resize_bilinear_halfpixel(v / v_max, out_hw) * (v_max * scale)
    elif mode == "fixed":
        u = resize_bilinear_halfpixel(u, out_hw) * scale
        v = resize_bilinear_halfpixel(v, out_hw) * scale
    else:
        raise ValueError(mode)
    return jnp.stack([u, v], axis=-1)


def exact_flow_bound(levels: int, search_size: int = 15) -> int:
    """Analytic sup bound on |flow| for the exact pyramid (per axis, px).

    Each level's integer full search moves at most d = search_size // 2
    px from its seed, and coarse-to-fine seeding doubles the previous
    level's flow (upscale_mv x2; bilinear resize is a convex combination
    so it cannot exceed the per-axis extrema, in either seed_mode), so
    |f_L| <= 2 |f_{L-1}| + d and the finest level is bounded by
    (2**levels - 1) * d. The median filter selects one of its inputs and
    subpixel refinement is off on the exact path, so the bound holds for
    every returned level. At the me_test.py:76-90 defaults (3 levels,
    search 15) the bound is 49 - the integer-valued flow (pinned by
    test_exact_pyramid_flow_is_integer_valued) is losslessly servable as
    int8, which matters through a ~37 MB/s host link where the f32
    readback dominates the single-dispatch wall (bench.py).
    """
    return (2 ** levels - 1) * (search_size // 2)


@functools.lru_cache(maxsize=None)
def _median_network(n: int):
    """Comparator program selecting the median (index n//2) of n wires.

    Batcher odd-even mergesort on the next power of two; the +inf pad
    wires are constant-folded away (a compare against a known-inf wire
    is a value move, not an op), then the program is backward-pruned to
    the comparators that can reach the median output. Returns
    (ops, out_wire) where ops is a tuple of ('cmp'|'mov', a, b):
    cmp -> a, b = min(a, b), max(a, b); mov -> a = b.

    XLA's generic TPU sort on a length-81 axis costs ~14 ms per VGA
    flow pair (profiled, round 4); this network is a few hundred fused
    VPU min/max ops - ~2 orders of magnitude less device time - and
    selects the exact same median value.
    """
    n2 = 1 << (n - 1).bit_length()
    pairs = []

    def merge(lo, hi, r):  # hi inclusive; classic odd-even merge
        step = r * 2
        if step < hi - lo:
            merge(lo, hi, step)
            merge(lo + r, hi, step)
            for i in range(lo + r, hi - r, step):
                pairs.append((i, i + r))
        else:
            pairs.append((lo, lo + r))

    def sort_range(lo, hi):
        if hi - lo >= 1:
            mid = lo + (hi - lo) // 2
            sort_range(lo, mid)
            sort_range(mid + 1, hi)
            merge(lo, hi, 1)

    sort_range(0, n2 - 1)

    # constant-fold the pad wires (indices >= n start as +inf)
    inf = [w >= n for w in range(n2)]
    prog = []
    for a, b in pairs:  # a < b: a takes min, b takes max
        if inf[a] and inf[b]:
            continue
        if inf[b]:  # min lands on a (already there), b stays inf
            continue
        if inf[a]:  # real value at b moves down to a; b becomes inf
            prog.append(("mov", a, b))
            inf[a], inf[b] = False, True
        else:
            prog.append(("cmp", a, b))

    # backward prune to the median output wire
    needed = {n // 2}
    kept = []
    for op, a, b in reversed(prog):
        if op == "cmp":
            if a in needed or b in needed:
                needed.add(a)
                needed.add(b)
                kept.append((op, a, b))
        else:  # mov: post-op a = pre-op b
            if a in needed:
                needed.discard(a)
                needed.add(b)
                kept.append((op, a, b))
    return tuple(reversed(kept)), n // 2


def _median_select(planes):
    """Exact median of a list of same-shape arrays, elementwise."""
    ops, out = _median_network(len(planes))
    vals = {i: p for i, p in enumerate(planes)}
    for op, a, b in ops:
        if op == "cmp":
            va, vb = vals[a], vals[b]
            vals[a] = jnp.minimum(va, vb)
            vals[b] = jnp.maximum(va, vb)
        else:
            vals[a] = vals[b]
    return vals[out]


@functools.partial(jax.jit, static_argnames=("k",))
def median_filter_flow(mv: jnp.ndarray, k: int = 5) -> jnp.ndarray:
    """k x k per-component median filter of a [H, W, 2] (or batched
    [B, H, W, 2]) flow field.

    Per-pixel integer SAD matching is noisy (the reference never
    regularized it); a median between pyramid levels roughly HALVES the
    endpoint error on the Middlebury pair (7.6 -> 3.4 EPE at k=9).
    Selection runs on a pruned Batcher min/max network (_median_network)
    instead of jnp.sort - same median value, ~100x less device time.

    Inputs are assumed FINITE: the min/max comparator network propagates
    NaNs non-deterministically (jnp.minimum/maximum return NaN when
    either operand is NaN), unlike a sort, which places NaNs last and
    leaves the median of mostly-finite windows unaffected. Every
    in-package caller satisfies this (integer search outputs; the
    subpixel fit guards its denominators) - sanitize external flows
    (jnp.nan_to_num) before filtering.
    """
    mv = jnp.asarray(mv)
    if mv.ndim == 4:
        return jax.vmap(lambda m: median_filter_flow(m, k))(mv)
    h, w = mv.shape[:2]
    p = jnp.pad(mv, ((k // 2, k // 2), (k // 2, k // 2), (0, 0)), mode="edge")
    planes = [
        jax.lax.slice(p, (i, j, 0), (i + h, j + w, 2))
        for i in range(k)
        for j in range(k)
    ]
    return _median_select(planes)


def _refine_2d_subpixel(gray0, gray1, flow, patch_size: int, costfn: str):
    h, w = gray0.shape
    pm = patch_size // 2
    ys, xs = jnp.mgrid[0:h, 0:w]
    ys = ys.astype(jnp.int32)
    xs = xs.astype(jnp.int32)
    iu = jnp.round(flow[..., 0]).astype(jnp.int32)
    iv = jnp.round(flow[..., 1]).astype(jnp.int32)
    f0 = gray0.astype(jnp.int32)

    def boxsum(d):
        p = jnp.pad(d, ((pm, pm), (0, 0)))
        a = jnp.zeros_like(d)
        for k in range(patch_size):
            a = a + jax.lax.slice(p, (k, 0), (k + h, w))
        p = jnp.pad(a, ((0, 0), (pm, pm)))
        o = jnp.zeros_like(d)
        for k in range(patch_size):
            o = o + jax.lax.slice(p, (0, k), (h, k + w))
        return o

    def cost(dy, dx):
        g = _gather_padded_u8(gray1, ys + iv + dy, xs + iu + dx)
        g = g.astype(jnp.int32)
        d = jnp.abs(f0 - g) if costfn == "sad" else (f0 - g) * (f0 - g)
        return boxsum(d).astype(jnp.float32)

    c0 = cost(0, 0)
    cxm, cxp = cost(0, -1), cost(0, 1)
    cym, cyp = cost(-1, 0), cost(1, 0)

    def delta(cm, cc, cp):
        if costfn == "sad":
            # SAD of a translated signal is V-shaped (piecewise linear),
            # not parabolic: the equiangular fit delta = (cm - cp) /
            # (2 (max(cm, cp) - c0)) recovers the V's vertex EXACTLY
            # (a parabola systematically underestimates it ~2x)
            d = (cm - cp) / jnp.maximum(
                2.0 * (jnp.maximum(cm, cp) - cc), 1e-12
            )
        else:  # ssd: quadratic near the minimum - parabola fit
            denom = cm + cp - 2.0 * cc
            d = jnp.where(
                denom > 0, (cm - cp) / jnp.maximum(2.0 * denom, 1e-12), 0.0
            )
        # only trust an interior minimum of the 1-D cost section
        d = jnp.where((cm >= cc) & (cp >= cc), d, 0.0)
        return jnp.clip(d, -0.5, 0.5)

    du = delta(cxm, c0, cxp)
    dv = delta(cym, c0, cyp)
    return jnp.stack([iu.astype(jnp.float32) + du, iv.astype(jnp.float32) + dv], axis=-1)


@functools.partial(jax.jit, static_argnames=("patch_size", "costfn"))
def refine_flow_subpixel(
    gray0: jnp.ndarray,
    gray1: jnp.ndarray,
    flow: jnp.ndarray,
    patch_size: int = 5,
    costfn: str = "sad",
) -> jnp.ndarray:
    """Subpixel flow refinement: parabola fit on the local cost surface.

    For each pixel, the patch cost is evaluated at the ROUNDED integer
    flow and its 4 axis neighbors (same zero-padded patch convention as
    the exact search), and a 1-D parabola per axis places the analytic
    minimum within [-0.5, 0.5] of the integer winner. Pixels whose
    integer flow is not an interior minimum of the sampled section keep
    their integer value. The warp is applied per pixel (each patch is
    compared at the CENTER pixel's displacement); wherever the flow is
    locally constant - almost everywhere after median smoothing - this
    equals the exact windowed cost.

    A quality extension over the reference, which emits integer flows
    only (me_pyramid.py:130-205). Accepts [H, W] or [B, H, W] frames
    with flow [..., H, W, 2]; returns round(flow) + subpixel offset.
    """
    if costfn not in ("sad", "ssd"):
        raise ValueError(f"subpixel refinement needs sad/ssd, got {costfn!r}")
    gray0 = jnp.asarray(gray0)
    gray1 = jnp.asarray(gray1)
    flow = jnp.asarray(flow)
    if gray0.ndim == 3:
        return jax.vmap(
            lambda a, b, f: _refine_2d_subpixel(a, b, f, patch_size, costfn)
        )(gray0, gray1, flow)
    return _refine_2d_subpixel(gray0, gray1, flow, patch_size, costfn)


def estimate_motion_pyramid(
    gray0: jnp.ndarray,
    gray1: jnp.ndarray,
    levels: int = 3,
    search_size: int = 15,
    patch_size: int = 5,
    seed_mode: str = "fixed",
    method: str = "exact",
    smooth: int = 0,
    warp_bound="auto",
    seed_bound="auto",
    subpixel: int = 0,
    refine: str = "auto",
):
    """Coarse-to-fine driver (me_test.py:76-90): returns per-level flows,
    index 0 = coarsest, last = full resolution. Accepts [H, W] frames or
    batched [B, H, W] stacks (per-level flows come back [B, h, w, 2]) -
    batching amortizes the per-level dispatches for serving.

    Serving note: wrap this driver in ``jax.jit``. Eagerly, each
    level's CONCRETE seed picks a quantized (seed_bound, rebase_bound)
    kernel bucket, and content that wanders into a never-seen bucket
    compiles a fresh kernel variant on first sight (tens of seconds
    through a remote-compile toolchain; measured 22-51 s stalls on
    noise-perturbed Middlebury draws). Under jit the seed is a tracer,
    the whole pyramid is ONE program/dispatch, and the seeded kernel's
    dynamic per-band rebasing keeps the device cost at the eager level
    (34.5 ms leaf-op device vs 34.1 eager on the VGA 3-level exact
    pyramid, r5 hardware profile) - same flow, bit-identical.

    ``smooth`` > 0 median-filters each level's flow (kernel size
    ``smooth``) before seeding the next level and on the final output -
    a quality extension over the reference (see median_filter_flow).
    ``subpixel`` > 0 replaces that single median with ``subpixel``
    rounds of (equiangular subpixel refinement -> median smooth) per
    level (see refine_flow_subpixel) - an iterative median-regularized
    local descent on the cost surface. On the Middlebury pair it cuts
    the EPE a further ~35% over the integer+median flow (converged by
    ~12 rounds); each round costs 5 patch-cost maps + one median, far
    below the search itself. Rounds without an interleaved median
    measure WORSE than integer flow (the raw per-pixel fit is noisy) -
    hence the ``smooth`` kernel (default 5 when smooth == 0) is always
    applied inside the loop.

    ``warp_bound`` passes through to the fast mode (see
    estimate_motion_vector): the 'auto' default preserves seeds of any
    magnitude (the seed base is gather-warped once per level; only the
    bounded search residual uses masked shifts). An explicit int bound
    clamps each level's seed base once and warns when the upscaled
    flow actually saturates there.

    ``refine`` closes the fast mode's quality gap: the fast search's
    candidate costs read NEIGHBORS' displacements at window edges
    (_estimate_2d_fast docstring), which costs ~1.6 px EPE vs the exact
    search on Middlebury. 'auto' (the default, active for
    method='fast') runs the measured-best HYBRID schedule: the
    COARSEST level uses the unseeded exact search outright (it seeds
    everything downstream and is the cheapest level), and every later
    level runs the fast iteration followed by ONE seeded-EXACT pass
    (the fused Pallas clamped-base kernel) around its median-smoothed
    flow. On Middlebury this scores BETTER than the reference-faithful
    full-exact pyramid - EPE 3.17 vs 3.44 vs 5.10 pure-fast (round-4
    sweep, ROADMAP) - because the fast rounds' interleaved medians
    regularize the seeds the exact pass then searches around. With
    ``levels=1`` 'auto' stays pure fast (there is no cheap coarsest
    level to trade). 'exact' forces the same refinement passes for any
    method; 'none' disables refinement (pure fast, the 766 MP/s
    single-field mode).
    """
    from oclcomputervision_tpu.ops.pyramid import gaussian_pyramid

    gray0 = jnp.asarray(gray0)
    gray1 = jnp.asarray(gray1)
    if gray0.ndim == 3:
        from oclcomputervision_tpu.ops._layout import guard_batch_first

        guard_batch_first(gray0.shape, "estimate_motion_pyramid")
    batched = gray0.ndim == 3  # [B, H, W] luma stack
    pyr0 = gaussian_pyramid(gray0, 2, levels, batched=batched)
    pyr1 = gaussian_pyramid(gray1, 2, levels, batched=batched)
    if refine not in ("auto", "exact", "none"):
        raise ValueError(f"unknown refine mode {refine!r}")
    # 'auto' needs >= 2 levels: with a single level the "coarsest" IS
    # the full-resolution frame, and swapping the requested fast search
    # for a full-res unseeded exact one would silently cost orders of
    # magnitude (the single-level fast call is the documented serving
    # mode) - levels=1 'auto' stays pure fast.
    do_refine = refine == "exact" or (
        refine == "auto" and method == "fast" and levels > 1
    )
    flows = []
    seed = None
    for lv in range(levels):
        lv_method = method
        if do_refine and method == "fast" and lv == 0:
            # hybrid schedule: the coarsest level seeds everything and
            # is the cheapest - use the unseeded exact search outright
            lv_method = "exact"
        mv = estimate_motion_vector(
            pyr0[lv], pyr1[lv], search_size, patch_size, seed=seed,
            seed_mode=seed_mode, method=lv_method, warp_bound=warp_bound,
            seed_bound=seed_bound,
        )
        if do_refine and lv > 0:
            # one seeded-exact pass around the median-smoothed flow:
            # re-evaluates every pixel's 3x3x3-round search exactly
            # (the fast candidate costs read neighbors' displacements
            # at window edges; this removes that approximation). The
            # seed is OUR OWN intermediate, so the user's seed_bound
            # (a level-seed policy) does not apply here: size the
            # bound from the concrete refine seed itself (same {8..32}
            # quanta as 'auto'), clamp the outlier tail to it (a >32 px
            # value in a fast flow is noise; re-searching +-reach
            # around the cap beats keeping it), and pass the SAME
            # bound down - bound == clamp, so the pass is never
            # silently saturated and never warns. Under an enclosing
            # jit the seed is a tracer: use the full 32 px cap; the
            # seeded kernel's DYNAMIC per-band rebasing then recovers
            # the same scan cost the eager quantum sizing would pick.
            sk = smooth if smooth > 0 else 5
            rs = median_filter_flow(mv, sk)
            rb = 32
            if not isinstance(rs, jax.core.Tracer):
                from oclcomputervision_tpu.ops.pallas.me_pallas import (
                    seed_band_stats,
                    stats_base_max,
                )

                bm = stats_base_max(seed_band_stats(rs, rs.shape[-3]))
                for q in (8, 12, 16, 20, 24, 32):
                    rb = q
                    if bm <= q:
                        break
            rs = jnp.clip(rs, -float(rb), float(rb))
            mv = estimate_motion_vector(
                pyr0[lv], pyr1[lv], search_size, patch_size,
                seed=rs, seed_mode="fixed",
                method="exact", seed_bound=rb,
            )
        if subpixel > 0:
            sk = smooth if smooth > 0 else 5
            for _ in range(subpixel):
                mv = refine_flow_subpixel(pyr0[lv], pyr1[lv], mv, patch_size)
                mv = median_filter_flow(mv, sk)
            flows.append(mv)
            if lv + 1 < levels:
                seed = upscale_mv(mv, 2, mode=seed_mode)
        else:
            # ONE dispatch for (median smooth, next-level seed upscale):
            # the pyramid driver is eager by design (concrete seeds are
            # what enable host-side bound sizing and per-band rebasing),
            # so every separate jitted call is its own ~13 ms tunnel
            # round trip - fuse the level tail
            mv, nxt = _postprocess_level(
                mv, smooth, seed_mode, lv + 1 < levels
            )
            flows.append(mv)
            if nxt is not None:
                seed = nxt
    return flows


@functools.partial(jax.jit, static_argnames=("k", "mode", "upscale"))
def _postprocess_level(mv, k: int, mode: str, upscale: bool):
    """Fused per-level tail of estimate_motion_pyramid: optional median
    smooth + next-level seed upscale in ONE device dispatch."""
    if k > 0:
        mv = median_filter_flow(mv, k)
    return mv, (upscale_mv(mv, 2, mode=mode) if upscale else None)
