"""Pallas TPU kernel for the RAISR filter-select + apply stage.

The TPU rebuild of raisr.cl's stages 5-6 (hash -> per-pixel learned
filter). The XLA path (ops/raisr.apply_filters_fast) must materialize
the all-bucket response tensor r [N, 216] and the bucket one-hot in HBM
(~7 GB at 4 MP out); this kernel keeps both in VMEM per tile:

  per output row tile (one pixel-type phase at a time):
    DMA the s^2 parity planes' row band (halo 2*hp) into VMEM
    per RC-row chunk:
      build the tap matrix Pm [128, RC, W] with 121 contiguous block
        copies (taps live on sublanes; stride-free because parity
        planes are pre-deinterleaved)
      one matmul r = Wmat [224, 128] @ Pm [128, RC*W]  (MXU; chunking
        the N axis measured ~20% faster than per-row matmuls)
      per row: out[row] = sum_s (bucket_row == s) * r[s, row]  (VPU
               one-hot row-dot; rows 216..223 are zero padding)
  RC adapts to width so the response buffer stays <= ~8MB of VMEM.

The bank is bf16 (taps), patches bf16, accumulation fp32: response
error ~0.3% of the value - well inside RAISR's own model error (PSNR
vs the fp64 oracle > 45 dB).

Plane convention (shared with ops/raisr's plane-space pipeline): the
parity planes are ORIGIN-ALIGNED with halo hp = ceil((fl//2)/s):

    planes[a*s + b][hp + i, hp + j] = up_e(s*i + a, s*j + b)

where up_e is the edge-replicated cheap upscale; out-of-image plane
entries replicate the boundary (exactly the reference's edge padding,
raisr.cl:170-193's clamped preload). Geometry contract (the wrapper
pads): w2 % 128 == 0, h2 % TILE_H == 0, planes are
[s*s, h2 + HALO_ROWS, w2 + 128] fp32 and 2*hp <= HALO_ROWS.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64  # output rows per grid step


def _hash_tile_h(w2p: int, s: int = 2) -> int:
    """Hash kernel rows per grid step, or 0 if no tile fits.

    The kernel's scoped-vmem footprint (scratch + the unrolled stencil
    temporaries) scales ~ s^2 * tile * w2p; empirically the 16 MB limit
    admits s^2*th*w2p <= 131072 (s=2: 64@512 ok / 64@1024 OOM by 9.25M;
    s=3: 32@256 ok / 32@512 OOM by 1.3M) with a tighter 65536 at s=4
    (verified 16@256, 8@512). Taller tiles only buy the halo fraction
    (~5% at 64 vs 32), so the largest fitting power of two >= 8 is
    taken; 0 means the caller must use the XLA twin."""
    budget = 65536 if s >= 4 else 131072
    cap = budget // (s * s * w2p)
    th = 8
    while th * 2 <= min(cap, 64):
        th *= 2
    return th if cap >= 8 else 0


HALO_ROWS = 8  # >= 2 * plane halo, padded to a sublane multiple
NB_PAD = 224  # 216 buckets padded to a sublane multiple


def _mm_tap_mats(cfg) -> np.ndarray:
    """Translation-invariant banded tap matrices for the '_mm' hash
    modes: [s, s, 128 + 2*bh, 128] f32 with W[b, b2, bh + co + j, j] =
    k1[u] for every blur tap u landing on column phase b2 at column
    offset co - one constant serves every aligned 128-column chunk."""
    from oclcomputervision_tpu.ops.raisr import _blur_k1

    s = cfg.scale
    g = cfg.gauss_len // 2
    bh = -(-g // s)
    k1 = [float(v) for v in _blur_k1(cfg)]
    wc = np.zeros((s, s, 128 + 2 * bh, 128), np.float32)
    for b in range(s):
        for u in range(cfg.gauss_len):
            b2, co = (b + u - g) % s, (b + u - g) // s
            wc[b, b2, bh + co + np.arange(128), np.arange(128)] += k1[u]
    return wc


def plane_halo(fl: int, s: int, gauss_len: int = 9) -> int:
    """Origin-aligned plane halo covering the filter's reach AND the
    hash stage's (Sobel 1 + structure-tensor blur gauss_len//2)."""
    return max(-(-(fl // 2) // s), -(-(gauss_len // 2) // s) + 1)


def _row_chunk(w2: int, double_pm: bool = False) -> int:
    """Rows per tap-matrix/matmul chunk: largest power of two (<= 16)
    whose [NB_PAD, rc*w2] f32 response fits the scoped-vmem budget.

    Bigger chunks amortize per-chunk overhead: rc=16 at w2=1024 (a
    14.7 MB response) measured 10.40 ms/phase vs 10.85 at rc=8 and
    16.0 at rc=4, and compiles despite the naive buffer sum exceeding
    16 MB (Mosaic streams the matmul output); the 15 MB cap admits
    exactly the run-verified configs and everything strictly smaller.
    Double-buffered-Pm variants charge both tap buffers against the
    same cap (rc=8 at w2=1024), trading the measured ~4% rc=16 edge
    for cross-chunk copy/matmul overlap."""
    rc = 16
    pm_bytes = (2 * 128 * w2 * 2) if double_pm else 0
    while rc > 1 and NB_PAD * rc * w2 * 4 + pm_bytes * rc > 15 * 2**20:
        rc //= 2
    return rc


def _tap_tables(fl: int, s: int, py: int, px: int, hp: int):
    """Static per-tap (plane index, in-band row/col offset) tables.

    Output pixel (s*y + py, s*x + px) tap (ti, tj) reads full-res
    (s*y + py - m + ti, ...) = plane (py - m + ti) % s at plane row
    y + (py - m + ti)//s; with the origin shift hp the in-band offset
    hp + (py - m + ti)//s is a static value in [0, 2*hp].
    """
    m = fl // 2
    tap_plane, tap_off = [], []
    for ti in range(fl):
        for tj in range(fl):
            a, ro = (py - m + ti) % s, (py - m + ti) // s
            b, co = (px - m + tj) % s, (px - m + tj) // s
            tap_plane.append(a * s + b)
            tap_off.append((hp + ro, hp + co))
    return tap_plane, tap_off


def _make_kernel(
    fl: int, s: int, py: int, px: int, w2: int, hp: int, variant: str = "g4"
):
    n_taps = fl * fl
    rc = _row_chunk(w2)
    tap_plane, tap_off = _tap_tables(fl, s, py, px, hp)
    groups = {
        "g2": 2, "g2bf": 2, "g4": 4, "g4bf": 4, "g8": 8, "g4w": 4,
        "g4r": 4, "g8r": 8, "g4p": 4, "g8p": 8, "g4s": 4, "g8s": 8,
    }.get(variant, 1)
    # 'g4s'/'g8s': STAGED tap build. The tap copies' cost is the
    # sublane relayout of the misaligned +roff row offsets (g4w/g4r/g4p
    # triangulation, ROADMAP) - but roff depends only on the tap ROW
    # ti, so only len({roff}) x (planes used at that roff) distinct
    # source bands exist per chunk (12 at s=2, fl=11, not 121). Stage
    # those once per chunk (paying the relayout + the f32->bf16 cast
    # 12 times), then build the 121 Pm rows from the staging buffer
    # with sublane-ALIGNED bf16 reads (only a cheap lane offset).
    staged = variant in ("g4s", "g8s")
    stage_pairs = sorted(
        {(tap_off[q][0], tap_plane[q]) for q in range(n_taps)}
    )
    stage_idx = {pair: k for k, pair in enumerate(stage_pairs)}
    # 'g4r'/'g8r': build each tap row band from an offset-0 full-width
    # (lane-aligned) read + lane-rotate instead of a lane-misaligned
    # slice; bit-identical elements (see the hash kernel's roll note).
    # MEASURED NEGATIVE (ROADMAP): the tap cost is sublane relayout.
    roll_taps = variant in ("g4r", "g8r")
    # 'g4p'/'g8p': cross-chunk software pipeline - chunk ci+1's tap
    # copies are issued between chunk ci's group matmuls into a SECOND
    # disjoint Pm scratch, so the VPU copies can run under the MXU
    # drain; rc shrinks to keep both buffers in the scoped-vmem budget
    double_pm = variant in ("g4p", "g8p")
    if double_pm:
        rc = _row_chunk(w2, double_pm=True)
    # column groups slice lanes: degrade to the largest group count
    # (not necessarily a power of two - w2p=768 takes 6) whose slices
    # stay 128-lane-aligned at this width
    if w2 % (groups * 128) != 0:
        g = min(groups, w2 // 128)
        while g > 1 and w2 % (g * 128) != 0:
            g -= 1
        groups = g
    sel_dt = jnp.bfloat16 if variant.endswith("bf") else jnp.float32
    # 'g4w': cast the whole plane band to bf16 ONCE per tile, so the
    # 121 per-chunk tap copies move half the bytes with aligned reads
    wide_cast = variant == "g4w"
    # diagnostic variants (WRONG RESULTS - timing isolation only):
    # 'notaps' skips the tap-matrix build, 'nosel' replaces the one-hot
    # select with a raw resp-row store
    diag_notaps = variant == "notaps"
    diag_nosel = variant == "nosel"

    def kernel(bucket_ref, wmat_ref, planes_hbm, out_ref, buf, pm_buf, sems,
               *maybe_buf16):
        bi = pl.program_id(0)  # batch image
        i = pl.program_id(1)  # row tile
        # DMA the parity planes' row band (TILE_H + halo) into VMEM
        for p in range(s * s):
            pltpu.make_async_copy(
                planes_hbm.at[bi, p, pl.ds(i * TILE_H, TILE_H + HALO_ROWS), :],
                buf.at[p],
                sems.at[p],
            ).start()
        for p in range(s * s):
            pltpu.make_async_copy(
                planes_hbm.at[bi, p, pl.ds(i * TILE_H, TILE_H + HALO_ROWS), :],
                buf.at[p],
                sems.at[p],
            ).wait()

        wmat = wmat_ref[:]  # [NB_PAD, 128] bf16
        nbit = jax.lax.broadcasted_iota(jnp.int32, (NB_PAD, 1), 0)
        nbit_s = nbit.astype(sel_dt)

        if wide_cast:
            # one aligned band-wide cast; tap copies then move bf16
            buf16 = maybe_buf16[0]
            for p in range(s * s):
                buf16[p] = buf[p].astype(jnp.bfloat16)
            tap_src = buf16
        else:
            tap_src = buf

        # zero the tap-pad rows once (scratch is uninitialized; 0 * NaN
        # would poison the matmul even though wmat's pad columns are 0)
        if not double_pm:
            for q in range(n_taps, 128):
                pm_buf[q] = jnp.zeros((rc, w2), jnp.bfloat16)

        def select_rows(resp, r0, rows, c0, cols):
            # out[r] = resp[bucket[r], :] via one-hot row reduction; the
            # bucket ids (< 216) are exact in bf16, so the compare and
            # masked reduce can run in the narrow type (half the vregs)
            if diag_nosel:
                for r in range(rows):
                    out_ref[0, pl.ds(r0 + r, 1), pl.ds(c0, cols)] = (
                        resp[0:1, r * cols : (r + 1) * cols].astype(jnp.float32)
                    )
                return
            for r in range(rows):
                brow = bucket_ref[0, pl.ds(r0 + r, 1), pl.ds(c0, cols)]
                oh = (brow.astype(sel_dt) == nbit_s).astype(sel_dt)
                # the reduce stays in sel_dt: one-hot masking leaves a
                # single nonzero per column, so narrow adds are exact
                out_ref[0, pl.ds(r0 + r, 1), pl.ds(c0, cols)] = jnp.sum(
                    oh * resp[:, r * cols : (r + 1) * cols], axis=0,
                    keepdims=True,
                ).astype(jnp.float32)

        if double_pm:
            # cross-chunk pipeline over two DISJOINT Pm scratches (so
            # Mosaic's alias analysis cannot serialize chunk ci+1's tap
            # writes against chunk ci's loaded taps)
            pm_bufs = (pm_buf, maybe_buf16[0])
            for sl in range(2):
                for q in range(n_taps, 128):
                    pm_bufs[sl][q] = jnp.zeros((rc, w2), jnp.bfloat16)

            def build_taps(sl, r0):
                for q in range(n_taps):
                    roff, coff = tap_off[q]
                    pm_bufs[sl][q] = tap_src[
                        tap_plane[q], pl.ds(r0 + roff, rc), pl.ds(coff, w2)
                    ].astype(jnp.bfloat16)

            nchunks = TILE_H // rc
            wg = w2 // groups
            build_taps(0, 0)
            for ci in range(nchunks):
                r0 = ci * rc
                pm3 = pm_bufs[ci % 2][:]
                resps = []
                for g in range(groups):
                    resps.append(
                        jax.lax.dot_general(
                            wmat,
                            pm3[:, :, g * wg : (g + 1) * wg].reshape(128, rc * wg),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(sel_dt)
                    )
                    if g == 0 and ci + 1 < nchunks:
                        # issue the NEXT chunk's tap copies while this
                        # chunk's matmuls drain the MXU
                        build_taps((ci + 1) % 2, r0 + rc)
                    if g > 0:
                        select_rows(resps[g - 1], r0, rc, (g - 1) * wg, wg)
                select_rows(resps[-1], r0, rc, (groups - 1) * wg, wg)
            return

        # fully static unrolled: Mosaic rejects dynamic sublane indices
        # that are not provably 8-aligned (the +roff tap offsets aren't)
        for ci in range(TILE_H // rc):
            r0 = ci * rc
            # tap matrix: Pm[q, r, :] = plane[tap_plane[q]][r0+r+roff, coff:coff+w2]
            if diag_notaps:
                if ci == 0:
                    for q in range(n_taps):
                        pm_buf[q] = jnp.zeros((rc, w2), jnp.bfloat16)
            elif roll_taps:
                wq_p = buf.shape[2]  # planes width (w2 + 128 by contract)
                for q in range(n_taps):
                    roff, coff = tap_off[q]
                    src = tap_src[tap_plane[q], pl.ds(r0 + roff, rc), :]
                    if coff:
                        src = pltpu.roll(src, wq_p - coff, 1)
                    pm_buf[q] = src[:, :w2].astype(jnp.bfloat16)
            elif staged:
                stg = maybe_buf16[0]
                for k, (roff, p) in enumerate(stage_pairs):
                    stg[k] = tap_src[p, pl.ds(r0 + roff, rc), :].astype(
                        jnp.bfloat16
                    )
                for q in range(n_taps):
                    roff, coff = tap_off[q]
                    pm_buf[q] = stg[
                        stage_idx[(roff, tap_plane[q])], :, pl.ds(coff, w2)
                    ]
            else:
                for q in range(n_taps):
                    roff, coff = tap_off[q]
                    pm_buf[q] = tap_src[
                        tap_plane[q], pl.ds(r0 + roff, rc), pl.ds(coff, w2)
                    ].astype(jnp.bfloat16)

            if groups == 1:
                resp = jax.lax.dot_general(
                    wmat,
                    pm_buf[:].reshape(128, rc * w2),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [NB_PAD, rc*w2]
                select_rows(resp, r0, rc, 0, w2)
            else:
                # column-group software pipeline: issue group g+1's
                # matmul before selecting group g, so the one-hot
                # reduce (VPU) runs while the MXU drains the next group
                wg = w2 // groups
                pm3 = pm_buf[:]  # [128, rc, w2]
                resps = []
                for g in range(groups):
                    # Mosaic requires a 32-bit matmul accumulator; the
                    # bf16 variant narrows AFTER (one cast pass halves
                    # every subsequent select read)
                    resps.append(
                        jax.lax.dot_general(
                            wmat,
                            pm3[:, :, g * wg : (g + 1) * wg].reshape(128, rc * wg),
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        ).astype(sel_dt)
                    )
                    if g > 0:
                        select_rows(resps[g - 1], r0, rc, (g - 1) * wg, wg)
                select_rows(resps[-1], r0, rc, (groups - 1) * wg, wg)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("fl", "s", "py", "px", "hp", "interpret", "variant")
)
def _apply_phase(
    planes, bucket_t, wmat, fl, s, py, px, hp, interpret=False, variant=None
):
    """planes [B, s*s, h2+HALO, w2+128] f32 (origin (hp, hp)), bucket_t
    [B, h2, w2] i32, wmat [NB_PAD, 128] bf16 -> out [B, h2, w2] f32.

    The batch rides the leading grid axis: one launch serves the whole
    image stack (kernel-launch count is the dominant overhead on this
    runtime at single-image sizes).
    """
    nb, h2, w2 = bucket_t.shape
    nimg = planes.shape[0]
    assert nimg % nb == 0, (nimg, nb)
    assert 2 * hp <= HALO_ROWS, (hp, HALO_ROWS)
    _tp, _to = _tap_tables(fl, s, py, px, hp)
    n_stage = len({(o[0], p) for o, p in zip(_to, _tp)})
    if variant is None:
        # hardware default: 8-column-group software pipeline + STAGED
        # sublane-aligned tap build (g8s: 1.748 ms/phase/4x4MP vs g8
        # 1.909, base 2.629 - bit-exact; ROADMAP measurements; groups
        # degrade to w2//128 at narrow widths). Flip to "g4" if Mosaic
        # compile latency ever outweighs the win (g8's compile took 20
        # min once through a degraded remote-compile service; the
        # persistent cache makes it one-time). Interpret mode keeps the
        # straight-line kernel (the grouped unroll is ~2x slower under
        # the interpreter and numerically identical)
        variant = "base" if interpret else "g8s"
    kernel = _make_kernel(fl, s, py, px, w2, hp, variant)
    return pl.pallas_call(
        kernel,
        grid=(nimg, h2 // TILE_H),
        in_specs=[
            # channel stacks share one bucket map: image c*nb + b reads
            # bucket b (zero-copy - the modulo lives in the index map)
            pl.BlockSpec(
                (1, TILE_H, w2), lambda b, i: (b % nb, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wmat, whole
            pl.BlockSpec(memory_space=pl.ANY),  # planes stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, w2), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nimg, h2, w2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s * s, TILE_H + HALO_ROWS, planes.shape[3]), jnp.float32),
            pltpu.VMEM(
                (128, _row_chunk(w2, variant in ("g4p", "g8p")), w2),
                jnp.bfloat16,
            ),
            pltpu.SemaphoreType.DMA((s * s,)),
        ]
        + (
            [pltpu.VMEM(
                (s * s, TILE_H + HALO_ROWS, planes.shape[3]), jnp.bfloat16
            )]
            if variant == "g4w"
            else []
        )
        + (
            # second disjoint Pm scratch for the cross-chunk pipeline
            [pltpu.VMEM(
                (128, _row_chunk(w2, True), w2), jnp.bfloat16
            )]
            if variant in ("g4p", "g8p")
            else []
        )
        + (
            # staging buffer for the sublane-aligned tap build: one
            # bf16 band per distinct (row offset, plane) pair
            [pltpu.VMEM(
                (n_stage, _row_chunk(w2), planes.shape[3]), jnp.bfloat16
            )]
            if variant in ("g4s", "g8s")
            else []
        ),
        interpret=interpret,
    )(bucket_t, wmat, planes)


def _make_hash_kernel(cfg, w2p: int, wq: int, angle_mode: str = "halfplane"):
    """Plane-space RAISR hash (raisr.cl stages 4-5) as one VMEM-resident
    kernel: Sobel gradients, 9x9 separable structure-tensor blur, eigen
    analysis, and (angle, strength, coherence) bucketing - per row band,
    all phases at once. The XLA twin (ops/raisr.hash_planes) round-trips
    ~50x the image size in fp32 intermediates through HBM (measured
    4.1 ms/img of the 7.5 ms batched pipeline); here the only HBM
    traffic is the plane band in and the int32 bucket tile out.

    Angle bucketing: Mosaic has no atan2, so floor(theta/pi*NA) is
    computed as NA-1 half-plane sign tests. Map (u, v) = (l1 - d, b) to
    the upper half-plane (flip both signs when v < 0); then
    theta >= k*pi/NA  <=>  v'*cos(a_k) - u'*sin(a_k) > 0 (strict >, so
    the zero vector lands in bucket 0 like atan2(0, 0) = 0, and the
    v = 0, u < 0 ray passes every test -> bucket NA-1, matching the XLA
    path's clip of the pi-wrapped atan2). Only values EXACTLY on a
    bucket boundary can differ from the XLA path (fp-measure-zero).
    """
    from oclcomputervision_tpu.oracle.raisr import SOBEL_X, SOBEL_Y
    from oclcomputervision_tpu.ops.raisr import _blur_k1

    s = cfg.scale
    th = _hash_tile_h(w2p, s)
    hp = plane_halo(cfg.filter_len, s, cfg.gauss_len)
    g = cfg.gauss_len // 2
    bh = -(-g // s)  # plane halo of the blur stage
    na = cfg.num_angle
    k1 = [float(v) for v in _blur_k1(cfg)]

    ext_c = w2p + 2 * bh
    # 'ratio_sym_roll': express every lane-misaligned column read as a
    # lane-ROTATE of an offset-0 (aligned) read + aligned slice. The
    # rotated elements are the same elements, so results are
    # bit-identical to the slice form; the probe measured a roll at
    # ~2x an aligned read vs ~9x for the misaligned slice it replaces
    # (benchmarks/micro_probes.py shift).
    lane_roll = "_roll" in angle_mode
    # roll mode pads the vbuf scratch width to a lane multiple so the
    # stage-3 rotates act on whole vregs
    vw = -(-ext_c // 128) * 128 if lane_roll else ext_c
    # '_mm'/'_mmx': the HORIZONTAL blur (stage 3 - 4.1 of the 8.0 ms
    # hash, its largest term) as banded-matmul column chunks on the
    # MXU: output chunk [:, 128c:128c+128] = sum_{b2} vbuf slab
    # [:, 128c : 128c + 128 + 2bh] @ Wc[b][b2], with Wc translation-
    # invariant (one [128+2bh, 128] constant per (b, b2) serves every
    # chunk) and the (t, a) planes concatenated into one [3*s*th, .]
    # operand so each chunk is a single near-full MXU pass. '_mm' runs
    # at DEFAULT matmul precision (bf16 passes - buckets can flip near
    # quantizer boundaries; PSNR-gated, see ROADMAP), '_mmx' at
    # HIGHEST. Requires w2p % 128 == 0 (the wrapper gates).
    mm = angle_mode.endswith("_mm") or angle_mode.endswith("_mmx")
    kband = 128 + 2 * bh
    bounds = [
        (float(np.cos(np.pi * k / na)), float(np.sin(np.pi * k / na)))
        for k in range(1, na)
    ]
    squant = [float(v) for v in cfg.strength_quantizers]
    cquant = [float(v) for v in cfg.coherence_quantizers]

    def kernel(planes_hbm, *refs):
        if mm:
            wc_ref, out_ref, buf, t3, vbuf, sems = refs
        else:
            out_ref, buf, t3, vbuf, sems = refs
        bi = pl.program_id(0)
        i = pl.program_id(1)
        for p in range(s * s):
            pltpu.make_async_copy(
                planes_hbm.at[
                    bi, p, pl.ds(i * th, th + HALO_ROWS), :
                ],
                buf.at[p],
                sems.at[p],
            ).start()
        for p in range(s * s):
            pltpu.make_async_copy(
                planes_hbm.at[
                    bi, p, pl.ds(i * th, th + HALO_ROWS), :
                ],
                buf.at[p],
                sems.at[p],
            ).wait()

        # stage 1: gradients + squared-tensor products for every phase,
        # rows with a bh-plane halo (the vertical blur's reach), cols
        # with the same halo for the horizontal pass
        for p_src in range(s * s):
            a, b = divmod(p_src, s)

            def rd(dr, dc):
                a2, ro = (a + dr) % s, (a + dr) // s
                b2, co = (b + dc) % s, (b + dc) // s
                off = hp - bh + co
                if not lane_roll or off == 0:
                    return buf[
                        a2 * s + b2,
                        pl.ds(hp - bh + ro, th + 2 * bh),
                        pl.ds(off, ext_c),
                    ]
                # rows sliced (sublane slices are cheap), full lanes read
                # aligned, then rotated left by `off`: out[j] = in[j+off]
                # for j < ext_c (off + ext_c <= wq, so no wrap reaches
                # the slice)
                full = buf[a2 * s + b2, pl.ds(hp - bh + ro, th + 2 * bh), :]
                return pltpu.roll(full, wq - off, 1)[:, :ext_c]

            gx = None
            gy = None
            for u in range(3):
                for v in range(3):
                    cx = float(SOBEL_X[u, v])
                    cy = float(SOBEL_Y[u, v])
                    if cx == 0.0 and cy == 0.0:
                        continue
                    t = rd(u - 1, v - 1)
                    if cx != 0.0:
                        gx = cx * t if gx is None else gx + cx * t
                    if cy != 0.0:
                        gy = cy * t if gy is None else gy + cy * t
            t3[0, p_src] = gx * gx
            t3[1, p_src] = gx * gy
            t3[2, p_src] = gy * gy

        if angle_mode == "diag_s1":  # timing isolation: gradients only
            for p_out in range(s * s):
                out_ref[0, p_out] = t3[
                    0, p_out, pl.ds(bh, th), pl.ds(bh, w2p)
                ].astype(jnp.int32)
            return

        # stage 2: vertical blur for every (out-row-phase, src-col-phase)
        # pair - the horizontal pass mixes column phases, so each column
        # phase's vertical result must be kept
        sym = angle_mode.startswith("ratio_sym")
        for a_out in range(s):
            for b_src in range(s):
                for t in range(3):
                    vp = None
                    if sym:
                        # the Gaussian is symmetric (k1[u] == k1[n-1-u]):
                        # pre-adding mirror taps halves the multiplies.
                        # (a+b)*k rounds differently from a*k + b*k, so
                        # only boundary-adjacent buckets can flip -
                        # agreement recorded in ROADMAP.
                        terms = []
                        n = cfg.gauss_len
                        for u in range(n // 2):
                            a2a, roa = (a_out + u - g) % s, (a_out + u - g) // s
                            a2b, rob = (
                                (a_out + n - 1 - u - g) % s,
                                (a_out + n - 1 - u - g) // s,
                            )
                            pair = (
                                t3[t, a2a * s + b_src, pl.ds(bh + roa, th), :]
                                + t3[t, a2b * s + b_src, pl.ds(bh + rob, th), :]
                            )
                            terms.append(k1[u] * pair)
                        a2c, roc = a_out % s, a_out // s  # center tap u = g
                        terms.append(
                            k1[g]
                            * t3[t, a2c * s + b_src, pl.ds(bh + roc, th), :]
                        )
                        for term in terms:
                            vp = term if vp is None else vp + term
                    else:
                        for u in range(cfg.gauss_len):
                            a2, ro = (a_out + u - g) % s, (a_out + u - g) // s
                            term = k1[u] * t3[
                                t, a2 * s + b_src, pl.ds(bh + ro, th), :
                            ]
                            vp = term if vp is None else vp + term
                    if lane_roll:
                        # padded scratch: store the ext_c valid columns
                        vbuf[t, a_out * s + b_src, :, pl.ds(0, ext_c)] = vp
                    else:
                        vbuf[t, a_out * s + b_src] = vp

        if angle_mode == "diag_s12":  # timing isolation: skip stage 3
            for p_out in range(s * s):
                out_ref[0, p_out] = vbuf[0, p_out, :, :w2p].astype(jnp.int32)
            return

        # 'ratio_sym_ps': pre-materialize each distinct column-shifted
        # vbuf slice once per output-row phase (the horizontal taps
        # re-read the same (t, plane, co) lane-misaligned slice up to
        # twice across the row's column phases; lane relayouts measured
        # ~9x a sublane slice, so paying each once then reading aligned
        # temps trims the blur's dominant term)
        preshift = angle_mode == "ratio_sym_ps"
        ps_cache = {}

        def vslice(t, plane, co):
            # traced ref loads are not CSE'd by Mosaic; caching the
            # traced value pays each lane-misaligned slice once
            off = bh + co
            if lane_roll:
                if off == 0:
                    return vbuf[t, plane, :, pl.ds(0, w2p)]
                # rotate left by `off` over the padded width, then take
                # the aligned head; off + w2p <= ext_c so no wrap
                # reaches the slice
                full = vbuf[t, plane]
                return pltpu.roll(full, vw - off, 1)[:, :w2p]
            if not preshift:
                return vbuf[t, plane, :, pl.ds(bh + co, w2p)]
            key = (t, plane, co)
            if key not in ps_cache:
                ps_cache[key] = vbuf[t, plane, :, pl.ds(bh + co, w2p)]
            return ps_cache[key]

        abd_mm = {}
        if mm:
            prec = (
                jax.lax.Precision.HIGHEST
                if angle_mode.endswith("_mmx")
                else jax.lax.Precision.DEFAULT
            )
            nchunk = w2p // 128
            chunks = {}  # (t, a, b) -> per-chunk [th, 128] columns
            for c in range(nchunk):
                slabs = []
                for b2 in range(s):
                    rows = [
                        vbuf[t, a * s + b2, :, pl.ds(c * 128, kband)]
                        for t in range(3)
                        for a in range(s)
                    ]
                    slabs.append(jnp.concatenate(rows, axis=0))
                for b in range(s):
                    acc = None
                    for b2 in range(s):
                        r = jnp.dot(
                            slabs[b2],
                            wc_ref[b, b2],
                            precision=prec,
                            preferred_element_type=jnp.float32,
                        )
                        acc = r if acc is None else acc + r
                    for t in range(3):
                        for a in range(s):
                            chunks.setdefault((t, a, b), []).append(
                                acc[(t * s + a) * th : (t * s + a + 1) * th]
                            )
            for key, pieces in chunks.items():
                abd_mm[key] = jnp.concatenate(pieces, axis=1)

        for p_out in range(s * s):
            a, b = divmod(p_out, s)
            abd = [abd_mm[(t, a, b)] for t in range(3)] if mm else []
            for t in () if mm else range(3):
                hp_acc = None
                if sym:
                    n = cfg.gauss_len
                    for u in range(n // 2):
                        b2a, coa = (b + u - g) % s, (b + u - g) // s
                        b2b, cob = (
                            (b + n - 1 - u - g) % s,
                            (b + n - 1 - u - g) // s,
                        )
                        pair = vslice(t, a * s + b2a, coa) + vslice(
                            t, a * s + b2b, cob
                        )
                        term = k1[u] * pair
                        hp_acc = term if hp_acc is None else hp_acc + term
                    hp_acc = hp_acc + k1[g] * vslice(t, a * s + b % s, b // s)
                else:
                    for u in range(cfg.gauss_len):
                        b2, co = (b + u - g) % s, (b + u - g) // s
                        term = k1[u] * vslice(t, a * s + b2, co)
                        hp_acc = term if hp_acc is None else hp_acc + term
                abd.append(hp_acc)
            ta, tb, td = abd

            if angle_mode == "diag_noeig":  # timing isolation: blur only
                out_ref[0, p_out] = (ta + tb + td).astype(jnp.int32)
                continue

            tr = ta + td
            det = ta * td - tb * tb
            disc = jnp.sqrt(jnp.maximum(tr * tr / 4.0 - det, 0.0))
            l1 = tr / 2.0 + disc
            no_sqrt = "_ns" in angle_mode
            l2 = None if no_sqrt else tr / 2.0 - disc

            # angle bucket via half-plane sign tests (see docstring)
            uu = l1 - td
            flip = tb < 0.0
            u2 = jnp.where(flip, -uu, uu)
            v2 = jnp.where(flip, -tb, tb)
            aidx = jnp.zeros_like(uu, dtype=jnp.int32)
            if angle_mode.startswith("ratio"):
                # one division turns each boundary test into a single
                # compare: theta >= a_k  <=>  u2/v2 < cot(a_k) on the
                # open upper half-plane (v2 > 0; sin(a_k) > 0 for all
                # interior boundaries). v2 == 0 collapses to the sign
                # of u2: +inf ratio -> bucket 0 (u2 > 0), -inf ->
                # NA-1 (u2 < 0), and the zero vector -> bucket 0 -
                # reproduced by substituting +/-inf for the ratio.
                # Cuts the angle stage from ~5 ops/boundary to 1; only
                # pixels within fp rounding of a boundary can differ
                # from the half-plane form (measured agreement
                # recorded in ROADMAP).
                r = jnp.where(
                    v2 > 0.0,
                    u2 / jnp.where(v2 > 0.0, v2, 1.0),
                    jnp.where(u2 < 0.0, -jnp.inf, jnp.inf),
                )
                for ck, sk in bounds:
                    aidx = aidx + (r < ck / sk).astype(jnp.int32)
            else:
                for ck, sk in bounds:
                    aidx = aidx + (v2 * ck - u2 * sk > 0.0).astype(jnp.int32)

            sidx = jnp.zeros_like(aidx)
            for q in squant:
                sidx = sidx + (l1 >= q).astype(jnp.int32)

            cidx = jnp.zeros_like(aidx)
            if no_sqrt:
                # sqrt-free coherence ('_ns' modes): squaring the test
                # (1-q)*sqrt(m1) >= (1+q)*sqrt(m2) with m = max(l, 0),
                # l1/2 = tr/2 +- disc gives (1-q)^2 m1 - (1+q)^2 m2 =
                # 2[(1+q^2) disc - q tr] whenever l2 >= 0, and when
                # l2 < 0 the original test is true and so is the new
                # one (tr < 2 disc => q tr < 2q disc <= (1+q^2) disc by
                # AM-GM) - so ONE fused compare replaces both
                # eigenvalue sqrts exactly (in real arithmetic; fp
                # rounding differs only at bucket boundaries, the same
                # contract as ratio_sym). nz = sq1 + sq2 != 0 <=>
                # l1 > 0 since l1 >= l2.
                nz = l1 > 0.0
                for q in cquant:
                    cidx = cidx + (
                        nz & ((1.0 + q * q) * disc >= q * tr)
                    ).astype(jnp.int32)
            else:
                sq1 = jnp.sqrt(jnp.maximum(l1, 0.0))
                sq2 = jnp.sqrt(jnp.maximum(l2, 0.0))
                nz = (sq1 + sq2) != 0.0
                for q in cquant:
                    # coherence >= q <=> (1-q) sq1 >= (1+q) sq2, denom > 0
                    cidx = cidx + (
                        nz & ((1.0 - q) * sq1 - (1.0 + q) * sq2 >= 0.0)
                    ).astype(jnp.int32)

            out_ref[0, p_out] = (
                aidx * (len(squant) + 1) + sidx
            ) * (len(cquant) + 1) + cidx

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "h2p", "angle_mode")
)
def hash_planes_pallas(
    planes, cfg, interpret: bool = False, h2p: int | None = None,
    angle_mode: str = "ratio_sym_roll_ns",
):
    """Bucket planes [B, s*s, h2p, w2p] int32 from upscale planes
    [B, s*s, >= h2p + HALO_ROWS, w2p + 128] f32 (origin-aligned; rows
    past h2p + HALO_ROWS - e.g. the Pallas upscale kernel's zero tail -
    are never read)."""
    nb = planes.shape[0]
    s = cfg.scale
    g = cfg.gauss_len // 2
    bh = -(-g // s)
    if h2p is None:
        h2p = planes.shape[2] - HALO_ROWS
    w2p = planes.shape[3] - 128
    wq = planes.shape[3]
    if _hash_tile_h(w2p, s) == 0:
        raise ValueError(
            f"no hash tile fits scoped vmem at scale {s}, plane width "
            f"{w2p}; use ops.raisr.hash_planes (the dispatcher does)"
        )
    mm = angle_mode.endswith("_mm") or angle_mode.endswith("_mmx")
    if mm and w2p % 128:
        raise ValueError(
            f"matmul-blur hash modes need a lane-multiple plane width, "
            f"got {w2p}"
        )
    kernel = _make_hash_kernel(cfg, w2p, wq, angle_mode)
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)]
    operands = [planes]
    if mm:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(_mm_tap_mats(cfg)))
    return pl.pallas_call(
        kernel,
        grid=(nb, h2p // _hash_tile_h(w2p, s)),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, s * s, _hash_tile_h(w2p, s), w2p),
            lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nb, s * s, h2p, w2p), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((s * s, _hash_tile_h(w2p, s) + HALO_ROWS, wq), jnp.float32),
            pltpu.VMEM(
                (3, s * s, _hash_tile_h(w2p, s) + 2 * bh, w2p + 2 * bh), jnp.float32
            ),
            pltpu.VMEM(
                (
                    3,
                    s * s,
                    _hash_tile_h(w2p, s),
                    # roll mode rotates whole vregs: lane-pad the width
                    -(-(w2p + 2 * bh) // 128) * 128
                    if "_roll" in angle_mode
                    else w2p + 2 * bh,
                ),
                jnp.float32,
            ),
            pltpu.SemaphoreType.DMA((s * s,)),
        ],
        interpret=interpret,
    )(*operands)


def _phase_wmats(filters: jnp.ndarray, cfg) -> list:
    """Per-pixel-type padded weight matrices [NB_PAD, 128] bf16."""
    fl = cfg.filter_len
    nb = cfg.num_angle * cfg.num_strength * cfg.num_coherence
    wall = filters.reshape(nb, cfg.num_pixel_type, fl * fl)
    mats = []
    for t in range(cfg.num_pixel_type):
        wmat = jnp.zeros((NB_PAD, 128), jnp.float32)
        wmat = wmat.at[:nb, : fl * fl].set(wall[:, t])
        mats.append(wmat.astype(jnp.bfloat16))
    return mats


def apply_filters_planes(
    planes: jnp.ndarray,
    bucket_planes: jnp.ndarray,
    filters: jnp.ndarray,
    cfg,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused filter select+apply, plane-space in and out.

    planes [(B,) s*s, h2+HALO_ROWS, w2+128] f32 (origin-aligned, see
    module docstring), bucket_planes [(B,) s*s, h2, w2] int32 (combined
    angle/strength/coherence index < 216, phase p = py*s + px),
    filters [num_filters, fl, fl]. Returns filtered phases
    [(B,) s*s, h2, w2] f32 - never materializing a full-res interleaved
    array (the round-1 wrapper's 16 MB pad+transpose glue). A batch dim
    rides the kernel grid: 4 launches per stack, not per image. The
    planes batch may be a CHANNEL-STACKED multiple of the bucket batch
    (color images hash once on luma; every channel's grid step reads the
    shared bucket block, raisr.cl:322-331's all-channel dispatch).
    """
    s = cfg.scale
    hp = plane_halo(cfg.filter_len, s, cfg.gauss_len)
    wmats = _phase_wmats(filters, cfg)
    squeeze = planes.ndim == 3
    if squeeze:
        planes = planes[None]
        bucket_planes = bucket_planes[None]
    outs = []
    for py in range(s):
        for px in range(s):
            t = py * s + px
            outs.append(
                _apply_phase(
                    planes, bucket_planes[:, t], wmats[t], cfg.filter_len, s,
                    py, px, hp, interpret,
                )
            )
    stacked = jnp.stack(outs, axis=1)  # [B, s*s, h2, w2]
    return stacked[0] if squeeze else stacked


def apply_filters_pallas(
    up_y: jnp.ndarray,
    bucket: jnp.ndarray,
    filters: jnp.ndarray,
    cfg,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused filter select+apply for a single INTERLEAVED luma plane.

    up_y [h, w] float32 (cheap-upscaled), bucket [h, w] int32, filters
    [num_filters, fl, fl]. Returns the filtered plane [h, w] float32.
    Deinterleaves into origin-aligned parity planes, then runs the
    plane-space kernel. The fully plane-native pipeline
    (ops/raisr.raisr_upsample on TPU) skips this wrapper - it is kept
    for interleaved inputs (the spatially-sharded path).
    """
    s = cfg.scale
    fl = cfg.filter_len
    hp = plane_halo(fl, s, cfg.gauss_len)
    h, w = up_y.shape
    h2, w2 = h // s, w // s

    # pad geometry: w2 to lanes, h2 to tiles (crop after)
    w2p = -(-w2 // 128) * 128
    h2p = -(-h2 // TILE_H) * TILE_H

    # origin-aligned planes: pad s*hp on top/left (edge), then to the
    # contracted [s*s, h2p + HALO_ROWS, w2p + 128] size.
    # parity-plane deinterleave via reshape+transpose: stride-s slices
    # relayout lane-by-lane (measured 11x slower than one transpose)
    hq, wq = h2p + HALO_ROWS, w2p + 128
    # edge-pad all four sides (bottom/right taps of valid out rows reach
    # up to fl//2 <= s*hp past the image), then zero-fill to size
    xp = jnp.pad(up_y.astype(jnp.float32), s * hp, mode="edge")
    xpz = jnp.pad(xp, ((0, s * hq - xp.shape[0]), (0, s * wq - xp.shape[1])))
    planes = xpz.reshape(hq, s, wq, s).transpose(1, 3, 0, 2).reshape(s * s, hq, wq)

    bz = jnp.pad(bucket, ((0, s * h2p - h), (0, s * w2p - w)))
    bucket_planes = (
        bz.reshape(h2p, s, w2p, s).transpose(1, 3, 0, 2).reshape(s * s, h2p, w2p)
    )

    stacked = apply_filters_planes(planes, bucket_planes, filters, cfg, interpret)
    # re-interleave: out[s*i+py, s*j+px] = stacked[py*s+px][i, j]
    out = (
        stacked.reshape(s, s, h2p, w2p)
        .transpose(2, 0, 3, 1)
        .reshape(s * h2p, s * w2p)
    )
    return out[:h, :w]
