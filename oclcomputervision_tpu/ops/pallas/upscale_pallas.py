"""Pallas TPU kernel for the plane-native cheap upscale.

The XLA ``ops.raisr.upscale_planes`` twin is a 2-tap variable-weight
shift stencil, but XLA materializes every pad and shifted slice-FMA as
a full-array HBM round trip (~30 passes, measured 1.9 ms/img at 4 MP
out - more than the hash kernel). Here the whole stencil runs
VMEM-resident: one f32 LR band in, all s*s parity-plane tiles out, so
the only HBM traffic is the LR read and the plane write.

Weights and offsets come from the same ``_phase_stencil_taps`` tables
as the XLA twin, applied in the same sorted-offset order with the same
f32 multiply/add expressions. Backends are free to contract each
multiply-add pair into an FMA (XLA:CPU does, the Pallas interpreter
does not), so plane rows [0, hq) match ``upscale_planes`` to <= 1 f32
ULP rather than bit-for-bit - invisible after the bf16 tap cast in the
apply kernel and worth at most a boundary flip on hash buckets (tests
assert the 1-ULP bound and end-to-end uint8 tolerance).

Geometry contract (shared with raisr_pallas): planes are origin-aligned
at (hp, hp): ``planes[a*s+b][hp+i, hp+j] = up_e(s*i+a, s*j+b)`` with
edge-replicated out-of-image reads. The output row count is padded up
to a tile multiple; consumers take ``h2p`` explicitly and never read
the zero tail rows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _tile_u(s: int) -> int:
    """Plane rows per grid step; the [s*s, tile, wq] out block must fit
    VMEM comfortably alongside the band scratch."""
    return {2: 64, 3: 32}.get(s, 16)


def _axis_tables(n_in: int, s: int, org: int, n_out: int):
    """Per-phase stencil tables for one axis, rebased to a shared
    clamped-source array.

    Returns (dmin, dmax, offsets, weights): ``offsets[a]`` is the sorted
    tuple of tap offsets for phase ``a`` and ``weights[a]`` the matching
    weight vectors [n_out]; output j at offset d reads source index
    j + d of the virtual edge-clamped input (d in [dmin, dmax]).
    """
    from oclcomputervision_tpu.ops.raisr import _phase_stencil_taps

    offsets, weights = [], []
    for a in range(s):
        _pad_lo, _pad_hi, offs = _phase_stencil_taps(n_in, s, a, org, n_out)
        items = sorted(offs.items())
        offsets.append(tuple(d for d, _ in items))
        weights.append([w for _, w in items])
    dmin = min(d for ph in offsets for d in ph)
    dmax = max(d for ph in offsets for d in ph)
    return dmin, dmax, offsets, weights


def _make_upscale_kernel(s, row_offs, col_offs, rdmin, cdmin, wq, bh, tu):
    ndr = max(len(ph) for ph in row_offs)
    ndc = max(len(ph) for ph in col_offs)

    def kernel(wr_ref, wc_ref, xpad_hbm, out_ref, buf, sem):
        bi = pl.program_id(0)
        i = pl.program_id(1)
        pltpu.make_async_copy(
            xpad_hbm.at[bi, pl.ds(i * tu, bh), :], buf, sem
        ).start()
        pltpu.make_async_copy(
            xpad_hbm.at[bi, pl.ds(i * tu, bh), :], buf, sem
        ).wait()
        for a in range(s):
            # vertical pass: per-row scalar weights (sublane broadcast),
            # same sorted-offset accumulation order as the XLA twin
            v = None
            for di, d in enumerate(row_offs[a]):
                r0 = d - rdmin
                t = wr_ref[:, a * ndr + di : a * ndr + di + 1] * buf[
                    r0 : r0 + tu, :
                ]
                v = t if v is None else v + t
            for b in range(s):
                # horizontal pass: per-lane weight vectors
                o = None
                for dj, d in enumerate(col_offs[b]):
                    c0 = d - cdmin
                    t = wc_ref[b * ndc + dj : b * ndc + dj + 1, :] * v[
                        :, c0 : c0 + wq
                    ]
                    o = t if o is None else o + t
                out_ref[0, a * s + b] = o

    return kernel


@functools.partial(jax.jit, static_argnames=("s", "meta", "interpret"))
def _upscale_call(wr, wc, xpad, s, meta, interpret):
    row_offs, col_offs, rdmin, cdmin, wq, bh, hq_pad, tu = meta
    nimg = xpad.shape[0]
    kernel = _make_upscale_kernel(
        s, row_offs, col_offs, rdmin, cdmin, wq, bh, tu
    )
    return pl.pallas_call(
        kernel,
        grid=(nimg, hq_pad // tu),
        in_specs=[
            pl.BlockSpec(
                (tu, wr.shape[1]), lambda b, i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, s * s, tu, wq), lambda b, i: (b, 0, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((nimg, s * s, hq_pad, wq), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((bh, xpad.shape[2]), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(wr, wc, xpad)


@functools.lru_cache(maxsize=32)
def _upscale_prep(h, w, s, hp, hq, wq):
    """Static weight tables + geometry for one (shape, cfg) pair."""
    tu = _tile_u(s)
    hq_pad = -(-hq // tu) * tu
    rdmin, rdmax, row_offs, row_w = _axis_tables(h, s, hp, hq)
    cdmin, cdmax, col_offs, col_w = _axis_tables(w, s, hp, wq)
    ndr = max(len(ph) for ph in row_offs)
    ndc = max(len(ph) for ph in col_offs)

    # per-plane-row weights [hq_pad, ndr*s] (zero tail rows), lane-padded
    wr = np.zeros((hq_pad, max(128, ndr * s)), np.float32)
    for a in range(s):
        for di, wv in enumerate(row_w[a]):
            wr[: len(wv), a * ndr + di] = wv
    # per-plane-col weights [ndc*s (sublane-padded), wq]
    wc = np.zeros((-(-(ndc * s) // 8) * 8, wq), np.float32)
    for b in range(s):
        for dj, wv in enumerate(col_w[b]):
            wc[b * ndc + dj, : len(wv)] = wv[:wq]

    # sublane-align the DMA'd band height (Mosaic requires 8-row slices)
    bh = -(-(tu + rdmax - rdmin) // 8) * 8
    rows_need = hq_pad - tu + bh
    cols_need = wq + cdmax - cdmin
    cols_pad = -(-cols_need // 128) * 128
    meta = (
        tuple(row_offs), tuple(col_offs), rdmin, cdmin, wq, bh, hq_pad, tu,
    )
    return rdmin, cdmin, rows_need, cols_pad, wr, wc, meta


def upscale_planes_pallas(
    x01: jnp.ndarray,
    cfg,
    hq: int,
    wq: int,
    hp: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Cheap-upscale [B, h, w] f32 into parity planes [B, s*s, hq_pad, wq].

    Rows [0, hq) match ``upscale_planes`` to <= 1 f32 ULP (see module
    docstring); rows [hq, hq_pad) are zero. The batch rides the kernel
    grid (one launch per stack).
    """
    s = cfg.scale
    bsz, h, w = x01.shape
    rdmin, cdmin, rows_need, cols_pad, wr, wc, meta = _upscale_prep(
        h, w, s, hp, hq, wq
    )

    def clamp_pad(x, lo, total, axis):
        # virtual index k reads source k + lo with edge clamp: top pad
        # max(0, -lo) rows / slice max(0, lo), then edge-pad the tail
        pads = [(0, 0)] * x.ndim
        pads[axis] = (max(0, -lo), 0)
        x = jnp.pad(x, pads, mode="edge")
        if lo > 0:
            x = jax.lax.slice_in_dim(x, lo, x.shape[axis], axis=axis)
        tail = total - x.shape[axis]
        pads[axis] = (0, tail)
        return jnp.pad(x, pads, mode="edge") if tail > 0 else x

    xe = clamp_pad(x01, rdmin, rows_need, 1)
    xe = clamp_pad(xe, cdmin, cols_pad, 2)
    return _upscale_call(jnp.asarray(wr), jnp.asarray(wc), xe, s, meta, interpret)
