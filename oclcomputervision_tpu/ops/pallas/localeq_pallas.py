"""Pallas TPU kernel for fused local-block (CLAHE-style) histeq apply.

The TPU analogue of hist.cl:104-147 (histeq_local_block): per pixel,
blend the 4 nearest block LUTs bilinearly. The XLA twin
(ops/histeq.apply_block_mappings) is correct but leaves ~6x on the
table: its nibble one-hots carry a 16-wide trailing axis that pads to
128 lanes (8x lane waste) and its 5-D einsum tiles poorly. Here each
(bh, bw) padded tile is processed in [8, 2048]-pixel chunks with the
histeq kernel's sublane-stack layout (s = 16*row + nibble, full lane
utilization):

  per chunk:
    hi1/lo1 one-hot stacks               [128, P] bf16 (VPU compares)
    per corner LUT c (constant per tile):
      Lbd_c = blockdiag(L_c 16x16 x 8)   built in-VMEM via pltpu.repeat
      inner_c = Lbd_int @ lo1 + Lbd_frac @ lo1   (MXU, f32 accumulate)
      val_c[r, p] = sum_h hi1[16r+h, p] * inner_c[16r+h, p]
    out = clip((1-s)(1-t) v00 + s(1-t) v01 + (1-s)t v10 + st v11)

The LUTs are float (fractional transfer values), so each is split into
an integer part and a fractional part quantized to 1/254 steps, both
shifted into int8 range: the MXU runs the 8 blockdiag contractions as
int8 x int8 -> int32 (2x the bf16 rate on v5e), exact for the integer
part (the -128/-127 shifts are undone by constant offsets - every
pixel's one-hot block sums to exactly 1) and <= 1/508 absolute error
for the fraction. The blended result differs from the fp32 XLA twin by
< 0.005, flipping the truncating uint8 cast only for values essentially
ON an integer boundary (test tolerance +-1, same as the XLA-vs-oracle
contract).

The bilinear ramps (hist.cl:129-136 semantics, as realized by the XLA
twin's half-block tiling) are rebuilt in-kernel from iota - no ramp
tables round-trip HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from oclcomputervision_tpu.ops.pallas.histeq_pallas import (
    TILE_LANES,
    TILE_P,
    TILE_ROWS,
    _onehot_stack,
)


def _make_kernel(bh: int, bw: int, ntx2: int):
    bh2, bw2 = bh // 2, bw // 2
    n_chunks = bh2 * bw2 // TILE_P

    def kernel(x_ref, l16_ref, out_ref):
        tfl = pl.program_id(1)  # flattened half-block tile
        k = pl.program_id(2)  # chunk within the tile
        hi1, lo1 = _onehot_stack(x_ref[0, 0, 0])
        hi1f = hi1.astype(jnp.float32)
        lo1_i8 = lo1.astype(jnp.int8)

        # pixel position within the (bh, bw) BLEND CELL: this half-block
        # tile is quadrant (i%2, j%2) of cell (i//2, j//2); in-tile
        # layout q = k*TILE_P + 2048*sublane + lane; r = q // bw2
        u = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 0)
        v = jax.lax.broadcasted_iota(jnp.int32, (TILE_ROWS, TILE_LANES), 1)
        q = k * TILE_P + u * TILE_LANES + v
        i, j = tfl // ntx2, tfl % ntx2
        t = ((i % 2) * bh2 + q // bw2).astype(jnp.float32) / float(bh)
        sc = ((j % 2) * bw2 + q % bw2).astype(jnp.float32) / float(bw)

        blkmask = (
            jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0) // 16
            == jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1) // 16
        ).astype(jnp.float32)

        vals = []
        for c in range(4):
            acc = None
            for part, scale in ((0, 1.0), (1, 1.0 / 254.0)):
                # int8-shifted LUT part (prepared by the wrapper), block-
                # diagonalized in f32 then cast (values fit int8 exactly)
                l16 = l16_ref[0, 0, 0, c, part]  # [16, 16] f32, int8 range
                lt = pltpu.repeat(pltpu.repeat(l16, 8, axis=0), 8, axis=1)
                lbd = (lt * blkmask).astype(jnp.int8)
                d = jax.lax.dot_general(
                    lbd,
                    lo1_i8,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                term = d.astype(jnp.float32) * scale
                acc = term if acc is None else acc + term
            # undo the int8 shifts: L = q0 + 128 + (q1 + 127)/254, and
            # each pixel's one-hot block sums to exactly 1
            inner = acc + (128.0 + 0.5)
            z = hi1f * inner  # [128, P]
            vals.append(jnp.sum(z.reshape(TILE_ROWS, 16, TILE_LANES), axis=1))
        v00, v01, v10, v11 = vals

        out = (
            (1.0 - sc) * (1.0 - t) * v00
            + sc * (1.0 - t) * v01
            + (1.0 - sc) * t * v10
            + sc * t * v11
        )
        out = jnp.clip(out, 0.0, 255.0)
        # Mosaic has no f32->u8 cast; int32 first (truncation, matching
        # the XLA twin's astype)
        out_ref[0, 0, 0] = out.astype(jnp.int32).astype(jnp.uint8)

    return kernel, n_chunks


@functools.partial(jax.jit, static_argnames=("bh", "bw", "ntx2", "interpret"))
def _blend_tiles(xt, l16, bh, bw, ntx2, interpret=False):
    """xt [B, T2, n_chunks, 8, 2048] u8 (half-block tiles, T2 = nty2*ntx2),
    l16 [B, nty, ntx, 4, 2, 16, 16] f32 -> same-shaped u8. Each
    half-block tile reads its blend cell's corner tables via the
    floor-div index map."""
    bsz, nt2 = xt.shape[:2]
    kernel, n_chunks = _make_kernel(bh, bw, ntx2)
    return pl.pallas_call(
        kernel,
        grid=(bsz, nt2, n_chunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, TILE_ROWS, TILE_LANES),
                lambda b, i, k: (b, i, k, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 1, 4, 2, 16, 16),
                lambda b, i, k: (b, (i // ntx2) // 2, (i % ntx2) // 2, 0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, 1, TILE_ROWS, TILE_LANES),
            lambda b, i, k: (b, i, k, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.uint8),
        interpret=interpret,
    )(xt, l16)


def apply_block_mappings_pallas(
    gray: jnp.ndarray,
    mappings: jnp.ndarray,
    blockshape,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas twin of ops.histeq.apply_block_mappings ([H, W] or
    [B, H, W] uint8; mappings [(B,) nby, nbx, 256] float32).

    Geometry contract: (bh/2) * (bw/2) % 16384 == 0 (whole [8, 2048]
    chunks per half-block tile); the dispatcher falls back to the XLA
    twin otherwise.
    """
    gray = jnp.asarray(gray)
    squeeze = gray.ndim == 2
    g3 = gray[None] if squeeze else gray
    m4 = jnp.asarray(mappings, jnp.float32)
    if squeeze:
        m4 = m4[None]
    bsz, h, w = g3.shape
    nby, nbx = m4.shape[1:3]
    bh, bw = blockshape
    bh2, bw2 = bh // 2, bw // 2
    assert (bh2 * bw2) % TILE_P == 0, (blockshape,)
    nty, ntx = nby + 1, nbx + 1

    # HALF-block tiling: corner LUTs are constant per half-block; tiling
    # at half-block granularity trims the padded overcompute from
    # (nby+1)(nbx+1)/(nby*nbx) to (2nby+1)(2nbx+1)/(4*nby*nbx)
    nty2, ntx2 = 2 * nby + 1, 2 * nbx + 1
    pad_top, pad_left = bh2, bw2
    g = jnp.pad(
        g3,
        (
            (0, 0),
            (pad_top, nty2 * bh2 - h - pad_top),
            (pad_left, ntx2 * bw2 - w - pad_left),
        ),
    )
    xt = (
        g.reshape(bsz, nty2, bh2, ntx2, bw2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(bsz, nty2 * ntx2, bh2 * bw2 // TILE_P, TILE_ROWS, TILE_LANES)
    )

    # edge-replicated corner LUT grid: P[k] = M[clip(k-1, 0, n-1)]
    py = jnp.clip(jnp.arange(nty + 1) - 1, 0, nby - 1)
    px = jnp.clip(jnp.arange(ntx + 1) - 1, 0, nbx - 1)
    pg = m4[:, py][:, :, px]  # [B, nty+1, ntx+1, 256]
    corners = jnp.stack(
        [
            pg[:, :-1, :-1],
            pg[:, :-1, 1:],
            pg[:, 1:, :-1],
            pg[:, 1:, 1:],
        ],
        axis=3,
    )  # [B, nty, ntx, 4, 256]
    # int8-shifted parts: L = (q0 + 128) + (q1 + 127)/254 with
    # q0 = floor(L) - 128 in [-128, 127], q1 = round(frac*254) - 127
    cint = jnp.floor(corners)
    q0 = cint - 128.0
    q1 = jnp.round((corners - cint) * 254.0) - 127.0
    l16 = jnp.stack([q0, q1], axis=4).reshape(bsz, nty, ntx, 4, 2, 16, 16)

    out_t = _blend_tiles(xt, l16, bh, bw, ntx2, interpret)
    out = (
        out_t.reshape(bsz, nty2, ntx2, bh2, bw2)
        .transpose(0, 1, 3, 2, 4)
        .reshape(bsz, nty2 * bh2, ntx2 * bw2)
    )
    out = out[:, pad_top : pad_top + h, pad_left : pad_left + w]
    return out[0] if squeeze else out
