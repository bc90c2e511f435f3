"""Pallas TPU kernel for the RAISR filter-select + apply stage.

The TPU rebuild of raisr.cl's stages 5-6 (hash -> per-pixel learned
filter). The XLA path (ops/raisr.apply_filters_fast) must materialize
the all-bucket response tensor r [N, 216] and the bucket one-hot in HBM
(~7 GB at 4 MP out); this kernel keeps both in VMEM per tile:

  per output row tile (one pixel-type phase at a time):
    DMA the 4 parity planes' row band (halo 5) into VMEM
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

Geometry contract (the wrapper pads): w2 % 128 == 0, h2 % TILE_H == 0,
planes are [4, h2 + HALO_ROWS, w2 + 128] fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 64  # output rows per grid step
HALO_ROWS = 8  # (filter_len // 2) // scale + filter extent, padded to 8
NB_PAD = 224  # 216 buckets padded to a sublane multiple


def _row_chunk(w2: int) -> int:
    """Rows per tap-matrix/matmul chunk: largest power of two (<= 16)
    whose [NB_PAD, rc*w2] f32 response fits in ~8MB of VMEM."""
    rc = 16
    while rc > 1 and NB_PAD * rc * w2 * 4 > 8 * 2**20:
        rc //= 2
    return rc


def _make_kernel(fl: int, s: int, py: int, px: int, w2: int):
    n_taps = fl * fl
    rc = _row_chunk(w2)

    # static per-tap plane + offset tables
    tap_plane = []
    tap_off = []
    for ti in range(fl):
        for tj in range(fl):
            a, roff = (py + ti) % s, (py + ti) // s
            b, coff = (px + tj) % s, (px + tj) // s
            tap_plane.append(a * s + b)
            tap_off.append((roff, coff))

    def kernel(bucket_ref, wmat_ref, planes_hbm, out_ref, buf, pm_buf, sems):
        i = pl.program_id(0)
        # DMA the 4 parity planes' row band (TILE_H + halo) into VMEM
        for p in range(s * s):
            dma = pltpu.make_async_copy(
                planes_hbm.at[p, pl.ds(i * TILE_H, TILE_H + HALO_ROWS), :],
                buf.at[p],
                sems.at[p],
            )
            dma.start()
        for p in range(s * s):
            pltpu.make_async_copy(
                planes_hbm.at[p, pl.ds(i * TILE_H, TILE_H + HALO_ROWS), :],
                buf.at[p],
                sems.at[p],
            ).wait()

        wmat = wmat_ref[:]  # [NB_PAD, 128] bf16
        nbit = jax.lax.broadcasted_iota(jnp.int32, (NB_PAD, 1), 0)

        # zero the tap-pad rows once (scratch is uninitialized; 0 * NaN
        # would poison the matmul even though wmat's pad columns are 0)
        for q in range(n_taps, 128):
            pm_buf[q] = jnp.zeros((rc, w2), jnp.bfloat16)

        # fully static unrolled: Mosaic rejects dynamic sublane indices
        # that are not provably 8-aligned (the +roff tap offsets aren't)
        for ci in range(TILE_H // rc):
            r0 = ci * rc
            # tap matrix: Pm[q, r, :] = plane[tap_plane[q]][r0+r+roff, coff:coff+w2]
            for q in range(n_taps):
                roff, coff = tap_off[q]
                pm_buf[q] = buf[
                    tap_plane[q], pl.ds(r0 + roff, rc), pl.ds(coff, w2)
                ].astype(jnp.bfloat16)

            resp = jax.lax.dot_general(
                wmat,
                pm_buf[:].reshape(128, rc * w2),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [NB_PAD, rc*w2]
            for r in range(rc):
                brow = bucket_ref[pl.ds(r0 + r, 1), :]  # [1, w2] int32
                oh = (brow == nbit).astype(jnp.float32)
                out_ref[pl.ds(r0 + r, 1), :] = jnp.sum(
                    oh * resp[:, r * w2 : (r + 1) * w2], axis=0, keepdims=True
                )

    return kernel


@functools.partial(jax.jit, static_argnames=("fl", "s", "py", "px", "interpret"))
def _apply_phase(planes, bucket_t, wmat, fl, s, py, px, interpret=False):
    """planes [s*s, h2+HALO, w2+128] f32, bucket_t [h2, w2] i32,
    wmat [NB_PAD, 128] bf16 -> out [h2, w2] f32."""
    h2, w2 = bucket_t.shape
    kernel = _make_kernel(fl, s, py, px, w2)
    return pl.pallas_call(
        kernel,
        grid=(h2 // TILE_H,),
        in_specs=[
            pl.BlockSpec((TILE_H, w2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wmat, whole
            pl.BlockSpec(memory_space=pltpu.ANY),  # planes stay in HBM
        ],
        out_specs=pl.BlockSpec((TILE_H, w2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h2, w2), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((s * s, TILE_H + HALO_ROWS, planes.shape[2]), jnp.float32),
            pltpu.VMEM((128, _row_chunk(w2), w2), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((s * s,)),
        ],
        interpret=interpret,
    )(bucket_t, wmat, planes)


def apply_filters_pallas(
    up_y: jnp.ndarray,
    bucket: jnp.ndarray,
    filters: jnp.ndarray,
    cfg,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused filter select+apply for a single luma plane.

    up_y [h, w] float32 (cheap-upscaled), bucket [h, w] int32 (combined
    angle/strength/coherence index < 216), filters [num_filters, fl, fl].
    Returns the filtered plane [h, w] float32.
    """
    s = cfg.scale
    fl = cfg.filter_len
    m = fl // 2
    nb = cfg.num_angle * cfg.num_strength * cfg.num_coherence
    h, w = up_y.shape
    h2, w2 = h // s, w // s

    # pad geometry: w2 to lanes, h2 to tiles (crop after)
    w2p = -(-w2 // 128) * 128
    h2p = -(-h2 // TILE_H) * TILE_H

    xp = jnp.pad(up_y.astype(jnp.float32), ((m, m), (m, m)), mode="edge")
    # parity-plane deinterleave via reshape+transpose: stride-s slices
    # relayout lane-by-lane (measured 11x slower than one transpose)
    hq, wq = h2p + HALO_ROWS, w2p + 128
    xpz = jnp.pad(
        xp, ((0, s * hq - xp.shape[0]), (0, s * wq - xp.shape[1]))
    )
    planes = (
        xpz.reshape(hq, s, wq, s).transpose(1, 3, 0, 2).reshape(s * s, hq, wq)
    )

    bz = jnp.pad(bucket, ((0, s * h2p - h), (0, s * w2p - w)))
    bdeint = bz.reshape(h2p, s, w2p, s).transpose(1, 3, 0, 2)

    wall = filters.reshape(nb, cfg.num_pixel_type, fl * fl)
    out_phases = []
    for py in range(s):
        row = []
        for px in range(s):
            t = py * s + px
            wmat = jnp.zeros((NB_PAD, 128), jnp.float32)
            wmat = wmat.at[:nb, : fl * fl].set(wall[:, t])
            b_t = bdeint[py, px]
            o = _apply_phase(
                planes, b_t, wmat.astype(jnp.bfloat16), fl, s, py, px, interpret
            )
            row.append(o[:h2, :w2])
        out_phases.append(row)
    stacked = jnp.stack([jnp.stack(r) for r in out_phases])  # [s, s, h2, w2]
    return stacked.transpose(2, 0, 3, 1).reshape(h, w)
