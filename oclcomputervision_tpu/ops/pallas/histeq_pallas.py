"""Pallas TPU kernels for fused global histogram equalization.

The TPU analogue of hist.cl:41-90 + 92-102, rebuilt around the MXU:
there is no LDS scatter-add on TPU, so histograms and LUT gathers are
reformulated as nibble (4-bit) one-hot contractions.

Kernel layout trick: a pixel tile lives in VMEM as [8, P] (sublanes x
lanes). Each of the 8 sublane rows is replicated 16x into a [128, P]
"one-hot stack" whose sublane index s = 16 r + h encodes (pixel row r,
nibble value h):

    hi1[s, p] = (x[s // 16, p] >> 4 == s % 16)

so building BOTH nibble one-hots costs 32 VPU row-compares per pixel at
full sublane utilization, and the 256-way work rides the MXU:

- histogram: M = hi1 @ lo1^T ([128, P] @ [P, 128]); the per-row 16x16
  products sit on M's block diagonal, extracted and summed by XLA
  afterwards: hist[16 h + l] = sum_r M[16 r + h, 16 r + l].
- LUT apply: inner = blockdiag(L, 8) @ lo1 ([128, 128] @ [128, P]),
  out[r, p] = sum_h hi1[16 r + h, p] * inner[16 r + h, p].

Both are exact: 0/1 products times bf16-representable integers,
accumulated in fp32. Interpret-mode tests keep them CPU-runnable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_ROWS = 8  # sublane rows per tile
TILE_LANES = 2048  # lanes per tile
TILE_P = TILE_ROWS * TILE_LANES  # pixels per grid step


def _onehot_stack(x_tile):
    """[8, P] uint8 -> (hi1, lo1) each [128, P] bf16, s = 16*r + h."""
    x = x_tile.astype(jnp.int32)
    x_rep = jnp.broadcast_to(x[:, None, :], (TILE_ROWS, 16, x.shape[1])).reshape(
        128, x.shape[1]
    )
    nib = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) % 16
    hi1 = ((x_rep >> 4) == nib).astype(jnp.bfloat16)
    lo1 = ((x_rep & 15) == nib).astype(jnp.bfloat16)
    return hi1, lo1


def _hist_kernel(x_ref, out_ref):
    c = pl.program_id(1)
    hi1, lo1 = _onehot_stack(x_ref[0, 0])
    m = jax.lax.dot_general(
        hi1,
        lo1,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(c == 0)
    def _():
        out_ref[0] = m

    @pl.when(c != 0)
    def _():
        out_ref[0] += m


@functools.partial(jax.jit, static_argnames=("interpret",))
def hist256_pallas(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Histograms of uint8 rows: [B, N] -> [B, 256] float32 (N % TILE_P == 0)."""
    b, n = x.shape
    assert n % TILE_P == 0, (n, TILE_P)
    xt = x.reshape(b, n // TILE_P, TILE_ROWS, TILE_LANES)
    m = pl.pallas_call(
        _hist_kernel,
        grid=(b, n // TILE_P),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TILE_ROWS, TILE_LANES),
                lambda i, c: (i, c, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, 128, 128), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, 128, 128), jnp.float32),
        interpret=interpret,
    )(xt)
    # sum the 16x16 blocks on M's block diagonal: hist[h,l] = sum_r M4[r,h,r,l]
    m4 = m.reshape(b, 8, 16, 8, 16)
    hist = jnp.einsum("brhrl->bhl", m4)
    return hist.reshape(b, 256)


def _apply_kernel(x_ref, lbd_ref, out_ref):
    hi1, lo1 = _onehot_stack(x_ref[0, 0])
    inner = jax.lax.dot_general(
        lbd_ref[0].astype(jnp.bfloat16),
        lo1,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    z = hi1.astype(jnp.float32) * inner  # [128, P]
    out = jnp.sum(z.reshape(TILE_ROWS, 16, -1), axis=1)
    # Mosaic has no f32->u8 cast; go through int32
    out_ref[0, 0] = out.astype(jnp.int32).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("interpret",))
def apply_lut_pallas(
    x: jnp.ndarray, luts: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Row-wise LUT apply: x [B, N] uint8, luts [B, 256] uint8 -> [B, N]."""
    b, n = x.shape
    assert n % TILE_P == 0, (n, TILE_P)
    xt = x.reshape(b, n // TILE_P, TILE_ROWS, TILE_LANES)
    # block-diagonal LUT: Lbd[16r+h, 16r+l] = lut[16h+l]
    l16 = luts.reshape(b, 16, 16).astype(jnp.float32)
    eye8 = jnp.eye(8, dtype=jnp.float32)
    lbd = jnp.einsum("rs,bhl->brhsl", eye8, l16).reshape(b, 128, 128)
    out = pl.pallas_call(
        _apply_kernel,
        grid=(b, n // TILE_P),
        in_specs=[
            pl.BlockSpec(
                (1, 1, TILE_ROWS, TILE_LANES),
                lambda i, c: (i, c, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 128, 128), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, TILE_ROWS, TILE_LANES),
            lambda i, c: (i, c, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.uint8),
        interpret=interpret,
    )(xt, lbd)
    return out.reshape(b, n)


def histeq_global_pallas(
    gray: jnp.ndarray,
    alpha: float = 1.0,
    punch: float = 0.05,
    clip: float = 2.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused global histeq via the Pallas kernels; [H, W] or [B, H, W].

    Any image size: images whose pixel count is not a TILE_P multiple
    are zero-padded for the tiled kernels; the histogram is exact
    because the pad count is subtracted back out of bin 0 (integer
    counts - no rounding), and the LUT-applied pad pixels are cropped.
    Bit-identical to ops.histeq.histeq_global, the XLA twin.
    """
    from oclcomputervision_tpu.ops.histeq import calc_transfer_func

    gray = jnp.asarray(gray)
    squeeze = gray.ndim == 2
    g3 = gray[None] if squeeze else gray
    b = g3.shape[0]
    flat = g3.reshape(b, -1)
    n = flat.shape[1]
    pad = (-n) % TILE_P
    if pad:
        flat = jnp.pad(flat, ((0, 0), (0, pad)))
    hist = hist256_pallas(flat, interpret=interpret)
    if pad:
        hist = hist.at[:, 0].add(-float(pad))
    luts = calc_transfer_func(hist, alpha, punch, clip).astype(jnp.uint8)
    out = apply_lut_pallas(flat, luts, interpret=interpret)[:, :n].reshape(g3.shape)
    return out[0] if squeeze else out
