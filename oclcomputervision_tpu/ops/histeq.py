"""TPU-native histogram equalization (global + local-block).

Replaces the reference's three-dispatch device->host->device pipeline
(histeq/eq_opencl.py histGrid -> CPU calc_transfer_func -> histeqGlobal,
SURVEY.md §3.1) with ONE jitted function per op: tiled histogram ->
transfer-function LUT -> LUT gather, all resident on device.

TPU design notes:
- Histograms have no LDS scatter-add analogue on TPU (hist.cl:69-75's
  per-thread LDS histogram). We build them as one-hot compare + reduce,
  which XLA fuses into a VPU compare/accumulate sweep; the Pallas kernel
  (ops/pallas/hist_kernel.py) tiles the same formulation through VMEM
  and feeds the MXU with a one-hot matmul.
- The transfer function (eq_global.py:10-37 semantics) is 256-wide
  vector math, computed in float32 natively batched over blocks - the
  fusion the reference left as a TODO (eq_local_block.py:20).
- LUT application is a 256-entry gather; the local-block variant blends
  the 4 nearest block LUTs bilinearly (hist.cl:104-147 semantics).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp


def histogram256(x: jnp.ndarray, dtype=jnp.int32) -> jnp.ndarray:
    """Histogram of uint8 values along the last axis: [..., N] -> [..., 256].

    One-hot compare + reduce; XLA fuses this without materializing the
    [..., N, 256] one-hot in HBM.
    """
    bins = jnp.arange(256, dtype=jnp.uint8)
    eq = x[..., None] == bins
    return jnp.sum(eq, axis=-2, dtype=dtype)


def hist_grid(gray: jnp.ndarray, tile: Tuple[int, int] = (32, 256)) -> jnp.ndarray:
    """Per-tile histogram grid [H//th, W//tw, 256] (hist.cl:41-90 layout).

    Tile defaults to the reference's workgroup coverage (32 rows x 256
    cols, eq_opencl.py:43-44); unlike the reference, any tile shape that
    divides the image is accepted.
    """
    th, tw = tile
    h, w = gray.shape
    if h % th or w % tw:
        raise ValueError(f"image {gray.shape} not divisible by tile {tile}")
    gh, gw = h // th, w // tw
    tiles = gray.reshape(gh, th, gw, tw).transpose(0, 2, 1, 3).reshape(gh, gw, th * tw)
    return histogram256(tiles)


def calc_transfer_func(
    hist: jnp.ndarray, alpha: float, punch: float, clip: float
) -> jnp.ndarray:
    """256-entry float32 transfer LUT(s); batched over leading dims.

    Vectorized equivalent of eq_global.py:10-37: CDF -> punch requantize
    -> alpha-blend with identity -> clip [0,255] -> gain limit
    [I/clip, I*clip]. hist: [..., 256] -> LUT: [..., 256].
    """
    hist = hist.astype(jnp.float32)
    n = hist.shape[-1]
    idx = jnp.arange(n, dtype=jnp.float32)

    cdf = jnp.cumsum(hist, axis=-1) / jnp.sum(hist, axis=-1, keepdims=True)

    dark = jnp.argmax(cdf >= punch, axis=-1)[..., None].astype(jnp.float32)
    bright = jnp.argmax(cdf >= 1.0 - punch, axis=-1)[..., None].astype(jnp.float32)

    in_punch = (idx >= dark) & (idx < bright)
    hp = jnp.where(in_punch, hist, 0.0)
    cdf_punched = jnp.cumsum(hp, axis=-1) / jnp.sum(hp, axis=-1, keepdims=True)
    cdf = jnp.where(idx < dark, 0.0, jnp.where(idx >= bright, 1.0, cdf_punched))

    mapping = alpha * cdf * 255.0 + (1.0 - alpha) * idx
    mapping = jnp.clip(mapping, 0.0, 255.0)
    mapping = jnp.clip(mapping, idx / clip, idx * clip)
    return mapping


def apply_lut(gray: jnp.ndarray, lut: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel LUT apply: out[p] = lut[gray[p]] (hist.cl:92-102).

    Per-pixel gathers are lane-hostile on the TPU VPU (~8x slower than
    this, measured); instead build the one-hot compare against the 256
    bins and contract it with the LUT. Exact: uint8 LUT values are
    integers <= 255, representable in bfloat16, and each row has exactly
    one nonzero product.
    """
    bins = jnp.arange(256, dtype=jnp.uint8)
    eq = (gray[..., None] == bins).astype(jnp.bfloat16)
    out = jnp.einsum(
        "...b,b->...", eq, lut.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return out.astype(lut.dtype)


@functools.partial(jax.jit, static_argnames=("alpha", "punch", "clip"))
def _histeq_global_2d(gray, alpha, punch, clip):
    hist = histogram256(gray.reshape(-1))
    lut = calc_transfer_func(hist, alpha, punch, clip).astype(jnp.uint8)
    return apply_lut(gray, lut)


def histeq_global(
    gray: jnp.ndarray, alpha: float = 1.0, punch: float = 0.05, clip: float = 2.0
) -> jnp.ndarray:
    """Global histogram equalization of uint8 [H, W] or [B, H, W].

    Single fused jitted op (vs the reference's 2 device dispatches + CPU
    stage, eq_global.py:39-62). Defaults match eq_global.py:39.
    """
    gray = jnp.asarray(gray)
    if gray.ndim == 3:
        return jax.vmap(lambda g: _histeq_global_2d(g, alpha, punch, clip))(gray)
    return _histeq_global_2d(gray, alpha, punch, clip)


def block_mappings(
    gray: jnp.ndarray,
    alpha: float,
    punch: float,
    clip: float,
    blockshape: Tuple[int, int],
) -> jnp.ndarray:
    """Per-block transfer LUTs [nby, nbx, 256], built entirely on device.

    Fuses what the reference did in a Python double loop on host
    (eq_local_block.py:22-27) into one batched calc_transfer_func.
    """
    grid = hist_grid(gray, tile=blockshape)
    return calc_transfer_func(grid, alpha, punch, clip)


def apply_block_mappings(
    gray: jnp.ndarray, mappings: jnp.ndarray, blockshape: Tuple[int, int]
) -> jnp.ndarray:
    """Bilinear blend of the 4 nearest block LUTs (hist.cl:104-147).

    Trunc-toward-zero block indexing from block centers, s/t clamped to
    [0, 1], edge blocks clamped, float32 blend, truncating uint8 cast.
    """
    nby, nbx = mappings.shape[:2]
    block_h, block_w = blockshape
    h, w = gray.shape

    ix = jnp.arange(w, dtype=jnp.int32)
    iy = jnp.arange(h, dtype=jnp.int32)
    b00x_idx = jnp.trunc((ix - block_w // 2) / block_w).astype(jnp.int32)
    b00y_idx = jnp.trunc((iy - block_h // 2) / block_h).astype(jnp.int32)
    b00x = b00x_idx * block_w + block_w // 2
    b00y = b00y_idx * block_h + block_h // 2
    b01x_idx = jnp.minimum(b00x_idx + 1, nbx - 1)
    b10y_idx = jnp.minimum(b00y_idx + 1, nby - 1)

    s = jnp.clip((ix - b00x).astype(jnp.float32) / block_w, 0.0, 1.0)
    t = jnp.clip((iy - b00y).astype(jnp.float32) / block_h, 0.0, 1.0)

    # Gather-free formulation: the one-hot of the pixel value contracts
    # with ALL block LUTs at once on the MXU (vals[p, k] = LUT_k(v_p) is
    # exact - one nonzero per one-hot row), then the 4-LUT bilinear
    # blend factorizes into separable per-axis block weights:
    #   out = sum_{ky, kx} wy[y, ky] * wx[x, kx] * vals[y, x, ky, kx].
    bins = jnp.arange(256, dtype=jnp.uint8)
    eq = (gray[..., None] == bins).astype(jnp.bfloat16)
    vals = jnp.einsum(
        "hwb,kb->hwk",
        eq,
        mappings.reshape(nby * nbx, 256).astype(jnp.float32),
        preferred_element_type=jnp.float32,
    ).reshape(h, w, nby, nbx)

    def axis_onehot(idx, n):
        return (idx[:, None] == jnp.arange(n)[None, :]).astype(jnp.float32)

    wy = (1 - t)[:, None] * axis_onehot(b00y_idx, nby) + t[:, None] * axis_onehot(
        b10y_idx, nby
    )
    wx = (1 - s)[:, None] * axis_onehot(b00x_idx, nbx) + s[:, None] * axis_onehot(
        b01x_idx, nbx
    )
    out = jnp.einsum("hwyx,hy,wx->hw", vals, wy, wx)
    return jnp.clip(out, 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("alpha", "punch", "clip", "blockshape"))
def _histeq_local_2d(gray, alpha, punch, clip, blockshape):
    mappings = block_mappings(gray, alpha, punch, clip, blockshape)
    return apply_block_mappings(gray, mappings, blockshape)


def histeq_local_block(
    gray: jnp.ndarray,
    alpha: float = 0.5,
    punch: float = 0.05,
    clip: float = 3.0,
    blockshape: Tuple[int, int] = (256, 256),
) -> jnp.ndarray:
    """Local-block (CLAHE-style) histeq of uint8 [H, W] or [B, H, W].

    One fused jitted op: per-block histograms -> batched transfer LUTs ->
    bilinear 4-LUT blend (the on-chip pipeline the reference TODO'd at
    eq_local_block.py:20). Defaults match eq_local_block.py:10. Unlike
    the reference GPU path (hardcoded to 256x256 blocks via the 8-cell
    aggregation, eq_local_block.py:24-26), any block shape dividing the
    image works.
    """
    gray = jnp.asarray(gray)
    bs = tuple(blockshape)
    if gray.ndim == 3:
        return jax.vmap(lambda g: _histeq_local_2d(g, alpha, punch, clip, bs))(gray)
    return _histeq_local_2d(gray, alpha, punch, clip, bs)
