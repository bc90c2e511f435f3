"""TPU-native align-corners bilinear/bicubic interpolation.

Separable resize: out = Wy @ img @ Wx^T, realized as two static-index
row-gather + weighted-sum passes. Because output/input sizes are static
under jit, the tap indices and weights are compile-time constants - XLA
lowers the gathers to contiguous row copies and fuses the tap blend, so
there is no dynamic gather on the hot path (the lane-hostile pattern on
TPU). Semantics match the reference's explicit LDS kernels
(basic/interpolation.cl:17-70, 132-211): align-corners mapping,
clamp-to-edge, Catmull-Rom a=-0.5 (cubic_matrix, interpolation.cl:73-78),
bicubic output clamped to the valid range (interpolation.cl:128).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from oclcomputervision_tpu.oracle.interpolation import axis_weights


def _resize_plane(img: jnp.ndarray, out_hw: Tuple[int, int], method: str) -> jnp.ndarray:
    """Resize float [H, W, C] -> [h_out, w_out, C]; taps are constants."""
    h_in, w_in = img.shape[:2]
    h_out, w_out = out_hw

    yidx_np, yw_np = axis_weights(h_out, h_in, method, dtype=np.float32)
    xidx_np, xw_np = axis_weights(w_out, w_in, method, dtype=np.float32)
    n_tap = yw_np.shape[1]

    out = jnp.zeros((h_out, w_in) + img.shape[2:], img.dtype)
    for k in range(n_tap):
        out = out + jnp.asarray(yw_np[:, k])[:, None, None] * img[jnp.asarray(yidx_np[:, k])]

    out2 = jnp.zeros((h_out, w_out) + img.shape[2:], img.dtype)
    for k in range(n_tap):
        out2 = out2 + jnp.asarray(xw_np[:, k])[None, :, None] * out[:, jnp.asarray(xidx_np[:, k])]
    return out2


@functools.partial(jax.jit, static_argnames=("out_hw", "method", "clamp_hi"))
def _resize_f32(img, out_hw, method, clamp_hi):
    out = _resize_plane(img, out_hw, method)
    if method == "bicubic":
        out = jnp.clip(out, 0.0, clamp_hi)
    return out


def resize(
    img: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bilinear"
) -> jnp.ndarray:
    """Align-corners resize of [H, W], [H, W, C], or [B, H, W, C] to out_hw.

    Float output in the input's value range ([0, 255] for uint8 input).
    """
    img = jnp.asarray(img)
    clamp_hi = 255.0 if jnp.issubdtype(img.dtype, jnp.integer) else 1.0
    out_hw = tuple(int(v) for v in out_hw)

    if img.ndim == 2:
        x = img.astype(jnp.float32)[..., None]
        return _resize_f32(x, out_hw, method, clamp_hi)[..., 0]
    if img.ndim == 3:
        return _resize_f32(img.astype(jnp.float32), out_hw, method, clamp_hi)
    if img.ndim == 4:
        return jax.vmap(lambda x: _resize_f32(x, out_hw, method, clamp_hi))(
            img.astype(jnp.float32)
        )
    raise ValueError(f"unsupported rank {img.ndim}")


def resize_uint8(
    img: jnp.ndarray, out_hw: Tuple[int, int], method: str = "bilinear"
) -> jnp.ndarray:
    """uint8-in/uint8-out resize with round-to-nearest quantization."""
    out = resize(img, out_hw, method)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def bilinear(img, out_hw):
    """Reference-named alias (basic/interpolation.py:37)."""
    return resize_uint8(img, out_hw, "bilinear")


def bicubic(img, out_hw):
    """Reference-named alias (basic/interpolation.py:55)."""
    return resize_uint8(img, out_hw, "bicubic")
