"""TPU-native Gaussian pyramid.

cv2.pyrDown (the reference's only pyramid primitive, pyramid/pyramid.py:12)
is a 5x5 binomial blur + 2x decimation. Here it is one strided
lax.conv_general_dilated with REFLECT-101 edges - a conv the MXU eats,
trivially batched over [B, H, W, C] stacks.
"""

from __future__ import annotations

import functools
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

_K1D = np.array([1.0, 4.0, 6.0, 4.0, 1.0], dtype=np.float32) / 16.0
_K2D = np.outer(_K1D, _K1D)  # separable binomial, same as cv2.pyrDown


@functools.partial(jax.jit, static_argnames=("scale",))
def _pyr_down_f32(img: jnp.ndarray, scale: int) -> jnp.ndarray:
    """One level: [H, W, C] float32 -> [H//scale, W//scale, C]."""
    h, w, c = img.shape
    # reflect-101 padding (cv2's default border for pyrDown)
    x = jnp.pad(img, ((2, 2), (2, 2), (0, 0)), mode="reflect")
    x = x[None]  # NHWC
    kern = jnp.asarray(_K2D)[:, :, None, None] * jnp.eye(c, dtype=jnp.float32)[None, None]
    out = jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(scale, scale),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0]
    return out[: h // scale, : w // scale]


def pyr_down(img: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """Blur + decimate one level; uint8 in -> uint8 out (round-to-nearest)."""
    img = jnp.asarray(img)
    squeeze = img.ndim == 2
    x = img[..., None] if squeeze else img
    is_int = jnp.issubdtype(img.dtype, jnp.integer)
    out = _pyr_down_f32(x.astype(jnp.float32), scale)
    if is_int:
        out = jnp.clip(jnp.round(out), 0, 255).astype(img.dtype)
    else:
        out = out.astype(img.dtype)
    return out[..., 0] if squeeze else out


def gaussian_pyramid(img: jnp.ndarray, scale: int = 2, depth: int = 3) -> List[jnp.ndarray]:
    """List of ``depth`` levels, index 0 = COARSEST (pyramid.py:9-14)."""
    pyramid = [jnp.asarray(img)]
    src = pyramid[0]
    for _ in range(depth - 1):
        src = pyr_down(src, scale)
        pyramid.insert(0, src)
    return pyramid
