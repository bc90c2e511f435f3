"""NumPy oracle for align-corners bilinear/bicubic interpolation.

Matches the reference's well-defined LDS kernel variants
(basic/interpolation.cl:17-70 bilinear_lds, :132-211 bicubic_lds):
- align-corners coordinate mapping: src_x = out_x/(Wout-1)*(Win-1)
  (interpolation.cl:58,92)
- clamp-to-edge addressing
- bicubic = 4x4 Catmull-Rom with a=-0.5 basis (cubic_matrix,
  interpolation.cl:73-78), output clamped to the valid range
  (interpolation.cl:128,209).

(The reference's bilinear_simple uses the HW sampler's half-texel offset
and is NOT bit-identical to bilinear_lds — SURVEY.md fidelity note 11;
we standardize on the explicit align-corners math, which is also what
the reference's own PSNR harness treats as ground truth.)
"""

from __future__ import annotations

import numpy as np


def _axis_weights_linear(n_out: int, n_in: int, dtype=np.float64):
    """Align-corners linear taps: returns (idx [n_out, 2], w [n_out, 2])."""
    if n_out == 1:
        x = np.zeros(1, dtype=dtype)
    else:
        x = np.arange(n_out, dtype=dtype) / (n_out - 1) * (n_in - 1)
    x0 = np.floor(x)
    u = (x - x0).astype(dtype)
    i0 = x0.astype(np.int64)
    idx = np.stack([i0, np.clip(i0 + 1, 0, n_in - 1)], axis=1)
    idx = np.clip(idx, 0, n_in - 1)
    w = np.stack([1 - u, u], axis=1)
    return idx, w


def cubic_weights(u: np.ndarray, dtype=np.float64) -> np.ndarray:
    """Catmull-Rom (a=-0.5) weights for taps at offsets {-1,0,1,2}.

    Same polynomials as the cubic_matrix dot products in
    interpolation.cl:101-117: w[j] = dot((1,u,u^2,u^3), M[j]).
    """
    u = np.asarray(u, dtype=dtype)
    u2 = u * u
    u3 = u2 * u
    w0 = -0.5 * u + u2 - 0.5 * u3
    w1 = 1.0 - 2.5 * u2 + 1.5 * u3
    w2 = 0.5 * u + 2.0 * u2 - 1.5 * u3
    w3 = -0.5 * u2 + 0.5 * u3
    return np.stack([w0, w1, w2, w3], axis=-1)


def _axis_weights_cubic(n_out: int, n_in: int, dtype=np.float64):
    """Align-corners Catmull-Rom taps: (idx [n_out, 4], w [n_out, 4])."""
    if n_out == 1:
        x = np.zeros(1, dtype=dtype)
    else:
        x = np.arange(n_out, dtype=dtype) / (n_out - 1) * (n_in - 1)
    x0 = np.floor(x)
    u = x - x0
    base = x0.astype(np.int64) - 1
    idx = np.clip(base[:, None] + np.arange(4)[None, :], 0, n_in - 1)
    return idx, cubic_weights(u, dtype=dtype)


def axis_weights(n_out: int, n_in: int, method: str, dtype=np.float64):
    if method == "bilinear":
        return _axis_weights_linear(n_out, n_in, dtype)
    if method == "bicubic":
        return _axis_weights_cubic(n_out, n_in, dtype)
    raise ValueError(f"unknown method {method!r}")


def resize_align_corners(
    img: np.ndarray,
    out_hw,
    method: str = "bilinear",
    dtype=np.float64,
) -> np.ndarray:
    """Separable align-corners resize of [H, W] or [H, W, C].

    Returns float in the input's value range. Bicubic output is clamped
    to [0, 255] for uint8 inputs / [0, 1] for float inputs in [0, 1]
    (matching interpolation.cl:128's clamp on UNORM data).
    """
    in_float = np.asarray(img, dtype=dtype)
    squeeze = in_float.ndim == 2
    if squeeze:
        in_float = in_float[..., None]
    h_in, w_in = in_float.shape[:2]
    h_out, w_out = out_hw

    yidx, yw = axis_weights(h_out, h_in, method, dtype)
    xidx, xw = axis_weights(w_out, w_in, method, dtype)

    # vertical pass: [h_out, w_in, C]
    tmp = np.einsum("okwc,ok->owc", in_float[yidx], yw)
    # horizontal pass: [h_out, w_out, C]
    out = np.einsum("ohkc,hk->ohc", tmp[:, xidx, :], xw)

    if method == "bicubic":
        hi = 255.0 if np.issubdtype(np.asarray(img).dtype, np.integer) else 1.0
        out = np.clip(out, 0.0, hi)
    if squeeze:
        out = out[..., 0]
    return out


def resize_uint8(img: np.ndarray, out_hw, method: str = "bilinear") -> np.ndarray:
    """uint8-in/uint8-out resize with round-to-nearest quantization."""
    out = resize_align_corners(img, out_hw, method)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
