"""TPU-native RAISR super-resolution inference.

Rebuild of the reference's fused mega-kernel (super_resolution/raisr.cl:108-338)
as one jitted pipeline that XLA fuses on-chip:

  cheap bilinear upscale -> RGB->YUV -> Sobel gradients (conv) ->
  9x9 Gaussian-weighted structure tensor (separable convs) ->
  eigenanalysis -> (angle, strength, coherence, pixel-type) hash ->
  per-pixel filter select from the learned bank -> 11x11 filter -> RGB.

TPU design notes:
- Gradients and the structure-tensor blur are small convs -> MXU.
- The per-pixel filter select is a [H*W] gather from the [864, 121]
  bank; the Pallas kernel path (ops/pallas) replaces it with a one-hot
  [N, buckets] @ [buckets, 121] matmul that the MXU eats.
- The 11x11 filter apply is 121 shifted fused multiply-adds (VPU), not
  a dynamic 2D gather.

Semantics match oracle/raisr.py (see its docstring for the
'shipped'/'full' fidelity discussion and reference bug list).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from oclcomputervision_tpu.oracle import raisr as oracle_raisr
from oclcomputervision_tpu.utils.config import RaisrConfig


def _correlate2d_valid(img: jnp.ndarray, kern_np: np.ndarray) -> jnp.ndarray:
    """'valid' correlation of [H, W] with a small constant kernel.

    Unrolled as k*k shifted FMAs: cheaper than a real conv dispatch for
    3x3, and XLA fuses the whole stencil.
    """
    kh, kw = kern_np.shape
    h = img.shape[0] - kh + 1
    w = img.shape[1] - kw + 1
    out = jnp.zeros((h, w), img.dtype)
    for i in range(kh):
        for j in range(kw):
            if kern_np[i, j] != 0.0:
                out = out + jnp.float32(kern_np[i, j]) * jax.lax.slice(
                    img, (i, j), (i + h, j + w)
                )
    return out


def _gauss_blur_valid(img: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable 'valid' blur with a 1D kernel (structure-tensor window)."""
    k = k1d.shape[0]
    h = img.shape[0] - k + 1
    out = jnp.zeros((h, img.shape[1]), img.dtype)
    for i in range(k):
        out = out + jnp.float32(k1d[i]) * jax.lax.slice(img, (i, 0), (i + h, img.shape[1]))
    w = img.shape[1] - k + 1
    out2 = jnp.zeros((h, w), img.dtype)
    for j in range(k):
        out2 = out2 + jnp.float32(k1d[j]) * jax.lax.slice(out, (0, j), (h, j + w))
    return out2


def hash_components(up_y: jnp.ndarray, cfg: RaisrConfig):
    """Per-pixel (angle_idx, strength_idx, coherence_idx), each [H, W] int32."""
    g = cfg.gauss_len // 2
    pad = g + 1
    y = jnp.pad(up_y.astype(jnp.float32), pad, mode="edge")
    gx = _correlate2d_valid(y, oracle_raisr.SOBEL_X)
    gy = _correlate2d_valid(y, oracle_raisr.SOBEL_Y)

    w2d = oracle_raisr.gaussian2d((cfg.gauss_len, cfg.gauss_len), cfg.gauss_sigma)
    k1 = w2d[g] / np.sqrt(w2d[g, g])

    a = _gauss_blur_valid(gx * gx, k1)
    b = _gauss_blur_valid(gx * gy, k1)
    d = _gauss_blur_valid(gy * gy, k1)

    t = a + d
    det = a * d - b * b
    disc = jnp.sqrt(jnp.maximum(t * t / 4.0 - det, 0.0))
    l1 = t / 2.0 + disc
    l2 = t / 2.0 - disc

    theta = jnp.arctan2(b, l1 - d)
    theta = jnp.where(theta < 0, theta + jnp.pi, theta)

    sq1 = jnp.sqrt(jnp.maximum(l1, 0.0))
    sq2 = jnp.sqrt(jnp.maximum(l2, 0.0))
    denom = sq1 + sq2
    coherence = jnp.where(denom != 0, (sq1 - sq2) / jnp.where(denom == 0, 1.0, denom), 0.0)

    angle_idx = jnp.clip(
        (theta / jnp.pi * cfg.num_angle).astype(jnp.int32), 0, cfg.num_angle - 1
    )
    sq = jnp.asarray(cfg.strength_quantizers, jnp.float32)
    strength_idx = jnp.sum(l1[..., None] >= sq, axis=-1).astype(jnp.int32)
    cq = jnp.asarray(cfg.coherence_quantizers, jnp.float32)
    coherence_idx = jnp.sum(coherence[..., None] >= cq, axis=-1).astype(jnp.int32)
    return angle_idx, strength_idx, coherence_idx


def hash_image(up_y: jnp.ndarray, cfg: RaisrConfig) -> jnp.ndarray:
    """Per-pixel (angle, strength, coherence) bucket [H, W] int32.

    The sigma=2 9x9 Gaussian of the reference (raisr.py:80-82) is
    separable to fp precision; we blur gx^2/gxgy/gy^2 with the 1D factor
    on each axis (identical weights, fewer FLOPs than the reference's
    81-tap accumulation, raisr.cl:265-275).
    """
    angle_idx, strength_idx, coherence_idx = hash_components(up_y, cfg)
    return (angle_idx * cfg.num_strength + strength_idx) * cfg.num_coherence + coherence_idx


def pixel_type_map(h: int, w: int, scale: int) -> jnp.ndarray:
    yy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (yy % scale) * scale + (xx % scale)


def apply_filters(
    up: jnp.ndarray, fidx: jnp.ndarray, filters: jnp.ndarray, cfg: RaisrConfig
) -> jnp.ndarray:
    """out[p] = sum_q filters[fidx[p], q] * up[p + q - m], all channels."""
    fl = cfg.filter_len
    m = fl // 2
    squeeze = up.ndim == 2
    x = up[..., None] if squeeze else up
    h, w = x.shape[:2]
    xp = jnp.pad(x, ((m, m), (m, m), (0, 0)), mode="edge")
    sel = jnp.take(filters.reshape(-1, fl * fl), fidx.reshape(-1), axis=0).reshape(
        h, w, fl * fl
    )
    out = jnp.zeros_like(x)
    for i in range(fl):
        for j in range(fl):
            out = out + sel[:, :, i * fl + j, None] * jax.lax.slice(
                xp, (i, j, 0), (i + h, j + w, x.shape[2])
            )
    return out[..., 0] if squeeze else out


def apply_filters_fast(
    up: jnp.ndarray,
    angle_idx: jnp.ndarray,
    strength_idx: jnp.ndarray,
    coherence_idx: jnp.ndarray,
    filters: jnp.ndarray,
    cfg: RaisrConfig,
) -> jnp.ndarray:
    """Gather-free per-pixel filtering, phase-split over pixel types.

    The per-pixel filter select (a [H*W] gather from the [864, 121]
    bank - raisr.cl:318's pointer arithmetic) is the lane-hostile
    pattern on TPU. Instead:
    - the pixel-type axis is static (a scale x scale checkerboard), so
      the image is deinterleaved into scale^2 phases, each owning one
      W_t = filters[:, t] slice;
    - the (angle, strength, coherence) bucket one-hot factorizes as
      A[24] (x) (S[3] (x) C[3]) - 30 compares + 225 multiplies per
      pixel instead of 864 compares;
    - the filter select is then r = patches @ W_t^T on the MXU (all-
      bucket responses in fp32), and the one-hot row-dot picks each
      pixel's hashed bucket exactly (selection rows have exactly one
      nonzero);
    - the 11x11 response is 121 shifted strided FMAs of the upscaled
      image against F's columns (all channels share F).
    """
    s = cfg.scale
    fl = cfg.filter_len
    m = fl // 2
    nb = cfg.num_angle * cfg.num_strength * cfg.num_coherence
    squeeze = up.ndim == 2
    x = up[..., None] if squeeze else up
    h, w, c = x.shape
    xp = jnp.pad(x, ((m, m), (m, m), (0, 0)), mode="edge")
    # fp32 throughout: this XLA path is the CPU/oracle-adjacent twin
    # (TPU routes to the Pallas kernel in _raisr_post), and the XLA CPU
    # backend cannot execute bf16 x bf16 -> f32 dots anyway.
    sel_dtype = jnp.float32

    def phase_onehot(py, px):
        # one-hot built from the phase's small int32 index maps (slicing
        # the [h, w, 216] full-res one-hot instead costs 4 strided
        # passes over ~66MB)
        ai = angle_idx[py::s, px::s]
        si = strength_idx[py::s, px::s]
        ci = coherence_idx[py::s, px::s]
        a1 = (ai[..., None] == jnp.arange(cfg.num_angle, dtype=jnp.int32)).astype(
            sel_dtype
        )
        s1 = (
            si[..., None] == jnp.arange(cfg.num_strength, dtype=jnp.int32)
        ).astype(sel_dtype)
        c1 = (
            ci[..., None] == jnp.arange(cfg.num_coherence, dtype=jnp.int32)
        ).astype(sel_dtype)
        sc = (s1[..., :, None] * c1[..., None, :]).reshape(ai.shape + (-1,))
        return (a1[..., :, None] * sc[..., None, :]).reshape(ai.shape + (nb,))

    # bank reorganized as [bucket, pixel_type, taps]
    wall = filters.reshape(nb, cfg.num_pixel_type, fl * fl).astype(jnp.float32)

    # im2col in ONE conv op (launch count dominates on this runtime; a
    # 121-slice stack lowers to ~500 copies). Feature order of
    # conv_general_dilated_patches is (C, fh, fw).
    h2, w2 = h // s, w // s
    phase_outs = []
    for py in range(s):
        row_outs = []
        for px in range(s):
            t = py * s + px
            oh_t = phase_onehot(py, px).astype(jnp.float32)  # [h2, w2, nb]
            # Per-phase STRIDED im2col (stride-s windows starting at the
            # phase offset): slicing a full-res [h, w, 121] patch tensor
            # with stride s relayouts gigabytes (measured 4x slower).
            # Feature order of conv_general_dilated_patches is (C, fh, fw).
            p_t = jax.lax.conv_general_dilated_patches(
                xp[None, py:, px:],
                (fl, fl),
                (s, s),
                "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )[0, :h2, :w2]  # [h2, w2, c*fl*fl]
            # All-bucket responses on the MXU, then the one-hot row-dot
            # selects each pixel's hashed bucket. Per-channel 2D tensors:
            # a size-1 channel axis interior to the layout pads 8x.
            chans = []
            for ch in range(c):
                r = jnp.einsum(
                    "ijq,bq->ijb",
                    p_t[..., ch * fl * fl : (ch + 1) * fl * fl],
                    wall[:, t],
                    preferred_element_type=jnp.float32,
                )
                chans.append(
                    jnp.einsum(
                        "ijb,ijb->ij", r, oh_t, preferred_element_type=jnp.float32
                    )
                )
            row_outs.append(jnp.stack(chans, axis=-1))
        phase_outs.append(row_outs)
    # re-interleave: out[s*i+py, s*j+px] = phase_outs[py][px][i, j]
    stacked = jnp.stack([jnp.stack(r) for r in phase_outs])  # [s, s, h2, w2, c]
    out = stacked.transpose(2, 0, 3, 1, 4).reshape(h, w, c)
    return out[..., 0] if squeeze else out


def _csc(img, mat) -> jnp.ndarray:
    """3x3 color-space conversion of [..., 3] or [..., 4] channels.

    The reference uses 4x4 CSC matrices whose alpha row is identity
    (raisr.py:20-33), so a BGRA input's alpha channel passes through the
    conversion untouched - and then receives the same per-pixel learned
    filter as the YUV channels (raisr.cl:322-331's half4 FMA).
    """
    m = jnp.asarray(mat, jnp.float32)
    if img.shape[-1] == 4:
        return jnp.concatenate([img[..., :3] @ m, img[..., 3:]], axis=-1)
    return img @ m


def _raisr_post(up, filters, cfg: RaisrConfig, gray: bool):
    """Pipeline after the cheap upscale: YUV -> hash -> filter -> uint8.

    ``up`` is the bilinear-upscaled float image in [0, 1], [H, W, C]
    (C=1 for gray). Split out so the spatially-sharded path
    (parallel/mesh.py) can feed a shard-local upscale computed at
    global coordinates.
    """
    yuv = up if gray else _csc(up, oracle_raisr.RGB2YUV.T)

    if cfg.fidelity == "shipped":
        out = yuv if gray else _csc(yuv, oracle_raisr.YUV2RGB.T)
    else:
        ai, si, ci = hash_components(yuv[..., 0], cfg)
        if jax.default_backend() == "tpu":
            # fused Pallas kernel: responses + one-hot select stay in
            # VMEM (the XLA path materializes ~GBs of [N, 216] tensors)
            from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
                apply_filters_pallas,
            )

            bucket = (ai * cfg.num_strength + si) * cfg.num_coherence + ci
            chans = [
                apply_filters_pallas(yuv[..., ch], bucket, filters, cfg)
                for ch in range(yuv.shape[-1])
            ]
            filtered = jnp.stack(chans, axis=-1)
        else:
            filtered = apply_filters_fast(yuv, ai, si, ci, filters, cfg)
        out = filtered if gray else _csc(filtered, oracle_raisr.YUV2RGB.T)

    out = jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)
    return out[..., 0] if gray else out


@functools.partial(jax.jit, static_argnames=("cfg", "gray"))
def _raisr_2d(img_u8, filters, cfg: RaisrConfig, gray: bool):
    from oclcomputervision_tpu.ops.interpolation import _resize_plane

    x01 = img_u8.astype(jnp.float32) / 255.0
    h, w = x01.shape[:2]
    x3 = x01[..., None] if gray else x01
    up = _resize_plane(x3, (h * cfg.scale, w * cfg.scale), "bilinear")
    return _raisr_post(up, filters, cfg, gray)


def raisr_upsample(
    img: jnp.ndarray, filters: jnp.ndarray | None, cfg: RaisrConfig = RaisrConfig()
) -> jnp.ndarray:
    """RAISR upsample of uint8 [H, W], [H, W, 3], or batched [B, ...]."""
    img = jnp.asarray(img)
    if filters is None:
        filters = jnp.zeros((cfg.num_filters, cfg.filter_len, cfg.filter_len), jnp.float32)
    filters = jnp.asarray(filters, jnp.float32)
    gray = img.ndim == 2 or (img.ndim == 3 and img.shape[-1] not in (3, 4))
    if img.ndim == 2 or (img.ndim == 3 and not gray):
        return _raisr_2d(img, filters, cfg, img.ndim == 2)
    # batched
    # lax.map (sequential per image), NOT vmap: vmapping the phase
    # deinterleave/stack stacks tiny [1, H, W] slices whose padded
    # layout blows HBM by 128x.
    return jax.lax.map(lambda x: _raisr_2d(x, filters, cfg, x.ndim == 2), img)
