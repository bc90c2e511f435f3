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


def _blur_k1(cfg: RaisrConfig) -> np.ndarray:
    """1D factor of the separable structure-tensor Gaussian window."""
    g = cfg.gauss_len // 2
    w2d = oracle_raisr.gaussian2d((cfg.gauss_len, cfg.gauss_len), cfg.gauss_sigma)
    return w2d[g] / np.sqrt(w2d[g, g])


def _eigen_bucket(a, b, d, cfg: RaisrConfig):
    """Structure tensor (a, b; b, d) -> (angle, strength, coherence)
    indices, elementwise on arrays of any shape."""
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


def hash_components(up_y: jnp.ndarray, cfg: RaisrConfig):
    """Per-pixel (angle_idx, strength_idx, coherence_idx), each [H, W] int32."""
    g = cfg.gauss_len // 2
    pad = g + 1
    y = jnp.pad(up_y.astype(jnp.float32), pad, mode="edge")
    gx = _correlate2d_valid(y, oracle_raisr.SOBEL_X)
    gy = _correlate2d_valid(y, oracle_raisr.SOBEL_Y)

    k1 = _blur_k1(cfg)
    a = _gauss_blur_valid(gx * gx, k1)
    b = _gauss_blur_valid(gx * gy, k1)
    d = _gauss_blur_valid(gy * gy, k1)
    return _eigen_bucket(a, b, d, cfg)


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


# ---------------------------------------------------------------------------
# Plane-space (parity-phase) pipeline.
#
# The round-1 pipeline worked on full-res interleaved arrays and paid
# ~16 MB of pad+transpose glue per image to feed the Pallas kernel's
# parity planes. Here the ENTIRE pipeline is phase-native: the cheap
# upscale emits origin-aligned parity planes directly (per-phase static
# resize taps), gradients / structure-tensor blur are full-res stencils
# re-expressed as shifted plane reads (a full-res offset (dr, dc) maps
# to one (plane permutation, plane offset) pair - zero relayout), the
# eigen/bucket math is pointwise per plane, and the filter kernel
# consumes the planes as-is. The only interleaved array ever built is
# the final uint8 output.
#
# Plane convention (shared with ops/pallas/raisr_pallas.py):
#   planes[a*s + b][org_r + i, org_c + j] = up_e(s*i + a, s*j + b)
# where up_e is the edge-replicated upscale at GLOBAL align-corners
# coordinates.
# ---------------------------------------------------------------------------


def _phase_stencil_taps(n_in: int, s: int, phase: int, org: int, n_out: int):
    """Per-phase 1D upscale as a variable-coefficient SHIFT stencil.

    Plane index j samples full-res q = s*(j - org) + phase, i.e. source
    coordinate x(q) = q*(n_in-1)/(s*n_in - 1) whose slope vs j is ~1:
    the 2 linear taps always land within a few positions of j. So
    instead of a lane gather (the slow path on TPU - measured 3.1 ms of
    the 6.6 ms pipeline), the resize becomes a handful of SHIFTED
    multiply-adds with constant weight vectors: out[j] = sum_d
    wvec_d[j] * xpad[j + d]. In-range q reuses axis_weights' exact f32
    taps (bit-identical values); out-of-range q extends the coordinate
    map linearly so both taps land in the edge padding (== the clamped
    edge-replicated value, with a tight offset range even across the
    lane-alignment padding).

    Returns (pad_lo, pad_hi, {offset d: weight vector [n_out] f32}),
    with out[j] = sum_d w_d[j] * xpad[j + d + pad_lo].
    """
    from oclcomputervision_tpu.oracle.interpolation import axis_weights

    q = s * (np.arange(n_out) - org) + phase
    idx = np.empty((n_out, 2), np.int64)
    wgt = np.empty((n_out, 2), np.float32)
    inr = (q >= 0) & (q <= s * n_in - 1)
    g_idx, g_w = axis_weights(s * n_in, n_in, "bilinear", dtype=np.float32)
    idx[inr] = g_idx[q[inr]]
    wgt[inr] = g_w[q[inr]]
    xq = q[~inr].astype(np.float64) * (n_in - 1) / (s * n_in - 1)
    i0 = np.floor(xq).astype(np.int64)
    idx[~inr, 0] = i0
    idx[~inr, 1] = i0 + 1
    wgt[~inr, 0] = 1.0
    wgt[~inr, 1] = 0.0

    j = np.arange(n_out)
    d_all = idx - j[:, None]
    pad_lo = max(0, -int(d_all.min()))
    pad_hi = max(0, int(d_all.max()) + n_out - n_in)
    offs = {}
    for k in range(2):
        dk = d_all[:, k]
        for d in np.unique(dk):
            v = offs.setdefault(int(d), np.zeros(n_out, np.float32))
            m = dk == d
            v[m] += wgt[m, k]
    return pad_lo, pad_hi, offs


def upscale_planes(
    x01: jnp.ndarray, cfg: RaisrConfig, h2p: int, w2p: int, hq: int, wq: int, hp: int
) -> jnp.ndarray:
    """Cheap-upscale a [..., h, w] float image directly into parity planes.

    Returns [..., s*s, hq, wq] float32 with origin (hp, hp): plane rows
    cover out rows [-hp, hq - hp), clamped to the image (edge
    replication, matching the hash/apply stages' pad mode). Bit-identical
    to deinterleaving ops.interpolation._resize_plane's output because
    each in-image element evaluates the same 2-tap f32 expressions (see
    _phase_stencil_taps).
    """
    s = cfg.scale
    h, w = x01.shape[-2:]
    lead = x01.shape[:-2]
    x = x01.astype(jnp.float32)
    nopad = [(0, 0)] * len(lead)

    planes = []
    for a in range(s):
        pad_t, pad_b, roffs = _phase_stencil_taps(h, s, a, hp, hq)
        xp = jnp.pad(x, nopad + [(pad_t, pad_b), (0, 0)], mode="edge")
        v = jnp.zeros(lead + (hq, w), jnp.float32)
        for d, wv in sorted(roffs.items()):
            v = v + jnp.asarray(wv)[:, None] * xp[
                ..., d + pad_t : d + pad_t + hq, :
            ]
        for b in range(s):
            pad_l, pad_r, coffs = _phase_stencil_taps(w, s, b, hp, wq)
            vp = jnp.pad(v, nopad + [(0, 0), (pad_l, pad_r)], mode="edge")
            o = jnp.zeros(lead + (hq, wq), jnp.float32)
            for d, wv in sorted(coffs.items()):
                o = o + jnp.asarray(wv)[None, :] * vp[
                    ..., :, d + pad_l : d + pad_l + wq
                ]
            planes.append(o)
    return jnp.stack(planes, axis=-3)


def _read_phases(planes, src_org, dr, dc, dst_org, rows, cols, s):
    """Shifted full-res read, in plane space.

    Source planes have origin ``src_org`` = (row, col). Returns
    [..., s*s, rows, cols] where out[..., p, i, j] = the source value at
    full-res (s*(i - dst_org[0]) + a + dr, s*(j - dst_org[1]) + b + dc)
    for p = a*s + b: each full-res offset is one plane permutation plus
    a static slice - never a strided gather.
    """
    so_r, so_c = src_org
    do_r, do_c = dst_org
    outs = []
    for p in range(s * s):
        a, b = divmod(p, s)
        a2, ro = (a + dr) % s, (a + dr) // s
        b2, co = (b + dc) % s, (b + dc) // s
        r0 = so_r - do_r + ro
        c0 = so_c - do_c + co
        assert r0 >= 0 and c0 >= 0, (r0, c0, dr, dc)
        outs.append(
            planes[..., a2 * s + b2, r0 : r0 + rows, c0 : c0 + cols]
        )
    return jnp.stack(outs, axis=-3)


def hash_planes(
    y_planes: jnp.ndarray, cfg: RaisrConfig, hp: int, h2p: int, w2p: int
) -> jnp.ndarray:
    """Per-pixel hash bucket, computed entirely in plane space.

    y_planes [..., s*s, h2p + pad, w2p + pad] (origin (hp, hp), halo >=
    ceil((gauss_len//2 + 1)/s)); returns bucket planes
    [..., s*s, h2p, w2p] int32 (leading batch dims pass through). Same tap values in the same accumulation order as
    hash_image's interleaved stencils (raisr.cl:235-316 semantics with
    the reference's 4 kernel bugs fixed - see oracle/raisr.py).
    """
    s = cfg.scale
    g = cfg.gauss_len // 2
    bh = -(-g // s)  # plane halo needed by the blur stage

    def stencil3(kern):
        out = None
        for u in range(3):
            for v in range(3):
                cc = float(kern[u, v])
                if cc == 0.0:
                    continue
                term = cc * _read_phases(
                    y_planes, (hp, hp), u - 1, v - 1, (bh, bh),
                    h2p + 2 * bh, w2p + 2 * bh, s,
                )
                out = term if out is None else out + term
        return out

    gx = stencil3(oracle_raisr.SOBEL_X)
    gy = stencil3(oracle_raisr.SOBEL_Y)

    k1 = _blur_k1(cfg)
    t3 = jnp.stack([gx * gx, gx * gy, gy * gy])  # [3, s*s, .., ..] origin (bh, bh)

    vpass = None
    for u in range(cfg.gauss_len):
        term = float(k1[u]) * _read_phases(
            t3, (bh, bh), u - g, 0, (0, bh), h2p, w2p + 2 * bh, s
        )
        vpass = term if vpass is None else vpass + term
    hpass = None
    for u in range(cfg.gauss_len):
        term = float(k1[u]) * _read_phases(
            vpass, (0, bh), 0, u - g, (0, 0), h2p, w2p, s
        )
        hpass = term if hpass is None else hpass + term

    ai, si, ci = _eigen_bucket(hpass[0], hpass[1], hpass[2], cfg)
    return (ai * cfg.num_strength + si) * cfg.num_coherence + ci


def ct_blend_weights(up_y: jnp.ndarray) -> jnp.ndarray:
    """Census-transform structure weights [..., H, W] in [0, 1]
    (oracle/raisr.ct_blend_weights twin; RAISR paper §V blending -
    w = clip((8 - LCC)/6, 0, 1) from the 3x3 census ring of the
    cheap-upscaled luma, edge-replicated borders)."""
    nd = up_y.ndim
    pad = [(0, 0)] * (nd - 2) + [(1, 1), (1, 1)]
    xp = jnp.pad(up_y, pad, mode="edge")
    h, w = up_y.shape[-2], up_y.shape[-1]
    lead = (0,) * (nd - 2)
    bits = [
        jax.lax.slice(
            xp, lead + (1 + dr, 1 + dc), up_y.shape[:-2] + (1 + dr + h, 1 + dc + w)
        )
        >= up_y
        for dr, dc in oracle_raisr.CT_RING
    ]
    lcc = sum(
        (bits[k] != bits[(k + 1) % 8]).astype(jnp.float32) for k in range(8)
    )
    return jnp.clip((8.0 - lcc) / 6.0, 0.0, 1.0)


def _ct_blend_weight_planes(
    up_pl: jnp.ndarray, s: int, hp: int, h2p: int, w2p: int
) -> jnp.ndarray:
    """ct_blend_weights in parity-plane space.

    up_pl [B, s*s, hq, wq] luma upscale planes (origin (hp, hp),
    out-of-image entries edge-replicated by the upscale kernel contract,
    so boundary census bits match the oracle's edge padding) ->
    weights [B, s*s, h2p, w2p]. Full-res pixel (s*i + a, s*j + b)'s
    census neighbor (dr, dc) lives in plane ((a+dr) % s, (b+dc) % s) at
    the static in-plane offset ((a+dr)//s, (b+dc)//s) - the hash
    kernel's rd() pattern, here as plain XLA slices (the stage is
    elementwise-bound; measured cost in ROADMAP)."""
    nb = up_pl.shape[0]

    def rd(a, b, dr, dc):
        a2, ro = (a + dr) % s, (a + dr) // s
        b2, co = (b + dc) % s, (b + dc) // s
        return jax.lax.slice(
            up_pl,
            (0, a2 * s + b2, hp + ro, hp + co),
            (nb, a2 * s + b2 + 1, hp + ro + h2p, hp + co + w2p),
        )[:, 0]

    outs = []
    for a in range(s):
        for b in range(s):
            center = rd(a, b, 0, 0)
            bits = [rd(a, b, dr, dc) >= center for dr, dc in oracle_raisr.CT_RING]
            lcc = sum(
                (bits[k] != bits[(k + 1) % 8]).astype(jnp.float32)
                for k in range(8)
            )
            outs.append(jnp.clip((8.0 - lcc) / 6.0, 0.0, 1.0))
    return jnp.stack(outs, axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "nchan", "interpret"))
def _raisr_planes_batched(imgs_u8, filters, cfg: RaisrConfig, nchan: int,
                          interpret=False):
    """Fully plane-native batched RAISR: uint8 [B, H, W(, C)] in,
    uint8 [B, sH, sW(, C)] out.

    The fidelity='full' fast path: upscale -> hash -> filter without any
    full-res interleaved intermediate. Every XLA stage carries the batch
    as a leading dim and the Pallas kernel carries it as a grid axis, so
    a whole stack costs 4 kernel launches (not 4 per image) and the
    per-launch overhead that dominates this runtime at single-image
    sizes amortizes away. Color shares the luma hash across channels.
    """
    from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
        HALO_ROWS,
        TILE_H,
        apply_filters_planes,
        plane_halo,
    )

    s = cfg.scale
    bsz, h, w = imgs_u8.shape[:3]
    h2p = -(-h // TILE_H) * TILE_H
    w2p = -(-w // 128) * 128
    hp = plane_halo(cfg.filter_len, s, cfg.gauss_len)
    # hash reads the upscale planes at Sobel offset 1 past the blur halo
    assert hp >= -(-(cfg.gauss_len // 2) // s) + 1, (
        "plane halo must cover the hash receptive field"
    )
    hq, wq = h2p + HALO_ROWS, w2p + 128

    from oclcomputervision_tpu.ops.pallas.upscale_pallas import (
        upscale_planes_pallas,
    )

    x01 = imgs_u8.astype(jnp.float32) / 255.0
    # VMEM-resident upscale kernel (<= 1 ULP vs the XLA upscale_planes
    # twin, which spends ~1.9 ms/img on materialized stencil slices);
    # color channels stack into the kernel's batch grid - one launch
    if nchan == 1:
        chan_planes = [upscale_planes_pallas(x01, cfg, hq, wq, hp, interpret)]
    else:
        stacked = jnp.concatenate(
            [x01[..., c] for c in range(nchan)], axis=0
        )  # [nchan*B, h, w]
        up_all = upscale_planes_pallas(stacked, cfg, hq, wq, hp, interpret)
        chan_planes = [
            up_all[c * bsz : (c + 1) * bsz] for c in range(nchan)
        ]  # each [B, s*s, hq_pad, wq]

    # CSC is linear and pointwise -> apply it in plane space
    if nchan == 1:
        yuv_planes = chan_planes
    else:
        csc = oracle_raisr.RGB2YUV
        yuv_planes = [
            sum(float(csc[r, c]) * chan_planes[c] for c in range(3))
            for r in range(3)
        ]
        if nchan == 4:
            yuv_planes.append(chan_planes[3])  # alpha passes through

    from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
        _hash_tile_h,
        hash_planes_pallas,
    )

    if _hash_tile_h(w2p, s) >= 8:
        # VMEM-resident hash kernel: the XLA hash_planes twin spends
        # ~4 ms/img round-tripping fp32 gradient/blur intermediates
        # through HBM (~10x the kernel at s=3, measured). The tile rule
        # knows which (s, w2p) fit the Mosaic scoped-vmem limit.
        # cfg.hash_mode selects the kernel variant; the matmul-blur
        # modes need a lane-multiple plane width (w2p is 128-padded
        # above, so this always holds - the strip is a safety net).
        amode = cfg.hash_mode
        if (amode.endswith("_mm") or amode.endswith("_mmx")) and w2p % 128:
            amode = amode.rsplit("_mm", 1)[0]
        bucket_pl = hash_planes_pallas(
            yuv_planes[0], cfg, interpret, h2p=h2p, angle_mode=amode
        )
    else:
        # very wide high-scale geometry: the s^2 unrolled stencils
        # exceed scoped vmem at every tile height; XLA twin fallback
        bucket_pl = hash_planes(yuv_planes[0], cfg, hp, h2p, w2p)

    # single-launch color: channels stack into the kernel's batch grid
    # axis and share the luma bucket block (reference raisr.cl:322-331
    # filters all channels in the one dispatch)
    nc = len(yuv_planes)
    stacked_in = (
        yuv_planes[0] if nc == 1 else jnp.concatenate(yuv_planes, axis=0)
    )
    stacked_out = apply_filters_planes(
        stacked_in, bucket_pl, filters, cfg, interpret
    )  # [nc*B, s*s, h2p, w2p]
    filtered = [stacked_out[c * bsz : (c + 1) * bsz] for c in range(nc)]

    if cfg.blend == "ct":
        # census-transform structure blending (paper §V): luma-derived
        # weights fade every filtered channel back to the cheap upscale
        # in unstructured regions
        wgt = _ct_blend_weight_planes(yuv_planes[0], s, hp, h2p, w2p)
        filtered = [
            wgt * f
            + (1.0 - wgt) * yuv_planes[c][:, :, hp : hp + h2p, hp : hp + w2p]
            for c, f in enumerate(filtered)
        ]

    if nchan == 1:
        out_pl = [filtered[0]]
    else:
        inv = oracle_raisr.YUV2RGB
        out_pl = [
            sum(float(inv[r, c]) * filtered[c] for c in range(3)) for r in range(3)
        ]
        if nchan == 4:
            out_pl.append(filtered[3])

    u8 = [
        jnp.clip(jnp.round(o * 255.0), 0, 255).astype(jnp.uint8) for o in out_pl
    ]
    # interleave in uint8 (4x less traffic than fp32), then crop
    outs = []
    for o in u8:
        full = (
            o.reshape(bsz, s, s, h2p, w2p)
            .transpose(0, 3, 1, 4, 2)
            .reshape(bsz, s * h2p, s * w2p)
        )
        outs.append(full[:, : s * h, : s * w])
    return outs[0] if nchan == 1 else jnp.stack(outs, axis=-1)


def _raisr_2d_planes(img_u8, filters, cfg: RaisrConfig, nchan: int, interpret=False):
    """Single-image wrapper over the batched plane-native pipeline."""
    return _raisr_planes_batched(
        jnp.asarray(img_u8)[None], filters, cfg, nchan, interpret
    )[0]


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


def _raisr_post(up, filters, cfg: RaisrConfig, gray: bool, use_pallas: bool = True):
    """Pipeline after the cheap upscale: YUV -> hash -> filter -> uint8.

    ``up`` is the bilinear-upscaled float image in [0, 1], [H, W, C]
    (C=1 for gray). Split out so the spatially-sharded path
    (parallel/mesh.py) can feed a shard-local upscale computed at
    global coordinates. ``use_pallas=False`` forces the pure-XLA apply
    (the scoped-vmem fallback route).
    """
    yuv = up if gray else _csc(up, oracle_raisr.RGB2YUV.T)

    if cfg.fidelity == "shipped":
        out = yuv if gray else _csc(yuv, oracle_raisr.YUV2RGB.T)
    else:
        ai, si, ci = hash_components(yuv[..., 0], cfg)
        if use_pallas and jax.default_backend() == "tpu":
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
        if cfg.blend == "ct":
            wgt = ct_blend_weights(yuv[..., 0])[..., None]
            filtered = wgt * filtered + (1.0 - wgt) * yuv
        out = filtered if gray else _csc(filtered, oracle_raisr.YUV2RGB.T)

    out = jnp.clip(jnp.round(out * 255.0), 0, 255).astype(jnp.uint8)
    return out[..., 0] if gray else out


@functools.partial(jax.jit, static_argnames=("cfg", "gray", "use_pallas"))
def _raisr_2d(img_u8, filters, cfg: RaisrConfig, gray: bool, use_pallas: bool = True):
    from oclcomputervision_tpu.ops.interpolation import _resize_plane

    x01 = img_u8.astype(jnp.float32) / 255.0
    h, w = x01.shape[:2]
    x3 = x01[..., None] if gray else x01
    up = _resize_plane(x3, (h * cfg.scale, w * cfg.scale), "bilinear")
    return _raisr_post(up, filters, cfg, gray, use_pallas)


def raisr_upsample(
    img: jnp.ndarray, filters: jnp.ndarray | None, cfg: RaisrConfig = RaisrConfig()
) -> jnp.ndarray:
    """RAISR upsample of uint8 [H, W], [H, W, 3/4], or batched [B, ...]."""
    img = jnp.asarray(img)
    if filters is None:
        filters = jnp.zeros((cfg.num_filters, cfg.filter_len, cfg.filter_len), jnp.float32)
    filters = jnp.asarray(filters, jnp.float32)
    gray = img.ndim == 2 or (img.ndim == 3 and img.shape[-1] not in (3, 4))

    single = img.ndim == 2 or (img.ndim == 3 and not gray)
    if cfg.fidelity == "full" and jax.default_backend() == "tpu":
        # plane-native fast path: batched end-to-end (the batch rides
        # every XLA stage and the kernel grid - one compiled program,
        # 4 kernel launches per stack)
        nchan = 1 if gray else img.shape[-1]
        try:
            if single:
                return _raisr_planes_batched(img[None], filters, cfg, nchan)[0]
            return _raisr_planes_batched(img, filters, cfg, nchan)
        except Exception as e:  # Mosaic scoped-vmem OOM -> XLA twin
            # the kernels' vmem budgets (_row_chunk / _hash_tile_h) are
            # run-verified at the pinned geometries and assumed by
            # monotonicity in between; if a future Mosaic version (or an
            # unverified geometry) overflows at compile time, degrade to
            # the XLA path instead of raising (ADVICE r2)
            if "vmem" not in str(e).lower() and "scoped" not in str(e).lower():
                raise
            import warnings

            warnings.warn(
                "plane-native RAISR kernels exceeded scoped VMEM at this "
                f"geometry ({img.shape}); falling back to the XLA path: {e}",
                RuntimeWarning,
            )
            if single:
                return _raisr_2d(img, filters, cfg, img.ndim == 2, use_pallas=False)
            return jax.lax.map(
                lambda x: _raisr_2d(x, filters, cfg, x.ndim == 2, use_pallas=False),
                img,
            )
    if single:
        return _raisr_2d(img, filters, cfg, img.ndim == 2)
    # batched legacy path
    # lax.map (sequential per image), NOT vmap: vmapping the phase
    # deinterleave/stack stacks tiny [1, H, W] slices whose padded
    # layout blows HBM by 128x.
    return jax.lax.map(lambda x: _raisr_2d(x, filters, cfg, x.ndim == 2), img)
