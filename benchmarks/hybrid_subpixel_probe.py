"""VERDICT r4 item 5: why does hybrid+subpixel lose to exact+subpixel?

Integer flow: hybrid 3.165 BEATS exact 3.441 (BENCH_r04). After
subpixel=12: hybrid 2.746 LOSES to exact 2.457. This probe sweeps the
interaction axes on the Middlebury pair (smooth=9 throughout):

  A  exact + subpixel12                      (the 2.457 baseline)
  B  hybrid + subpixel12 (shipped order: fast -> exact-refine ->
     subpixel rounds per level)              (the 2.746 regression)
  C  hybrid, subpixel only at the FINEST level (are the intermediate
     levels' re-rounded subpixel seeds hurting the refine pass?)
  D  exact, subpixel only at the finest level (control for C)
  E  hybrid, subpixel BEFORE the seeded-exact refine at each level
     (refine around the subpixel-polished median instead of the raw
     fast flow), subpixel again after
  F  hybrid integer seeds, subpixel applied per level but the NEXT
     level is seeded from the PRE-subpixel integer flow (isolates
     "subpixel seeds corrupt the next level's search")

Run on the real TPU from the repo root:
    python benchmarks/hybrid_subpixel_probe.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")

from oclcomputervision_tpu.ops.motion import (
    estimate_motion_pyramid,
    estimate_motion_vector,
    median_filter_flow,
    refine_flow_subpixel,
    upscale_mv,
)
from oclcomputervision_tpu.ops.pallas.me_pallas import (
    seed_band_stats,
    stats_base_max,
)
from oclcomputervision_tpu.ops.pyramid import gaussian_pyramid
from oclcomputervision_tpu.utils import asset_path, load_gray, read_flo
from oclcomputervision_tpu.utils.metrics import epe

SMOOTH = 9
K = 12


def _subpixel_rounds(g0, g1, mv, k):
    for _ in range(k):
        mv = refine_flow_subpixel(g0, g1, mv, 5)
        mv = median_filter_flow(mv, SMOOTH)
    return mv


def _exact_refine(g0, g1, mv):
    """The pyramid driver's seeded-exact refine pass (bound == clamp)."""
    rs = median_filter_flow(mv, SMOOTH)
    rb = 32
    bm = stats_base_max(seed_band_stats(np.asarray(rs), rs.shape[-3]))
    for q in (8, 12, 16, 20, 24, 32):
        rb = q
        if bm <= q:
            break
    rs = jnp.clip(rs, -float(rb), float(rb))
    return estimate_motion_vector(
        g0, g1, 15, 5, seed=rs, seed_mode="fixed", method="exact",
        seed_bound=rb,
    )


def hybrid_custom(pyr0, pyr1, subpixel_at, refine_order, seed_from):
    """Per-level hybrid schedule.

    subpixel_at: set of level indices that run the K subpixel rounds
    refine_order: 'after' = fast -> refine -> subpixel (shipped);
                  'before' = fast -> subpixel -> refine -> subpixel
    seed_from: 'post' = next level seeded from the level's final flow
               (shipped); 'pre' = from the pre-subpixel integer flow
    """
    levels = len(pyr0)
    seed = None
    mv = None
    for lv in range(levels):
        method = "exact" if lv == 0 else "fast"
        mv = estimate_motion_vector(
            pyr0[lv], pyr1[lv], 15, 5, seed=seed, seed_mode="fixed",
            method=method,
        )
        if lv > 0:
            if refine_order == "before" and lv in subpixel_at:
                mv = _subpixel_rounds(pyr0[lv], pyr1[lv], mv, K)
            mv = _exact_refine(pyr0[lv], pyr1[lv], mv)
        integer_mv = median_filter_flow(mv, SMOOTH)
        if lv in subpixel_at:
            mv = _subpixel_rounds(pyr0[lv], pyr1[lv], mv, K)
        else:
            mv = integer_mv
        if lv + 1 < levels:
            src = integer_mv if seed_from == "pre" else mv
            seed = upscale_mv(src, 2, mode="fixed")
    return mv


def main():
    g0 = load_gray("frame10.png")
    g1 = load_gray("frame11.png")
    gt = read_flo(asset_path("flow10.flo"))
    pyr0 = gaussian_pyramid(g0, 2, 3)
    pyr1 = gaussian_pyramid(g1, 2, 3)

    def score(name, flow):
        print(f"{name:55s} EPE {epe(np.asarray(flow), gt):.4f}", flush=True)

    score("A exact + subpixel12 (shipped)", estimate_motion_pyramid(
        g0, g1, 3, method="exact", smooth=SMOOTH, subpixel=K)[-1])
    score("B hybrid + subpixel12 (shipped)", estimate_motion_pyramid(
        g0, g1, 3, method="fast", smooth=SMOOTH, subpixel=K)[-1])
    score("B' custom-driver reproduction of B", hybrid_custom(
        pyr0, pyr1, {0, 1, 2}, "after", "post"))
    score("C hybrid, subpixel finest only", hybrid_custom(
        pyr0, pyr1, {2}, "after", "post"))
    score("D exact, subpixel finest only", _subpixel_rounds(
        pyr0[2], pyr1[2],
        estimate_motion_pyramid(g0, g1, 3, method="exact", smooth=SMOOTH)[-1],
        K,
    ))
    score("E hybrid, subpixel before+after refine", hybrid_custom(
        pyr0, pyr1, {0, 1, 2}, "before", "post"))
    score("F hybrid, next level seeded pre-subpixel", hybrid_custom(
        pyr0, pyr1, {0, 1, 2}, "after", "pre"))


if __name__ == "__main__":
    main()
