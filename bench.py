"""Benchmark harness: the two north-star fused ops.

Measures, on device-resident uint8 batches in steady state on whatever
device JAX exposes (TPU under the driver):
  1. fused global histogram equalization (tiled histogram -> transfer
     LUT -> gather, one jitted kernel), and
  2. RAISR 2x super-resolution (cheap upscale -> hash -> fused Pallas
     filter select+apply).

Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": "megapixels/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star of
1000 MP/s/chip on TPU v5e for BOTH ops (the reference publishes no
numbers of its own - BASELINE.md). The RAISR value counts OUTPUT
megapixels.

Timing discipline for the tunneled TPU in this environment:
- every timed call gets a never-seen-before device-resident buffer
  (the relay caches (computation, operands) pairs);
- block_until_ready is NOT trustworthy through the tunnel; each call
  folds into a carried scalar and the final host readback of that
  scalar forces completion of the whole chain;
- a SYNCHRONOUS call (dispatch + host readback of its result) costs
  ~13 ms through the tunnel. Back-to-back dispatches whose results are
  NOT read back do pipeline: the host enqueue (~1-2 ms) overlaps device
  execution, so a chained per-frame loop sustains within ~25% of the
  device rate (measured r4: video chain 536 fps vs scan 686 fps).
  Each timed call here is still ONE jitted lax.scan over a stack of
  batches - a single dispatch covers the whole measured workload, which
  removes the enqueue-overlap ambiguity entirely rather than arguing
  about it (examples/video_pipeline.py prints both protocols).
"""

import json
import sys
import time


def _measure(fn, make_buf, n_scan, rounds, jax, jnp):
    """Median per-batch seconds: each timed call is one dispatch of a
    jitted scan over ``n_scan`` stacked batches. ``make_buf(r)`` builds
    round r's [n_scan, ...] stack of never-seen-before content; stacks
    are created and dropped per round so deep scans (which amortize the
    ~13 ms dispatch) don't hold rounds x n_scan batches in HBM at once."""

    def chain(xs, acc):
        return jax.lax.scan(lambda a, x: (fn(x, a), None), acc, xs)[0]

    chain = jax.jit(chain)
    buf = make_buf(0)
    jax.block_until_ready(buf)
    _ = int(chain(buf, jnp.int32(0)))  # compile + warmup
    times = []
    for r in range(rounds):
        del buf
        buf = make_buf(r + 1)
        jax.block_until_ready(buf)
        t0 = time.perf_counter()
        # forced host readback of the scan-carried scalar: completion
        # of the whole chain, one tunnel dispatch
        _ = int(chain(buf, jnp.int32(0)))
        times.append((time.perf_counter() - t0) / n_scan)
    times.sort()
    return times[len(times) // 2]


def _emit(metric, value, unit="megapixels/sec/chip", vs=None):
    """One JSON line. ``vs`` defaults to value / the 1000 MP/s north-star
    (BASELINE.json); quality metrics pass an explicit ratio."""
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 3 if value < 100 else 1),
                "unit": unit,
                "vs_baseline": round(value / 1000.0 if vs is None else vs, 3),
            }
        ),
        flush=True,
    )


def bench_histeq(jax, jnp):
    from oclcomputervision_tpu.ops.pallas.histeq_pallas import histeq_global_pallas

    # Batched serving geometry: 256 resident 768x1280 frames per batch,
    # 16 batches per scan dispatch (4 GB uint8 resident, one round live
    # at a time; dispatch overhead < 3% of the chain).
    batch, h, w = 256, 768, 1280
    n_scan, rounds = 16, 3
    keys = jax.random.split(jax.random.PRNGKey(0), rounds + 1)
    gen = jax.jit(
        lambda k: jax.random.randint(
            k, (n_scan, batch, h, w), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )

    fn = lambda x, acc: acc + jnp.sum(histeq_global_pallas(x), dtype=jnp.int32)
    median_s = _measure(fn, lambda r: gen(keys[r]), n_scan, rounds, jax, jnp)
    print("histeq warmup+measure done", file=sys.stderr, flush=True)
    _emit("fused_histeq_global_throughput", batch * h * w / 1e6 / median_s)


def bench_raisr(jax, jnp, scale=2):
    import numpy as np

    from oclcomputervision_tpu.models.raisr import RaisrModel
    from oclcomputervision_tpu.ops.raisr import raisr_upsample
    from oclcomputervision_tpu.utils.assets import asset_path

    model = RaisrModel.load(
        asset_path(f"raisr_filters_x{scale}.npz"), fidelity="full"
    )
    filters = jnp.asarray(model.filters, jnp.float32)
    cfg = model.cfg

    # 4MP-class output geometry per scale (x2: 1024^2 LR -> 2048^2 HR),
    # batch 16 per scan step, 16 steps per dispatch; natural-image
    # content so the hash buckets are realistic.
    batch, h, w = 16, 2048 // scale, 2048 // scale
    n_scan, rounds = 16, 3
    from oclcomputervision_tpu.utils import load_gray

    base = load_gray("lenna.png")
    tile = np.tile(base, (-(-h // base.shape[0]), -(-w // base.shape[1])))[:h, :w]
    rng = np.random.default_rng(0)

    def make_buf(r):
        stack = []
        for j in range(n_scan):
            # unique content per batch: random roll + additive noise
            sh = rng.integers(0, 512, 2)
            noisy = tile.astype(np.int16) + rng.integers(-8, 9, tile.shape)
            img = np.clip(np.roll(noisy, sh, (0, 1)), 0, 255).astype(np.uint8)
            stack.append(np.stack([img] * batch))
        return jnp.asarray(np.stack(stack))

    # the sum runs over the FULL output (a strided subsample would let
    # XLA dead-code-eliminate part of the re-interleave glue)
    fn = lambda x, acc: acc + jnp.sum(raisr_upsample(x, filters, cfg), dtype=jnp.int32)
    median_s = _measure(fn, make_buf, n_scan, rounds, jax, jnp)
    print(f"raisr x{scale} warmup+measure done", file=sys.stderr, flush=True)
    _emit(
        f"raisr_x{scale}_throughput",
        batch * h * w * cfg.scale**2 / 1e6 / median_s,
    )


def bench_pyr_down(jax, jnp):
    """Gaussian pyramid primitive (pyramid/pyramid.py:12's cv2.pyrDown
    twin): one 2x blur+decimate level on batched 768x1280 luma."""
    from oclcomputervision_tpu.ops.pyramid import pyr_down

    batch, h, w = 256, 768, 1280
    n_scan, rounds = 16, 3
    keys = jax.random.split(jax.random.PRNGKey(3), rounds + 1)
    gen = jax.jit(
        lambda k: jax.random.randint(
            k, (n_scan, batch, h, w), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )
    fn = lambda x, acc: acc + jnp.sum(
        pyr_down(x, 2, batched=True), dtype=jnp.int32
    )
    median_s = _measure(fn, lambda r: gen(keys[r]), n_scan, rounds, jax, jnp)
    print("pyr_down done", file=sys.stderr, flush=True)
    _emit("pyr_down_2x_throughput", batch * h * w / 1e6 / median_s)


def bench_me_pyramid_time(jax, jnp):
    """Wall + device time of the full seeded-EXACT 3-level VGA pyramid
    (me_test.py:76-90's coarse-to-fine flow, bit-identical search).

    Round-5 protocol (each point measured on the tunneled v5e):
    - The pyramid driver is JITTED end to end - tracer-safe dynamic
      rebasing (me_pallas rebase_bound='dynamic') keeps the per-band
      rebased scan cost under jit, so the whole 3-level flow is ONE
      tunnel dispatch instead of the eager driver's ~15-20 (r4 wall
      230 ms at 34 ms device).
    - The headline wall reads the flow back as int8. The exact
      pyramid's flow is integer-valued (integer full search + integer
      median; no subpixel on this path) and analytically bounded by
      motion.exact_flow_bound = (2**levels - 1) * (search//2) = 49 px
      at these defaults, so the int8 cast is lossless by construction
      - and still ASSERTED bit-equal to the f32 program's output
      before anything is timed. Motivation: a null dispatch through
      the tunnel costs ~23 ms and the [480,640,2] f32 readback ~65 ms
      more (D2H ~37 MB/s), so at 34 ms device time the transfer
      dominates the wall; serving the integer flow in int8 quarters
      it. The int16 and f32 readback walls are emitted alongside as
      me_exact_pyramid_wall_i16_ms / me_exact_pyramid_wall_f32_ms.
    - The EAGER driver resolves per-draw (seed_bound, rebase_bound)
      buckets from the concrete seed; a never-seen bucket compiles a
      fresh kernel variant through the remote compile service (22-51 s
      measured). Six warmup draws from the same rng stream populate
      the bucket set first, and the metric is a median of 5 - compile
      storms are compile time, not serving time. Timed calls still use
      never-seen buffers (the relay caches (computation, operands)).
    vs_baseline is the round-2 target ratio 100 ms / value (>1 = beat
    the target)."""
    import numpy as np

    from oclcomputervision_tpu.ops.motion import estimate_motion_pyramid
    from oclcomputervision_tpu.utils.profiling import profile_device

    g0, g1 = _me_frames(jnp)
    rng = np.random.default_rng(7)

    def _pyr(a, b):
        return estimate_motion_pyramid(a, b, 3, method="exact", smooth=9)[-1]

    run_jit = jax.jit(_pyr)
    run_jit_i16 = jax.jit(lambda a, b: _pyr(a, b).astype(jnp.int16))
    run_jit_i8 = jax.jit(lambda a, b: _pyr(a, b).astype(jnp.int8))

    def run_eager(a, b):
        return _pyr(a, b)

    def fresh(r):
        a = jnp.asarray(
            np.clip(np.asarray(g0, np.int16) + rng.integers(-4, 5, g0.shape), 0, 255
                    ).astype(np.uint8))
        b = jnp.asarray(
            np.clip(np.asarray(g1, np.int16) + rng.integers(-4, 5, g1.shape), 0, 255
                    ).astype(np.uint8))
        jax.block_until_ready((a, b))
        return a, b

    def med_wall(run, rounds=3):
        times = []
        for _r in range(rounds):
            a, b = fresh(_r)
            t0 = time.perf_counter()
            _ = np.asarray(run(a, b))  # full host readback completes the flow
            times.append(time.perf_counter() - t0)
        times.sort()
        return times[len(times) // 2] * 1e3

    # warmups: compile every level's kernels + all three jit programs,
    # and assert both integer readbacks are lossless flow encodings
    from oclcomputervision_tpu.ops.motion import exact_flow_bound

    assert exact_flow_bound(3, 15) <= 127  # int8 holds by construction
    f32 = np.asarray(run_jit(g0, g1))
    i16 = np.asarray(run_jit_i16(g0, g1))
    i8 = np.asarray(run_jit_i8(g0, g1))
    assert i16.dtype == np.int16 and np.array_equal(f32, i16.astype(np.float32)), \
        "int16 flow readback must be bit-equal to the f32 program"
    assert i8.dtype == np.int8 and np.array_equal(f32, i8.astype(np.float32)), \
        "int8 flow readback must be bit-equal to the f32 program"
    for _w in range(6):  # populate the eager driver's bucket set
        _ = np.asarray(run_eager(*fresh(100 + _w)))
    wall_ms = med_wall(run_jit_i8)
    i16_wall_ms = med_wall(run_jit_i16)
    f32_wall_ms = med_wall(run_jit)
    eager_wall_ms = med_wall(run_eager, rounds=5)
    a, b = fresh(99)
    dev_ms = profile_device(run_jit, a, b).pop("__total__")
    print("me exact pyramid time done", file=sys.stderr, flush=True)
    _emit("me_exact_pyramid_wall_ms", wall_ms,
          unit="ms (lower is better)", vs=100.0 / wall_ms)
    _emit("me_exact_pyramid_wall_i16_ms", i16_wall_ms,
          unit="ms (lower is better)", vs=100.0 / i16_wall_ms)
    _emit("me_exact_pyramid_wall_f32_ms", f32_wall_ms,
          unit="ms (lower is better)", vs=100.0 / f32_wall_ms)
    _emit("me_exact_pyramid_eager_wall_ms", eager_wall_ms,
          unit="ms (lower is better)", vs=100.0 / eager_wall_ms)
    if dev_ms and dev_ms > 0.0:  # CPU traces carry no "XLA Ops" timeline
        _emit("me_exact_pyramid_device_ms", dev_ms,
              unit="ms (lower is better)", vs=100.0 / dev_ms)


def bench_me_pyramid_batched(jax, jnp):
    """Serving-shape throughput: the jitted exact 3-level pyramid over
    [B, H, W] VGA stacks (batch 4), scan-dispatch protocol. Unit is
    finest-level megapixels per second; vs_baseline is the round-2
    100 ms/pyramid wall target expressed as a per-chip rate: one VGA
    pyramid (0.307 MP finest level) per 100 ms = 3.07 MP/s. Batching
    beats that rate by amortizing dispatch + readback over the stack,
    not by parallel device speedup - the exact search is compute-bound
    (~34 ms/frame device), so the device-side ceiling at batch 4 is
    ~9 MP/s and a 4-stream target (12.3) would be unreachable on one
    chip by construction; the earlier r5 probe that used 12.3 recorded
    8.094 = 2.64x the per-chip target under CPU contention."""
    import numpy as np

    from oclcomputervision_tpu.ops.motion import estimate_motion_pyramid

    g0, g1 = _me_frames(jnp)
    h, w = g0.shape
    bsz, n_scan, rounds = 4, 4, 3
    key = jax.random.PRNGKey(11)

    def make_buf(r):
        k0, k1 = jax.random.split(jax.random.fold_in(key, r))
        j0 = (jax.random.uniform(k0, (n_scan, bsz, h, w)) * 9 - 4).astype(jnp.int16)
        j1 = (jax.random.uniform(k1, (n_scan, bsz, h, w)) * 9 - 4).astype(jnp.int16)
        a = jnp.clip(g0.astype(jnp.int16)[None, None] + j0, 0, 255).astype(jnp.uint8)
        b = jnp.clip(g1.astype(jnp.int16)[None, None] + j1, 0, 255).astype(jnp.uint8)
        return a, b

    def fn(ab, acc):
        a, b = ab
        flow = estimate_motion_pyramid(a, b, 3, method="exact", smooth=9)[-1]
        return acc + jnp.sum(flow, dtype=jnp.float32).astype(jnp.int32)

    median_s = _measure(fn, make_buf, n_scan, rounds, jax, jnp)
    mps = bsz * h * w / median_s / 1e6
    print("me exact pyramid batched done", file=sys.stderr, flush=True)
    _emit("me_exact_pyramid_batched_throughput", mps, vs=mps / 3.07)


def bench_video(jax, jnp):
    """Serving-style video pipeline fps (fused histeq + fast dense flow
    per 768x1280 frame), measured with the SCAN discipline: one
    dispatch covers the whole frame chain, so the number is sustained
    device throughput, not async-enqueue wall time."""
    from oclcomputervision_tpu.ops.histeq import histeq_global
    from oclcomputervision_tpu.ops.motion import estimate_motion_vector

    h, w = 768, 1280
    n_scan, rounds = 64, 3
    key = jax.random.PRNGKey(5)
    base = (jax.random.uniform(key, (h + 384, w + 384)) * 255).astype(jnp.uint8)

    def make_buf(r):
        # panning synthetic scene; never-seen content per round via the
        # round-dependent offset
        fs = jnp.stack(
            [
                jax.lax.dynamic_slice(base, (2 * i + 3 * r, 3 * i), (h, w))
                for i in range(n_scan + 1)
            ]
        )
        return fs[:-1], fs[1:]

    def fn(pc, acc):
        prev, cur = pc
        eq = histeq_global(cur)
        mv = estimate_motion_vector(prev, cur, 15, 5, method="fast")
        return acc + (
            jnp.sum(eq, dtype=jnp.int32)
            + jnp.sum(mv, dtype=jnp.float32).astype(jnp.int32)
        )

    median_s = _measure(fn, make_buf, n_scan, rounds, jax, jnp)
    print("video pipeline done", file=sys.stderr, flush=True)
    _emit("video_pipeline_fps", 1.0 / median_s, unit="frames/sec",
          vs=(1.0 / median_s) / 30.0)  # vs 30-fps real-time serving bar


def bench_localeq(jax, jnp):
    """BASELINE config 3: local-block (CLAHE-style) histeq, fused
    direct-block Pallas kernels, 768x1280 @ 256x256 blocks."""
    from oclcomputervision_tpu.ops.histeq import histeq_local_block

    batch, h, w = 64, 768, 1280
    n_scan, rounds = 8, 3
    keys = jax.random.split(jax.random.PRNGKey(1), rounds + 1)
    gen = jax.jit(
        lambda k: jax.random.randint(
            k, (n_scan, batch, h, w), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )
    fn = lambda x, acc: acc + jnp.sum(
        histeq_local_block(x, 0.5, 0.05, 3.0, (256, 256)), dtype=jnp.int32
    )
    median_s = _measure(fn, lambda r: gen(keys[r]), n_scan, rounds, jax, jnp)
    print("localeq done", file=sys.stderr, flush=True)
    _emit("histeq_local_block_throughput", batch * h * w / 1e6 / median_s)


def bench_resize(jax, jnp):
    """BASELINE config 2: bilinear/bicubic 1024^2 -> 2048^2 (output MP)."""
    from oclcomputervision_tpu.ops.interpolation import resize_uint8

    batch, h, w = 16, 1024, 1024
    n_scan, rounds = 16, 3
    keys = jax.random.split(jax.random.PRNGKey(2), 2 * (rounds + 1))
    gen = jax.jit(
        lambda k: jax.random.randint(
            k, (n_scan, batch, h, w, 1), 0, 256, jnp.int32
        ).astype(jnp.uint8)
    )
    for mi, method in enumerate(("bilinear", "bicubic")):
        fn = lambda x, acc: acc + jnp.sum(
            resize_uint8(x, (2 * h, 2 * w), method), dtype=jnp.int32
        )
        median_s = _measure(
            fn, lambda r: gen(keys[mi * (rounds + 1) + r]), n_scan, rounds, jax, jnp
        )
        print(f"resize {method} done", file=sys.stderr, flush=True)
        _emit(f"resize_{method}_2x_throughput", batch * h * w * 4 / 1e6 / median_s)


def _me_frames(jnp):
    import numpy as np

    from oclcomputervision_tpu.utils import load_gray

    g0 = load_gray("frame10.png")
    g1 = load_gray("frame11.png")
    return g0, g1


def bench_me(jax, jnp):
    """BASELINE config 4: dense block-matching ME at VGA (input MP/s of
    frame pairs), fast (masked-shift warp) and exact (S-map) modes."""
    import numpy as np

    from oclcomputervision_tpu.ops.motion import estimate_motion_vector

    g0, g1 = _me_frames(jnp)
    h, w = g0.shape
    rng = np.random.default_rng(0)

    # fast runs ~8 ms/batch since the fused Pallas kernel - scan 16
    # batches per dispatch so the ~13 ms tunnel dispatch stays < 10%
    for mode, batch, n_scan in (("fast", 16, 16), ("exact", 8, 4)):
        def make_buf(r):
            # unique content: additive noise over the Middlebury pair
            stack0, stack1 = [], []
            for j in range(n_scan):
                n0 = rng.integers(-4, 5, (batch, h, w))
                n1 = rng.integers(-4, 5, (batch, h, w))
                stack0.append(np.clip(g0.astype(np.int16) + n0, 0, 255).astype(np.uint8))
                stack1.append(np.clip(g1.astype(np.int16) + n1, 0, 255).astype(np.uint8))
            return jnp.asarray(np.stack(stack0)), jnp.asarray(np.stack(stack1))

        def fn(x, acc):
            f0, f1 = x
            mv = estimate_motion_vector(f0, f1, 15, 5, method=mode)
            return acc + jnp.sum(mv, dtype=jnp.float32).astype(jnp.int32)

        median_s = _measure(fn, make_buf, n_scan, 3, jax, jnp)
        print(f"me {mode} done", file=sys.stderr, flush=True)
        _emit(f"me_{mode}_throughput", batch * h * w / 1e6 / median_s)


def bench_me_epe(jax, jnp):
    """ME quality: endpoint error vs flow10.flo for the 3-level pyramid
    (exact and fast modes, smooth=9). vs_baseline = zero-flow EPE / EPE
    (improvement factor over predicting no motion)."""
    import numpy as np

    from oclcomputervision_tpu.ops.motion import estimate_motion_pyramid
    from oclcomputervision_tpu.utils import read_flo
    from oclcomputervision_tpu.utils.assets import asset_path
    from oclcomputervision_tpu.utils.metrics import epe

    g0, g1 = _me_frames(jnp)
    gt = read_flo(asset_path("flow10.flo"))
    zero = float(epe(np.zeros_like(gt), gt))
    for mode in ("exact", "fast"):
        flows = estimate_motion_pyramid(g0, g1, 3, method=mode, smooth=9)
        e = float(epe(np.asarray(flows[-1]), gt))
        _emit(f"me_{mode}_pyramid_epe", e, unit="px (lower is better)", vs=zero / e)
    # quality extension: 12 rounds of median-regularized equiangular
    # subpixel refinement per level (refine_flow_subpixel), for both the
    # reference-faithful exact pyramid and the hybrid (fast+refine)
    # schedule - the hybrid+subpixel interaction is driver-captured
    # since r5 (VERDICT r4 item 5; benchmarks/hybrid_subpixel_probe.py)
    for mode in ("exact", "fast"):
        flows = estimate_motion_pyramid(
            g0, g1, 3, method=mode, smooth=9, subpixel=12
        )
        e = float(epe(np.asarray(flows[-1]), gt))
        _emit(
            f"me_{mode.replace('fast', 'hybrid')}_subpixel_pyramid_epe",
            e, unit="px (lower is better)", vs=zero / e,
        )


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")

    # supporting metrics first; the two north-star lines stay at the
    # tail (the driver parses from the end)
    bench_localeq(jax, jnp)
    bench_resize(jax, jnp)
    bench_pyr_down(jax, jnp)
    bench_me(jax, jnp)
    bench_me_epe(jax, jnp)
    bench_me_pyramid_time(jax, jnp)
    bench_me_pyramid_batched(jax, jnp)
    bench_video(jax, jnp)
    bench_raisr(jax, jnp, scale=3)
    bench_raisr(jax, jnp, scale=4)
    bench_histeq(jax, jnp)
    bench_raisr(jax, jnp, scale=2)


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
