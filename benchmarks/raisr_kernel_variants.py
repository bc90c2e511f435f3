"""A/B harness for the RAISR Pallas kernel variants (device ms).

Reproduces the ROADMAP round-3 measurements on real TPU hardware:

  apply (per phase, 4x 4MP images):     hash (per 16x 4MP images):
    base    2.629 ms                      halfplane      9.383 ms
    g2      2.294 ms                      ratio          8.933 ms
    g4      2.056 ms                      ratio_sym      8.660 ms
    g4w     2.027 ms                      ratio_sym_roll 8.276 ms
    g4r     2.110 ms (lane-roll taps)     ratio_sym_roll_ns 7.987 <- default
    g4p     2.122 ms (double-Pm pipe)     diag_s1    2.532 ms (stage 1)
    g8p     4.126 ms (double-Pm pipe)     diag_s12   2.996 ms (stages 1-2)
    g8      1.910 ms (20 min compile)     diag_noeig 7.102 ms (blur only)
    g4s     1.906 ms (staged taps)
    g8s     1.747 ms <- default
    notaps  1.810 ms (diagnostic)
    nosel   2.395 ms (diagnostic)

Usage:
  python benchmarks/raisr_kernel_variants.py apply [variant ...]
  python benchmarks/raisr_kernel_variants.py hash  [mode ...]

Timing is trace-based device time (utils.profiling.profile_device), the
only trustworthy clock through the tunneled runtime. ONE process at a
time on the TPU; first compiles can take minutes through the remote
compile service (cached afterwards).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def bench_apply(variants):
    import jax
    import jax.numpy as jnp

    from oclcomputervision_tpu.ops.pallas import raisr_pallas as rp
    from oclcomputervision_tpu.utils.profiling import profile_device

    s, fl = 2, 11
    hp = rp.plane_halo(fl, s)
    nimg, h2, w2 = 4, 1024, 1024
    rng = np.random.default_rng(0)
    planes = jnp.asarray(
        rng.random((nimg, s * s, h2 + rp.HALO_ROWS, w2 + 128), dtype=np.float32)
    )
    bucket = jnp.asarray(rng.integers(0, 216, (nimg, h2, w2)).astype(np.int32))
    wmat_f = rng.standard_normal((rp.NB_PAD, 128)).astype(np.float32) * 0.1
    wmat_f[216:] = 0
    wmat_f[:, fl * fl :] = 0
    wmat = jnp.asarray(wmat_f).astype(jnp.bfloat16)

    ref = None
    for v in variants:
        fn = jax.jit(
            lambda p, b, w, v=v: rp._apply_phase(p, b, w, fl, s, 0, 0, hp, variant=v)
        )
        t0 = time.time()
        try:
            out = fn(planes, bucket, wmat)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"{v:8s}: FAIL {type(e).__name__}: {str(e)[:160]}", flush=True)
            continue
        tot = profile_device(fn, planes, bucket, wmat).pop("__total__")
        o = np.asarray(out)
        if v == "base" or ref is None:
            ref, err = o, 0.0
        else:
            err = float(np.abs(o - ref).max() / (np.abs(ref).max() + 1e-9))
        print(
            f"{v:8s}: {tot:7.3f} ms device per {nimg}x4MP phase "
            f"(compile+run {time.time() - t0:.0f}s) relerr={err:.2e}",
            flush=True,
        )


def bench_hash(modes):
    import jax
    import jax.numpy as jnp

    from oclcomputervision_tpu.ops.pallas.raisr_pallas import (
        HALO_ROWS,
        hash_planes_pallas,
        plane_halo,
    )
    from oclcomputervision_tpu.ops.pallas.upscale_pallas import upscale_planes_pallas
    from oclcomputervision_tpu.utils import load_gray
    from oclcomputervision_tpu.utils.config import RaisrConfig
    from oclcomputervision_tpu.utils.profiling import profile_device

    cfg = RaisrConfig(fidelity="full")
    hp = plane_halo(cfg.filter_len, cfg.scale, cfg.gauss_len)
    base = load_gray("lenna.png").astype(np.float32) / 255.0
    tile = np.tile(base, (2, 2))[:1024, :1024]
    imgs = jnp.asarray(np.stack([np.roll(tile, 5 * i, 0) for i in range(16)]))
    h2p = w2p = 1024
    planes = upscale_planes_pallas(imgs, cfg, h2p + HALO_ROWS, w2p + 128, hp)
    jax.block_until_ready(planes)

    ref = None
    for mode in modes:
        fn = jax.jit(
            lambda p, m=mode: hash_planes_pallas(p, cfg, h2p=h2p, angle_mode=m)
        )
        t0 = time.time()
        out = fn(planes)
        jax.block_until_ready(out)
        tot = profile_device(fn, planes).pop("__total__")
        o = np.asarray(out)
        agree = 1.0 if ref is None else float((o == ref).mean())
        if mode == "halfplane" or ref is None:
            ref = o
        print(
            f"hash {mode:10s}: {tot:7.3f} ms device per 16x4MP "
            f"(compile+run {time.time() - t0:.0f}s) agree={agree:.6f}",
            flush=True,
        )


def bench_psnr(modes, scales=(2, 3, 4)):
    """Score hash-kernel variants on the USER-VISIBLE criterion (VERDICT
    r3 item 5): frame11 PSNR through the full e2e pipeline, plus e2e
    device time at the 4MP-class bench geometry. The bucket-parity
    contract (>= 0.9999 agreement) is a self-imposed proxy; a variant
    that flips boundary-adjacent buckets but moves PSNR by
    |dPSNR| <= 0.02 dB is admissible as an opt-in perf mode if it buys
    >= 10% e2e throughput."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from oclcomputervision_tpu.models.raisr import RaisrModel
    from oclcomputervision_tpu.ops.raisr import raisr_upsample
    from oclcomputervision_tpu.utils import load_gray, psnr
    from oclcomputervision_tpu.utils.assets import asset_path
    from oclcomputervision_tpu.utils.profiling import profile_device

    report = np.asarray(load_gray("frame11.png"))
    base = load_gray("lenna.png").astype(np.float32)
    for s in scales:
        model = RaisrModel.load(
            asset_path(f"raisr_filters_x{s}.npz"), fidelity="full"
        )
        filters = jnp.asarray(model.filters, jnp.float32)
        # frame11 eval protocol (examples/train_banks.py degrade/quality)
        h, w = (report.shape[0] // s) * s, (report.shape[1] // s) * s
        hr = report[:h, :w]
        lr = (
            hr.reshape(h // s, s, w // s, s).mean(axis=(1, 3)).round()
            .astype(np.uint8)
        )
        # 4MP-class batched timing geometry (bench.py protocol)
        hb, wb = 2048 // s, 2048 // s
        tile = np.tile(base, (-(-hb // 512), -(-wb // 512)))[:hb, :wb]
        stack = jnp.asarray(
            np.stack([np.roll(tile, 7 * i, 0) for i in range(16)])
        ).astype(jnp.uint8)
        jax.block_until_ready(stack)
        base_psnr = None
        for mode in modes:
            cfg = dataclasses.replace(model.cfg, hash_mode=mode)
            fn = jax.jit(lambda x, c=cfg: raisr_upsample(x, filters, c))
            try:
                out = np.asarray(fn(jnp.asarray(lr)))
            except Exception as e:
                print(f"x{s} {mode:22s}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
                if mode == modes[0]:
                    # the FIRST mode is the declared baseline: without
                    # it every later dPSNR would silently anchor to a
                    # variant instead - print absolutes only
                    print(f"x{s}: baseline mode failed; dPSNR suppressed",
                          flush=True)
                continue
            p = psnr(out, hr)
            # e2e device time at the batched geometry: warm at the
            # profiled shape first, and force a real scalar readback
            # INSIDE the trace (tunnel block_until_ready is unreliable)
            fnb = jax.jit(
                lambda x, c=cfg: jnp.sum(
                    raisr_upsample(x, filters, c), dtype=jnp.int32
                )
            )
            _ = int(fnb(stack))  # compile + warm
            tot = profile_device(lambda: int(fnb(stack))).pop("__total__")
            if mode == modes[0]:
                base_psnr = p  # deltas anchor to the FIRST mode only
            d = f"d={p - base_psnr:+.4f}" if base_psnr is not None else "d=n/a"
            print(
                f"x{s} {mode:22s}: frame11 PSNR {p:.4f} dB "
                f"({d}), e2e {tot:7.3f} ms device "
                f"per 16 imgs of 4MP output",
                flush=True,
            )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")
    print(jax.devices(), flush=True)
    what = sys.argv[1] if len(sys.argv) > 1 else "apply"
    rest = sys.argv[2:]
    if what == "apply":
        bench_apply(rest or ["base", "g2", "g4", "g4w"])
    elif what == "hash":
        bench_hash(rest or ["halfplane", "ratio", "ratio_sym"])
    elif what == "psnr":
        bench_psnr(
            rest
            or [
                "ratio_sym_roll_ns",
                "ratio_sym_roll_ns_mm",
                "ratio_sym_roll_ns_mmx",
            ]
        )
    else:
        raise SystemExit(f"unknown target {what!r} (apply|hash|psnr)")


if __name__ == "__main__":
    main()
