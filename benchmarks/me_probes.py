"""Device microprobes for the exact-ME kernel's suspected cost terms.

The fused exact kernel (ops/pallas/me_pallas.py) measures ~150 MP/s at
VGA against a ~500 MP/s naive-VPU-op-count roofline. Its two op classes
that the naive count prices at 1x are both sublane-dimension shuffles:

A) "subshift": per-build reads `rot[vx, pl.ds(vy + vmax, f0_rows), :]`
   at a sublane offset (vy + vmax) % 8 != 0 for most vy — a
   cross-vreg sublane relayout (the RAISR tap lesson: these, not lane
   shifts, are the expensive ones). Candidate replacements: sublane
   roll over an aligned read, or staging row-shifted planes once.
B) "valueslice": boxsum's row sums `d[k : k + bh]` slice a VALUE at
   sublane offsets 1..patch-1. Candidate replacement: sublane roll +
   offset-0 slice.

Usage: python benchmarks/me_probes.py [subshift] [valueslice]
ONE process at a time on the TPU (tunnel serializes poorly).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _run(label, fn, *args, ref=None):
    from oclcomputervision_tpu.utils.profiling import profile_device

    t0 = time.time()
    try:
        out = np.asarray(fn(*args)[0])
    except Exception as e:
        print(f"{label:12s}: FAIL {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None, None
    # (tot, out) returned for interactive use; scripted runs read stdout
    tot = profile_device(fn, *args).pop("__total__")
    err = float(np.abs(out - ref).max()) if ref is not None else 0.0
    print(
        f"{label:12s}: {tot:7.3f} ms device "
        f"(compile+run {time.time() - t0:.0f}s) maxerr={err:.1f}",
        flush=True,
    )
    return tot, out


def probe_subshift():
    """17 reads of [40, 768] from [17, 56, 768] planes at sublane
    offsets 0..16, x STEPS: slice vs roll vs aligned lower bound."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, HE, H, W, STEPS = 17, 56, 40, 768, 64

    def make(mode):
        def kernel(v_ref, out_ref):
            acc = None
            for p in range(P):
                if mode == "slice":
                    t = v_ref[p, pl.ds(p, H), :]
                elif mode == "roll":
                    # shift rows up by p == roll down by HE - p, take head
                    full = v_ref[p]
                    t = (
                        pltpu.roll(full, HE - p, 0)[:H]
                        if p % 8
                        else v_ref[p, pl.ds(p, H), :]
                    )
                else:  # aligned lower bound (wrong values, cost floor)
                    t = v_ref[p, pl.ds((p // 8) * 8, H), :]
                acc = t if acc is None else acc + t
            out_ref[0] = acc

        return kernel

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.integers(0, 255, (P, HE, W)), dtype=jnp.int32)
    ref = None
    for mode in ("slice", "roll", "aligned"):
        fn = jax.jit(
            lambda v, m=mode: pl.pallas_call(
                make(m),
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((P, HE, W), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM)
                ],
                out_specs=pl.BlockSpec(
                    (1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((STEPS, H, W), jnp.int32),
            )(v)
        )
        tot, out = _run(f"sub_{mode}", fn, v,
                        ref=ref if mode == "roll" else None)
        if mode == "slice":
            ref = out


def probe_valueslice():
    """boxsum row-sum forms on a [40, 768] VALUE: misaligned value
    slices (current) vs sublane roll + aligned head slice."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HE, BH, W, PATCH, NB, STEPS = 40, 32, 768, 5, 24, 16

    def make(mode):
        def kernel(f0_ref, f1_ref, out_ref):
            f0 = f0_ref[:]
            acc = None
            for b in range(NB):
                d = jnp.abs(f0 - f1_ref[b])
                if mode == "slice":
                    v = d[:BH]
                    for k in range(1, PATCH):
                        v = v + d[k : k + BH]
                else:  # subroll
                    v = d[:BH]
                    for k in range(1, PATCH):
                        v = v + pltpu.roll(d, HE - k, 0)[:BH]
                s = v
                for j in range(1, PATCH):
                    s = s + pltpu.roll(v, W - j, 1)
                acc = s if acc is None else acc + s
            out_ref[0] = acc

        return kernel

    rng = np.random.default_rng(1)
    f0 = jnp.asarray(rng.integers(0, 255, (HE, W)), dtype=jnp.int32)
    f1 = jnp.asarray(rng.integers(0, 255, (NB, HE, W)), dtype=jnp.int32)
    ref = None
    for mode in ("slice", "subroll"):
        fn = jax.jit(
            lambda f0, f1, m=mode: pl.pallas_call(
                make(m),
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((HE, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((NB, HE, W), lambda i: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, BH, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((STEPS, BH, W), jnp.int32),
            )(f0, f1)
        )
        tot, out = _run(f"box_{mode}", fn, f0, f1, ref=ref)
        if mode == "slice":
            ref = out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")
    print(jax.devices(), flush=True)
    what = sys.argv[1:] or ["subshift", "valueslice"]
    if "subshift" in what:
        probe_subshift()
    if "valueslice" in what:
        probe_valueslice()


if __name__ == "__main__":
    main()
