"""Device microprobes for round-3 perf levers (trace-based device ms).

A) int8 vs bf16 MXU rate at the RAISR apply matmul shape
   ([NB_PAD, 128] @ [128, N]): v5e lists int8 MACs at 2x the bf16
   rate; if Mosaic delivers it, an int8 serving mode for the apply
   kernel halves its exposed floor.
B) pltpu.roll vs lane-misaligned pl.ds slice reads at the hash
   horizontal-blur shape: the blur's misaligned 1028-lane reads were
   measured ~9x an aligned read (ROADMAP); a roll over a lane-aligned
   buffer is the candidate replacement.

Usage: python benchmarks/micro_probes.py [matmul] [shift]
ONE process at a time on the TPU (tunnel serializes poorly).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def probe_matmul():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from oclcomputervision_tpu.utils.profiling import profile_device

    M, K, N, STEPS = 224, 128, 8192, 256

    def run(dtype, acc_dtype, label):
        def kernel(w_ref, p_ref, out_ref):
            resp = jax.lax.dot_general(
                w_ref[:],
                p_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            out_ref[0] = resp[:, :128]

        rng = np.random.default_rng(0)
        if dtype == jnp.int8:
            w = jnp.asarray(rng.integers(-127, 128, (M, K)), dtype=jnp.int8)
            p = jnp.asarray(rng.integers(-127, 128, (K, N)), dtype=jnp.int8)
        else:
            w = jnp.asarray(rng.standard_normal((M, K)), dtype=dtype)
            p = jnp.asarray(rng.standard_normal((K, N)), dtype=dtype)

        fn = jax.jit(
            lambda w, p: pl.pallas_call(
                kernel,
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec((M, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((K, N), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(
                    (1, M, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((STEPS, M, 128), acc_dtype),
            )(w, p)
        )
        t0 = time.time()
        try:
            out = fn(w, p)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"matmul {label:12s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            return
        tot = profile_device(fn, w, p).pop("__total__")
        macs = STEPS * 256 * K * N  # M pads to 256 on the MXU
        print(
            f"matmul {label:12s}: {tot:7.3f} ms device for {STEPS} steps "
            f"of [224,{K}]@[{K},{N}] -> {macs / tot / 1e9:.1f} GMAC/ms "
            f"(compile+run {time.time() - t0:.0f}s)",
            flush=True,
        )

    run(jnp.bfloat16, jnp.float32, "bf16->f32")
    run(jnp.int8, jnp.int32, "int8->i32")


def probe_shift():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from oclcomputervision_tpu.utils.profiling import profile_device

    # hash stage-3 shape: 12 (t, plane) buffers, 64 rows, reads of width
    # 1024 at lane offsets 0..4; 5 shifts x 12 buffers = 60 reads/step
    P, H, WE, W, STEPS = 12, 64, 1152, 1024, 16
    ks = [0.1, 0.2, 0.4, 0.2, 0.1]

    def make(mode):
        def kernel(v_ref, out_ref):
            acc = None
            for p in range(P):
                for co in range(5):
                    if mode == "slice":
                        t = v_ref[p, :, pl.ds(co, W)]
                    elif mode == "roll":
                        # left-shift by co == roll right by WE - co
                        full = v_ref[p]
                        t = (
                            pltpu.roll(full, WE - co, 1)[:, :W]
                            if co
                            else full[:, :W]
                        )
                    else:  # aligned lower bound: offset-0 reads only
                        t = v_ref[p, :, pl.ds(0, W)]
                    term = ks[co] * t
                    acc = term if acc is None else acc + term
            out_ref[0] = acc

        return kernel

    rng = np.random.default_rng(0)
    v = jnp.asarray(rng.standard_normal((P, H, WE)), dtype=jnp.float32)
    outs = {}
    for mode in ("slice", "roll", "aligned"):
        fn = jax.jit(
            lambda v, m=mode: pl.pallas_call(
                make(m),
                grid=(STEPS,),
                in_specs=[
                    pl.BlockSpec(
                        (P, H, WE), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
                    )
                ],
                out_specs=pl.BlockSpec(
                    (1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
                ),
                out_shape=jax.ShapeDtypeStruct((STEPS, H, W), jnp.float32),
            )(v)
        )
        t0 = time.time()
        try:
            out = fn(v)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"shift {mode:8s}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
            continue
        outs[mode] = np.asarray(out[0])
        tot = profile_device(fn, v).pop("__total__")
        err = (
            float(np.abs(outs[mode] - outs["slice"]).max())
            if "slice" in outs
            else 0.0
        )
        print(
            f"shift {mode:8s}: {tot:7.3f} ms device for {STEPS} steps of "
            f"60x[64,1024] shifted reads (compile+run {time.time() - t0:.0f}s) "
            f"maxerr_vs_slice={err:.2e}",
            flush=True,
        )


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")
    print(jax.devices(), flush=True)
    what = sys.argv[1:] or ["matmul", "shift"]
    if "matmul" in what:
        probe_matmul()
    if "shift" in what:
        probe_shift()


if __name__ == "__main__":
    main()
