"""Benchmark harness: fused global histogram equalization throughput.

Measures the flagship fused op (tiled histogram -> transfer LUT ->
gather, one jitted kernel) on device-resident uint8 batches, steady
state, on whatever device JAX exposes (TPU under the driver).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "megapixels/sec/chip", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star of
1000 MP/s/chip on TPU v5e (the reference publishes no numbers of its
own - BASELINE.md).
"""

import json
import sys
import time


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")

    from oclcomputervision_tpu.ops.pallas.histeq_pallas import (
        histeq_global_pallas as histeq_global,
    )

    # Batched serving geometry: 256 resident 768x1280 frames per call
    # (252MB uint8). The per-call host dispatch through the axon tunnel
    # is ~2.6 ms - at small batches the measurement is dispatch-bound
    # (batch 8 reads ~1-2 GP/s for a ~9 GP/s device rate), so the batch
    # is sized to amortize it.
    batch, h, w = 256, 768, 1280
    # Timing discipline for the tunneled TPU in this environment:
    # - every timed call gets a never-seen-before device-resident buffer
    # - block_until_ready is NOT trustworthy through the tunnel; each
    #   call folds into a carried scalar and the final host readback of
    #   that scalar forces completion of the whole chain.
    n_bufs, rounds = 4, 3
    keys = jax.random.split(jax.random.PRNGKey(0), n_bufs * (rounds + 1))
    gen = jax.jit(
        lambda k: jax.random.randint(k, (batch, h, w), 0, 256, jnp.int32).astype(
            jnp.uint8
        )
    )
    bufs = [gen(k) for k in keys]
    jax.block_until_ready(bufs)

    fn = jax.jit(
        lambda x, acc: acc + jnp.sum(histeq_global(x), dtype=jnp.int32)
    )
    # compile + warmup
    acc = jnp.int32(0)
    for b in bufs[:n_bufs]:
        acc = fn(b, acc)
    _ = int(acc)
    print("warmup done", file=sys.stderr, flush=True)

    times = []
    for r in range(rounds):
        chunk = bufs[(r + 1) * n_bufs : (r + 2) * n_bufs]
        acc = jnp.int32(0)
        t0 = time.perf_counter()
        for b in chunk:
            acc = fn(b, acc)
        _ = int(acc)  # forced host readback of the dependency chain
        times.append((time.perf_counter() - t0) / n_bufs)
    times.sort()
    median_s = times[len(times) // 2]

    megapixels = batch * h * w / 1e6
    mps = megapixels / median_s
    print(
        json.dumps(
            {
                "metric": "fused_histeq_global_throughput",
                "value": round(mps, 1),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(mps / 1000.0, 3),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
