"""Uncontended re-measure of the jitted exact-pyramid wall readbacks.

Compiles the f32 / int16 / int8 single-dispatch pyramid programs and
prints the median wall of each (never-seen buffers, full host readback),
plus the bit-equality assertions bench.py makes before timing. Run after
any change to the pyramid driver, and once per fresh /tmp cache so the
driver's bench capture never eats a first-compile storm.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")
    from oclcomputervision_tpu.ops.motion import (
        estimate_motion_pyramid,
        exact_flow_bound,
    )
    from oclcomputervision_tpu.utils import asset_path, load_gray

    g0 = jnp.asarray(load_gray(asset_path("frame10.png")))
    g1 = jnp.asarray(load_gray(asset_path("frame11.png")))
    rng = np.random.default_rng(7)

    def _pyr(a, b):
        return estimate_motion_pyramid(a, b, 3, method="exact", smooth=9)[-1]

    assert exact_flow_bound(3, 15) <= 127
    runs = {
        "f32": jax.jit(_pyr),
        "i16": jax.jit(lambda a, b: _pyr(a, b).astype(jnp.int16)),
        "i8": jax.jit(lambda a, b: _pyr(a, b).astype(jnp.int8)),
    }

    def fresh():
        a = jnp.asarray(np.clip(
            np.asarray(g0, np.int16) + rng.integers(-4, 5, g0.shape), 0, 255
        ).astype(np.uint8))
        b = jnp.asarray(np.clip(
            np.asarray(g1, np.int16) + rng.integers(-4, 5, g1.shape), 0, 255
        ).astype(np.uint8))
        jax.block_until_ready((a, b))
        return a, b

    t0 = time.perf_counter()
    outs = {k: np.asarray(r(g0, g1)) for k, r in runs.items()}
    print(f"compile+first-run {time.perf_counter() - t0:.1f}s", flush=True)
    for k in ("i16", "i8"):
        assert np.array_equal(outs["f32"], outs[k].astype(np.float32)), k
    print("int16/int8 readbacks bit-equal to f32", flush=True)

    for k, r in runs.items():
        times = []
        for _ in range(5):
            a, b = fresh()
            t0 = time.perf_counter()
            _ = np.asarray(r(a, b))
            times.append((time.perf_counter() - t0) * 1e3)
        times.sort()
        print(f"{k}: median {times[2]:.1f} ms  (all {[f'{t:.1f}' for t in times]})",
              flush=True)


if __name__ == "__main__":
    main()
