"""Measured NEGATIVE: int8-domain one-hot + int8 MXU for the histogram kernel.

Result (TPU v5e, 64x 768x1280): bf16/f32 2.074 ms, int8/int32 2.187 ms
per 63 MP - the int8 form is 5.4% SLOWER (VPU lanes are 32-bit, so the
int8 compares do not pack, and the matmul was not the bottleneck).
Kept as a reproducible record (ROADMAP "do not redo").

"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/ocv_tpu_jax_cache")
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from oclcomputervision_tpu.ops.pallas import histeq_pallas as hq
from oclcomputervision_tpu.utils.profiling import profile_device

TILE_ROWS, TILE_LANES, TILE_P = hq.TILE_ROWS, hq.TILE_LANES, hq.TILE_P

def _onehot_i8(x_tile):
    x = x_tile.astype(jnp.int32)
    x_rep = jnp.broadcast_to(x[:, None, :], (TILE_ROWS, 16, x.shape[1])).reshape(
        128, x.shape[1])
    nib = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0) % 16
    hi1 = ((x_rep >> 4) == nib).astype(jnp.int8)
    lo1 = ((x_rep & 15) == nib).astype(jnp.int8)
    return hi1, lo1

def _hist_kernel_i8(x_ref, out_ref):
    c = pl.program_id(1)
    hi1, lo1 = _onehot_i8(x_ref[0, 0])
    m = jax.lax.dot_general(
        hi1, lo1, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    @pl.when(c == 0)
    def _():
        out_ref[0] = m
    @pl.when(c != 0)
    def _():
        out_ref[0] += m

def hist256_i8(x):
    b, n = x.shape
    xt = x.reshape(b, n // TILE_P, TILE_ROWS, TILE_LANES)
    m = pl.pallas_call(
        _hist_kernel_i8,
        grid=(b, n // TILE_P),
        in_specs=[pl.BlockSpec((1, 1, TILE_ROWS, TILE_LANES),
                               lambda i, c: (i, c, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 128, 128), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 128, 128), jnp.int32),
    )(xt)
    # blockdiag extract: hist[16h+l] = sum_r m[16r+h, 16r+l]
    z = jnp.stack([m[:, 16 * r : 16 * r + 16, 16 * r : 16 * r + 16]
                   for r in range(TILE_ROWS)], 1)
    return z.sum(axis=1).reshape(b, 256)

print(jax.devices(), flush=True)
rng = np.random.default_rng(0)
batch = jnp.asarray(rng.integers(0, 256, (64, 768 * 1280), dtype=np.uint8))

f_base = jax.jit(lambda x: hq.hist256_pallas(x))
f_i8 = jax.jit(hist256_i8)
a = np.asarray(f_base(batch)); b8 = np.asarray(f_i8(batch))
want = np.stack([np.bincount(np.asarray(batch[i]), minlength=256) for i in range(4)])
print("base exact:", np.array_equal(a[:4], want), " i8 exact:", np.array_equal(b8[:4].astype(np.int64), want), flush=True)
for name, f in (("bf16/f32", f_base), ("int8/int32", f_i8)):
    p = profile_device(f, batch)
    print(f"{name}: {p.pop('__total__'):7.3f} ms device per 63 MP", flush=True)
