"""Multi-chip scaling: jax.sharding Mesh + shard_map strategies.

The reference is strictly single-device (one OpenCL queue, host-blocking
ev.wait() per dispatch - SURVEY.md §5 C15); scaling here is TPU-native:

- data parallelism (dp): batches of images sharded over the mesh; each
  op is already batch-first, so pjit-sharding the batch axis is enough.
- spatial parallelism (sp): one huge image sharded by rows; histograms
  are per-shard then psum'd over ICI (the tiny 256-bin reduce is the
  only collective), LUT application stays local. This is the analogue
  of sequence parallelism in this domain.
- tensor parallelism (tp): the RAISR filter bank (864 x 121 x 121
  normal-equation accumulators) sharded over buckets for the solve.

All collectives are XLA's (psum / all_gather) riding ICI; no DCN-level
communication exists at this scale.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh over the available devices (default: 1-D data mesh)."""
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices),)
    arr = np.asarray(devices)[: int(np.prod(shape))].reshape(shape)
    return Mesh(arr, tuple(axis_names))


def data_parallel(fn, mesh: Mesh, axis: str = "data"):
    """Shard a batch-first op over the mesh's data axis.

    fn maps [b, ...] -> [b, ...]; the wrapper accepts a global batch
    divisible by the axis size and runs fn on each shard.
    """
    return shard_map(
        fn,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(axis),
        check_vma=False,
    )


def histeq_global_sharded(
    gray: jnp.ndarray,
    mesh: Mesh,
    axis: str = "data",
    alpha: float = 1.0,
    punch: float = 0.05,
    clip: float = 2.0,
) -> jnp.ndarray:
    """Spatially-sharded global histeq: rows split over the mesh.

    Each device histograms its row shard, a psum (256 x int32 over ICI)
    builds the global histogram, every device computes the identical
    LUT, and applies it to its local rows. One collective total.
    """
    from oclcomputervision_tpu.ops.histeq import (
        apply_lut,
        calc_transfer_func,
        histogram256,
    )

    def shard_fn(g):
        hist = histogram256(g.reshape(-1))
        hist = jax.lax.psum(hist, axis)
        lut = calc_transfer_func(hist, alpha, punch, clip).astype(jnp.uint8)
        return apply_lut(g, lut)

    sharded = shard_map(
        shard_fn, mesh=mesh, in_specs=P(axis, None), out_specs=P(axis, None),
        check_vma=False,
    )
    return sharded(gray)


def raisr_train_step(
    patches: jnp.ndarray,
    targets: jnp.ndarray,
    fidx: jnp.ndarray,
    num_filters: int,
    filter_len: int,
    mesh: Mesh,
    dp_axis: str = "dp",
    tp_axis: str = "tp",
    chunk: int = 256,
    ridge: float = 0.03,
) -> jnp.ndarray:
    """One full distributed RAISR training step.

    dp: training pixels sharded over ``dp_axis``; every device streams
    its shard through the normal-equation accumulators (MXU matmuls in a
    lax.scan), then G/r/cnt are psum'd over ICI.
    tp: the per-bucket ridge solve is sharded over ``tp_axis`` (each
    device solves num_filters/tp buckets), then all_gather'd.

    Returns the filter bank [num_filters, filter_len, filter_len].
    """
    from oclcomputervision_tpu.models.raisr import accumulate_normal_eq, solve_filters

    tp = mesh.shape[tp_axis]
    assert num_filters % tp == 0, (num_filters, tp)

    def step(p, t, f):
        g, r, cnt = accumulate_normal_eq(p[0], t[0], f[0], num_filters, chunk)
        g = jax.lax.psum(g, dp_axis)
        r = jax.lax.psum(r, dp_axis)
        cnt = jax.lax.psum(cnt, dp_axis)
        # tp: solve only this device's bucket shard
        ti = jax.lax.axis_index(tp_axis)
        nb = num_filters // tp
        gs = jax.lax.dynamic_slice_in_dim(g, ti * nb, nb, axis=0)
        rs = jax.lax.dynamic_slice_in_dim(r, ti * nb, nb, axis=0)
        cs = jax.lax.dynamic_slice_in_dim(cnt, ti * nb, nb, axis=0)
        fs = solve_filters(gs, rs, cs, filter_len, ridge)
        return jax.lax.all_gather(fs, tp_axis, axis=0, tiled=True)

    n = patches.shape[0]
    dp = mesh.shape[dp_axis]
    assert n % dp == 0, (n, dp)
    # reshape to [dp, n/dp, ...] so the leading axis shards over dp and
    # is consumed inside the shard (tp devices replicate the data)
    ps = patches.reshape(dp, n // dp, -1)
    ts = targets.reshape(dp, n // dp)
    fs = fidx.reshape(dp, n // dp)

    sharded = shard_map(
        step,
        mesh=mesh,
        in_specs=(P(dp_axis), P(dp_axis), P(dp_axis)),
        out_specs=P(),
        check_vma=False,
    )
    return sharded(ps, ts, fs)
