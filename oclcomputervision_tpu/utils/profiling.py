"""Timing helpers.

The reference returned per-dispatch elapsed milliseconds from OpenCL
event profiling (histeq/eq_opencl.py:6-7). The TPU equivalent keeps the
same "(result, elapsed_ms)" API shape, using block_until_ready wall time
under jit; jax.profiler traces can be enabled around any timed region.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple


def _block(x: Any) -> None:
    try:
        import jax

        jax.block_until_ready(x)
    except Exception:
        pass


def timed(fn: Callable, *args, **kwargs) -> Tuple[Any, float]:
    """Run fn(*args, **kwargs), blocking on the result; return (result, ms)."""
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    _block(out)
    return out, (time.perf_counter() - t0) * 1000.0


class Timer:
    """Accumulating wall-clock timer (milliseconds)."""

    def __init__(self) -> None:
        self.total_ms = 0.0
        self.count = 0

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.total_ms += (time.perf_counter() - t0) * 1000.0
        self.count += 1

    @property
    def mean_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Wrap a region in a jax.profiler trace (TPU timeline in TensorBoard)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_device(fn: Callable, *args, logdir: str | None = None) -> dict:
    """Per-op DEVICE milliseconds of one fn(*args) call, from a profiler
    trace: {op_name: ms}, plus '__total__'.

    This is the ground truth on remote/tunneled devices, where
    wall-clock timing carries per-dispatch overhead (~13 ms here) and
    block_until_ready is unreliable: the trace's "XLA Ops" timeline
    records what the chip actually executed. fn should be jitted and
    already warmed up (compile inside the trace would be recorded as
    dead air, not ops).
    """
    import glob
    import gzip
    import json
    import os
    import tempfile

    import jax

    logdir = logdir or tempfile.mkdtemp(prefix="ocv_profile_")
    with jax.profiler.trace(logdir):
        out = fn(*args)
        jax.block_until_ready(out)
    traces = sorted(
        glob.glob(os.path.join(logdir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not traces:  # pragma: no cover - backend without trace support
        return {"__total__": float("nan")}
    data = json.load(gzip.open(traces[-1]))
    threads = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            threads[(e["pid"], e["tid"])] = e["args"]["name"]
    # Collect the XLA Ops events per thread, then count only LEAF
    # intervals: a control-flow wrapper op (`cond`/`while`) spans its
    # executed branch/body, whose ops are traced as nested events on
    # the same timeline - summing both double-counts the wrapper
    # (measured: a jitted cond reported 27.74 ms for `cond.23.clone`
    # AND 27.70 ms for its `branch_5_fun` child). Intervals on one
    # thread are well-nested, so a stack walk finds parents.
    by_thread: dict = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in str(threads.get((e["pid"], e["tid"]), "")):
            continue
        by_thread.setdefault((e["pid"], e["tid"]), []).append(
            (e.get("ts", 0), e.get("dur", 0), e["name"])
        )
    return _sum_leaf_ops(by_thread)


def _sum_leaf_ops(by_thread: dict) -> dict:
    """{op: ms} + '__total__' over LEAF trace intervals only.

    ``by_thread`` maps thread key -> [(ts, dur, name), ...]. Intervals
    on one thread are well-nested, so a stack walk marks parents; only
    events with no contained child are counted (see profile_device).
    """
    per_op: dict = {}
    total = 0.0

    def _close(entry):
        nonlocal total
        _end, name, ms, has_child = entry
        if not has_child:
            per_op[name] = per_op.get(name, 0.0) + ms
            total += ms

    for events in by_thread.values():
        events.sort(key=lambda t: (t[0], -t[1]))
        stack: list = []  # [end_ts, name, ms, has_child]
        for ts, dur, name in events:
            while stack and ts >= stack[-1][0]:
                _close(stack.pop())
            if stack:
                stack[-1][3] = True
            stack.append([ts + dur, name, dur / 1e3, False])
        while stack:
            _close(stack.pop())
    per_op["__total__"] = total
    return per_op


def bench_op(fn: Callable, *args, warmup: int = 2, iters: int = 20) -> float:
    """Median wall-clock ms of fn(*args) after warmup, blocking each call."""
    for _ in range(warmup):
        _block(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    times.sort()
    return times[len(times) // 2]
