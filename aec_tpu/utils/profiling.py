"""Profiling / tracing utilities.

Replaces the reference's hand-run thop FLOPs script (testModel.py:105-113)
and wall-clock timers (train1.py:204-222) with XLA-native tooling:

- :func:`flops` — compiled-HLO cost analysis (the XLA equivalent of thop);
- :func:`trace` — ``jax.profiler`` trace context writing TensorBoard-format
  traces (SURVEY §5.1: the reference has no tracer at all);
- :func:`timed` — per-step wall timing with forced completion (device
  readback), the pattern the benchmarks use.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import jax
import numpy as np


def flops(fn: Callable, *args, **kwargs) -> dict[str, float]:
    """Compile ``fn`` and return XLA's cost analysis (flops, bytes accessed).

    Values are per-invocation estimates from the optimized HLO.
    """
    compiled = jax.jit(fn).lower(*args, **kwargs).compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
    }


@contextlib.contextmanager
def trace(log_dir: str):
    """Profiler trace context: view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable[..., Any], *args, iters: int = 3, warmup: int = 1) -> float:
    """Median seconds per call, forcing completion via host readback."""

    def run():
        out = fn(*args)
        jax.block_until_ready(out)
        # force a scalar readback: some transports complete lazily
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
