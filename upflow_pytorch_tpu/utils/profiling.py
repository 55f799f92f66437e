"""Profiling / tracing hooks.

The reference's only instrumentation is wall-clock prints
(`tools.time_clock`, /root/reference/utils/tools.py:327-348) and thop
param counting.  Here: a jax.profiler trace context, a block-until-ready
timing harness, and XLA cost analysis (see also ``utils.debug``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def start_server(port: int = 9999):
    """Start the profiler server for on-demand capture."""
    return jax.profiler.start_server(port)


def time_jitted(fn: Callable, *args, iters: int = 10, warmup: int = 2,
                force_transfer: bool = True) -> Dict[str, float]:
    """Robust latency measurement of a jitted callable.

    With ``force_transfer`` the result is reduced to a scalar and pulled to
    the host every iteration — required on remote-attached TPUs where
    ``block_until_ready`` alone can return before execution completes.
    """
    import jax.numpy as jnp

    if force_transfer:
        g = jax.jit(lambda *a: jax.tree_util.tree_reduce(
            lambda acc, x: acc + jnp.sum(x), fn(*a), jnp.float32(0)))

        def run():
            return float(g(*args))
    else:
        g = jax.jit(fn)

        def run():
            return jax.block_until_ready(g(*args))

    for _ in range(warmup):
        run()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    times.sort()
    return {"best_s": times[0], "median_s": times[len(times) // 2],
            "mean_s": sum(times) / len(times)}


def flops_of(fn: Callable, *args) -> Optional[float]:
    """XLA cost-model FLOPs of a jitted callable."""
    ca = jax.jit(fn).lower(*args).compile().cost_analysis()
    return ca.get("flops") if ca else None
