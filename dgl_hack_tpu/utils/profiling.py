"""Profiling/timing helpers.

Reference: the fork's ad-hoc instrumentation (time.time() +
cuda.synchronize in gatconv.py:122-161; NbAccess microbenchmarks).  TPU
version: block_until_ready timing contexts + jax.profiler trace capture,
plus the chained-iteration timer that cancels dispatch/readback latency
(essential under the remote-TPU tunnel, where per-call timing lies).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax


class Timer:
    """Accumulating wall timer with device sync."""

    def __init__(self):
        self.total = 0.0
        self.count = 0

    @contextlib.contextmanager
    def time(self, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.total += time.perf_counter() - t0
        self.count += 1

    @property
    def mean(self) -> float:
        return self.total / max(self.count, 1)


def timed_loop(fn: Callable, example, k_lo: int = 2, k_hi: int = 6,
               repeats: int = 2) -> float:
    """Seconds per iteration of ``fn`` measured via a jitted
    lax.fori_loop at two lengths — compile time, dispatch overhead and
    readback latency cancel in the difference."""
    import functools
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=1)
    def loop(x, iters):
        def body(i, h):
            return fn(h) * 0.9999
        return jax.lax.fori_loop(0, iters, body, x)[(0,) * example.ndim]

    def measure(k):
        float(loop(example, k))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(loop(example, k))
            best = min(best, time.perf_counter() - t0)
        return best

    return (measure(k_hi) - measure(k_lo)) / (k_hi - k_lo)


@contextlib.contextmanager
def trace(dirname: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    jax.profiler.start_trace(dirname)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
