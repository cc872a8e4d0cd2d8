"""Profiling / tracing utilities (SURVEY.md §5: the reference had none).

`trace()` wraps `jax.profiler` so any block of the training/MPC loop can be
captured as a TensorBoard-viewable trace; `timed` gives quick wall-clock
numbers with proper `block_until_ready` semantics; `flops_estimate` reads
the XLA cost analysis of a jitted function for roofline sanity checks.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a profiler trace: view with TensorBoard's profile plugin.

    >>> with trace("/tmp/tr"):
    ...     train_iteration(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 1,
          **kwargs) -> float:
    """Mean wall-clock seconds per call (device-synchronized)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops_estimate(jitted_fn, *args) -> dict:
    """XLA cost analysis of a jitted function: flops / bytes accessed.

    Use with `timed` for roofline checks:
    achieved_flops = cost['flops'] / timed(...)"""
    lowered = jitted_fn.lower(*args)
    compiled = lowered.compile()
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return dict(cost)
    except Exception:
        return {}
