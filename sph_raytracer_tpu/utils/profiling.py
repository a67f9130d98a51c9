"""Profiling helpers (SURVEY §5.1: the reference's only telemetry is a
tqdm bar; this adds jax.profiler traces and honest step timing).
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

__all__ = ["trace", "time_fn", "fetch_sync"]


@contextlib.contextmanager
def trace(logdir: str = "/tmp/sph_raytracer_tpu_trace"):
    """``with profiling.trace(): ...`` — capture a jax.profiler trace
    viewable in TensorBoard / Perfetto."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def fetch_sync(x):
    """Force device completion.  ``block_until_ready`` can return before
    execution finishes on relayed/remote device platforms; fetching data
    is the only reliable sync."""
    import jax

    leaves = jax.tree.leaves(x)
    return [np.asarray(l.ravel()[:1]) for l in leaves if hasattr(l, "ravel")]


def time_fn(f: Callable, *args, iters: int = 10, warmup: int = 1,
            baseline_iters: int = 2) -> float:
    """Per-iteration wall time of ``f(*args)`` via two chained timed runs
    (the slope removes constant fetch/dispatch overhead)."""
    def run(n):
        o = None
        for _ in range(n):
            o = f(*args)
        fetch_sync(o)

    for _ in range(warmup):
        run(1)

    def slope(n_iters):
        t0 = time.time()
        run(baseline_iters)
        t1 = time.time() - t0
        t0 = time.time()
        run(baseline_iters + n_iters)
        t2 = time.time() - t0
        return (t2 - t1) / n_iters, t2 / (baseline_iters + n_iters)

    # relay dispatch jitter can exceed kernel_time*iters for fast fns,
    # driving the slope to ~0 or negative; retry longer, then fall back
    # to the chained-run average (an upper bound, but never zero).  The
    # fallback is announced so consumers comparing candidates (tune.py)
    # can see which numbers are slope-timed and which are averages that
    # still include the constant dispatch/fetch overhead.
    dt, avg = slope(iters)
    if dt <= 0:
        dt, avg = slope(4 * iters)
    if dt <= 0:
        import sys

        print(f"[time_fn] slope non-positive twice; falling back to "
              f"chained-run average {avg * 1e3:.3f} ms (upper bound: "
              f"includes constant dispatch/fetch overhead)",
              file=sys.stderr)
    return dt if dt > 0 else avg
