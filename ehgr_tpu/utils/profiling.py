"""Profiling/tracing utilities (SURVEY.md §5: the reference has only
wall-clock AverageMeters; here we expose real device traces).

* ``trace(logdir)`` — context manager around ``jax.profiler`` for
  TensorBoard-viewable TPU traces of the jitted step.
* ``time_fn`` — steady-state wall-clock timing with warmup + percentiles
  (used by bench.py and perf tests).
* ``annotate`` — TraceAnnotation passthrough for labeling host spans.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Sequence

import numpy as np

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10,
            percentiles: Sequence[int] = (50, 90, 99)) -> Dict[str, float]:
    """Time a device function; blocks on outputs.  Returns ms stats."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append((time.perf_counter() - t0) * 1000.0)
    arr = np.asarray(times)
    out = {"mean_ms": float(arr.mean()), "min_ms": float(arr.min())}
    for p in percentiles:
        out[f"p{p}_ms"] = float(np.percentile(arr, p))
    return out
