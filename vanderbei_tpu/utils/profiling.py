"""Profiling helpers.

The reference's profiling is bespoke stdout counters (nonz(L), arithmetic
op counts, clock()-based refactor timing — SURVEY.md section 5).  Here:

- `trace(dir)`: context manager around jax.profiler for TensorBoard-grade
  device traces;
- `time_fn(fn, *args, reps=...)`: robust wall timing of a jitted function.
  Each rep re-materializes the inputs as FRESH device buffers because the
  axon remote-execution layer memoizes identical (executable, buffer)
  launches — timing the same buffers twice measures the cache, not the
  chip.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fresh(args):
    out = []
    for a in args:
        if isinstance(a, (jnp.ndarray, np.ndarray)):
            out.append(jnp.asarray(np.asarray(a)))
        else:
            out.append(a)
    return tuple(out)


def time_fn(fn, *args, reps: int = 3, warmup: int = 1, **kwargs):
    """Best-of-reps wall seconds for fn(*args), defeating launch memoization.

    Returns (best_seconds, last_result).
    """
    result = None
    for _ in range(warmup):
        result = fn(*_fresh(args), **kwargs)
        jax.block_until_ready(result)
    best = float("inf")
    for _ in range(reps):
        fargs = _fresh(args)
        t0 = time.perf_counter()
        result = fn(*fargs, **kwargs)
        jax.block_until_ready(result)
        best = min(best, time.perf_counter() - t0)
    return best, result
