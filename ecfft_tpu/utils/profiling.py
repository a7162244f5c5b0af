"""Profiling & timing utilities (SURVEY.md §5 "tracing/profiling").

The reference's observability is criterion benches + wall-clock prints
(benches/*, examples/interp_eval.rs:13-31). The TPU equivalents:

- :func:`trace`: context manager around ``jax.profiler.trace`` producing
  TensorBoard-loadable device traces (per-kernel timing of the Pallas /
  XLA mod-mul pipelines),
- :func:`time_op`: block-until-ready wall timing with warmup,
- ``python -m ecfft_tpu.bench_suite``: the criterion-parity benchmark CLI
  (see ecfft_tpu/bench_suite.py).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device profile: ``with trace("/tmp/prof"): run()``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _block(x):
    return jax.tree_util.tree_map(
        lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
        x,
    )


def time_op(fn, *args, reps: int = 3, warmup: int = 1):
    """(best_seconds, result): times ``fn(*args)`` with device sync."""
    result = None
    for _ in range(warmup):
        result = _block(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        result = _block(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, result
