"""Profiling: jax.profiler traces + simple step timers.

The reference had only print-based timing in op self-tests
(``tf_grouping.py:98-101``); here a context manager wraps
``jax.profiler.trace`` (view in TensorBoard/Perfetto) and ``StepTimer`` gives
EMA'd step times + points/sec for the training loop.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Device trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt

    def points_per_sec(self, points_per_step: int) -> float:
        return points_per_step / self.avg if self.avg else 0.0
