"""Profiling: jax.profiler traces + step timing.

The reference has no training-path profiling (SURVEY.md §5) — only ad-hoc
wall-clock timers in preprocessing benchmarks.  Here tracing is first-class:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of device + host activity.
- ``StepTimer``: cheap wall-clock EMA of step latency with throughput
  reporting (blocks on the device result once per report interval only,
  so it does not serialise the pipeline).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0 = time.perf_counter()

    def tick(self) -> float:
        now = time.perf_counter()
        dt = now - self._t0
        self._t0 = now
        self.avg = dt if self.avg is None else (
            self.ema * self.avg + (1 - self.ema) * dt
        )
        return dt

    def steps_per_sec(self) -> float:
        return 1.0 / self.avg if self.avg else 0.0
