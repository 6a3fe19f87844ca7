"""Observability: profiler traces + throughput meters.

The reference has no tracing/profiling at all (SURVEY.md §5 — only an unused
``time.time()`` per epoch).  This module supplies the TPU-native equivalents:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` emitting a
    TensorBoard-loadable XPlane trace of the steps inside it.
  * ``annotate(name)`` — ``jax.profiler.TraceAnnotation`` wrapper so named
    regions (data loading, init phase, train step) show up on the timeline.
  * ``StepMeter`` — wall-clock images/sec meter with exponential smoothing
    and a ``summary()`` dict for the logger.
"""
from __future__ import annotations

import time
from contextlib import contextmanager
from typing import Optional

import jax


@contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


class StepMeter:
    """Tracks step wall-clock and images/sec (call ``tick`` after each
    synchronised step)."""

    def __init__(self, images_per_step: int, smoothing: float = 0.9):
        self.images_per_step = images_per_step
        self.smoothing = smoothing
        self._last: Optional[float] = None
        self._ema: Optional[float] = None
        self.steps = 0
        self.total_time = 0.0

    def start(self):
        self._last = time.perf_counter()

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.total_time += dt
            self.steps += 1
            self._ema = dt if self._ema is None else (
                self.smoothing * self._ema + (1 - self.smoothing) * dt)
        self._last = now

    @property
    def images_per_sec(self) -> float:
        if not self._ema:
            return 0.0
        return self.images_per_step / self._ema

    def summary(self) -> dict:
        avg = self.total_time / max(self.steps, 1)
        return {
            "steps": self.steps,
            "sec_per_step": avg,
            "images_per_sec": self.images_per_step / avg if avg else 0.0,
            "images_per_sec_ema": self.images_per_sec,
        }
