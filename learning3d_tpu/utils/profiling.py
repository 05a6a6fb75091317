"""Tracing / profiling helpers (SURVEY.md §5.1 — the reference has only
dead ``timeit`` print helpers; here: real xprof traces + throughput
counters)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context; open the result with xprof/tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Rolling clouds/sec + step-time meter for train loops."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self._items = 0
        self._steps = 0

    def update(self, batch_size: int):
        self._items += batch_size
        self._steps += 1

    @property
    def clouds_per_sec(self):
        dt = time.perf_counter() - self._t0
        return self._items / dt if dt > 0 else 0.0

    @property
    def ms_per_step(self):
        dt = time.perf_counter() - self._t0
        return 1000.0 * dt / self._steps if self._steps else 0.0
