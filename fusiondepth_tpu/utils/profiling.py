"""Profiling hooks: jax.profiler traces + per-step timing.

Replaces the reference's ad-hoc wall-clock probes (trainer.py:239-250,
completor.py:220-246) with structured tooling: a trace context that dumps a
TensorBoard-compatible profile, and a StepTimer for examples/s with
compile-step exclusion.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard's profile tab
    or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Tracks steady-state examples/s, skipping warmup/compile steps."""

    def __init__(self, batch_size: int, skip_first: int = 2):
        self.batch_size = batch_size
        self.skip_first = skip_first
        self.reset()

    def reset(self):
        self._n_steps = 0
        self._t0: Optional[float] = None
        self._counted = 0

    def step(self):
        self._n_steps += 1
        if self._n_steps == self.skip_first:
            self._t0 = time.perf_counter()
        elif self._n_steps > self.skip_first:
            self._counted += 1

    @property
    def examples_per_sec(self) -> float:
        if self._t0 is None or self._counted == 0:
            return 0.0
        dt = time.perf_counter() - self._t0
        return self._counted * self.batch_size / max(dt, 1e-9)
