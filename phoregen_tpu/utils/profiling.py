"""Profiling hooks: jax.profiler traces + per-step timing.

The reference has no profiler integration (SURVEY.md §5.1 — only coarse
epoch wall-clock); this makes tracing a first-class feature of the TPU build:
wrap any region in `profile_trace(logdir)` and load the result in
TensorBoard's profile plugin / Perfetto.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str, enabled: bool = True):
    """Capture a jax.profiler trace of the enclosed region."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup skip and simple stats."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.times: List[float] = []
        self._t0: Optional[float] = None
        self._n = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.skip_first:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {"mean_s": 0.0, "min_s": 0.0, "steps": 0}
        return {"mean_s": sum(self.times) / len(self.times),
                "min_s": min(self.times), "steps": len(self.times)}
