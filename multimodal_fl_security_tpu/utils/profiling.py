"""Profiling and step-time instrumentation.

The reference records wall-clock only (SURVEY.md §5 — no profiler hooks).
Here rounds can be wrapped in jax.profiler traces and a StepTimer tracks
the north-star metric (rounds/min) directly.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region visible in a captured TPU profile (TensorBoard/xprof)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str):
    """Capture a device profile for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rounds/min tracker with warmup exclusion.

    Timing forces a host sync via a value fetch: on remote-attached
    platforms ``block_until_ready`` can return before execution finishes.
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.durations: List[float] = []
        self._count = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        if sync_value is not None:
            float(sync_value)  # device -> host fetch = hard sync
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.durations.append(dt)
        return dt

    @property
    def mean_seconds(self) -> float:
        return sum(self.durations) / len(self.durations) if self.durations else 0.0

    @property
    def rounds_per_min(self) -> float:
        m = self.mean_seconds
        return 60.0 / m if m > 0 else 0.0

    def summary(self) -> Dict[str, float]:
        return {
            "mean_round_seconds": self.mean_seconds,
            "rounds_per_min": self.rounds_per_min,
            "rounds_timed": float(len(self.durations)),
        }
