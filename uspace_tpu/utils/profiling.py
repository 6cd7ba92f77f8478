"""Profiling and step-time accounting.

The reference has no tracing at all (SURVEY.md §5 — tqdm bars only).
Here: a jax.profiler trace context for TensorBoard-viewable device
profiles, and a StepTimer producing steps/sec + images/sec the training
loop logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """``with trace("/tmp/tb"):`` captures a device profile for the
    enclosed steps (open with TensorBoard / xprof). No-op if log_dir is
    falsy."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Windowed step/images throughput with compile-step exclusion."""

    def __init__(self, batch_size: int, skip_first: int = 1):
        self.batch_size = batch_size
        self.skip = skip_first
        self._t0 = None
        self._n = 0

    def tick(self) -> Optional[dict]:
        if self.skip > 0:  # compile steps pollute the window
            self.skip -= 1
            return None
        if self._t0 is None:
            self._t0 = time.perf_counter()
            self._n = 0
            return None
        self._n += 1
        dt = time.perf_counter() - self._t0
        return {
            "steps_per_sec": self._n / dt,
            "imgs_per_sec": self._n * self.batch_size / dt,
        }

    def reset(self):
        self._t0 = None
        self._n = 0
