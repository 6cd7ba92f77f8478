"""Graceful-preemption handling for long training runs.

TPU fleets preempt: maintenance events, autoscaling, and SLURM
requeues deliver SIGTERM with a short grace window. The reference has
no handling at all — a killed `accelerate launch` run loses everything
since its last periodic save (`/root/reference/train_lfm.py:139-149`).
Here a signal merely latches a flag; the training loop checks it at
step boundaries, writes one final checkpoint, and returns cleanly, so
resume loses at most the in-flight step (and, with the loader's
``infinite(start_step=...)`` fast-forward, is bit-exact with an
uninterrupted run — proven in tests/test_loop.py).

Two detection paths compose in the loop:

- ``GracefulShutdown`` (this module): per-process POSIX signals. Cloud
  TPU maintenance events and SLURM deliver the signal to EVERY host, so
  each host reaches the same save-and-exit branch; the orbax save
  itself is multihost-coordinated.
- ``CheckpointManager.reached_preemption(step)``: orbax's sync point on
  the JAX distributed runtime's preemption notice — the fully
  synchronized path when running under ``jax.distributed`` with a
  coordinator that forwards preemption notices.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable


class GracefulShutdown:
    """Context manager latching SIGTERM (and optionally others) into a
    flag checked at step boundaries.

    The handler does no real work on purpose: checkpoint writes from a
    signal frame can re-enter arbitrary interrupted code (allocator,
    orbax async machinery) and deadlock. Installing handlers is only
    legal from the main thread; elsewhere this degrades to an inert
    guard (``requested`` stays False) rather than raising, so library
    code can use it unconditionally.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self.signals = tuple(signals)
        self.requested = False
        self._prev = {}

    def _handler(self, signum, frame):
        self.requested = True

    def __enter__(self) -> "GracefulShutdown":
        if threading.current_thread() is threading.main_thread():
            for s in self.signals:
                self._prev[s] = signal.signal(s, self._handler)
        return self

    def __exit__(self, *exc) -> bool:
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        self._prev = {}
        return False
