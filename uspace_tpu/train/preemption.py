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

- ``GracefulShutdown`` (this module): per-process POSIX signals — the
  SINGLE-HOST path. When ``jax.distributed`` is initialized it installs
  NOTHING: JAX's preemption service registers its own C-level SIGTERM
  handler at ``jax.distributed.initialize`` (``jax_enable_preemption_
  service`` defaults on), and a Python-level handler would clobber it,
  silently disabling the synchronized ``reached_preemption`` path and
  leaving hosts latching SIGTERM at skewed step boundaries (mismatched
  collectives in the final save). Multihost runs rely on path 2 alone.
- ``CheckpointManager.reached_preemption(step)``: orbax's sync point on
  the JAX distributed runtime's preemption notice — the fully
  synchronized path when running under ``jax.distributed`` with a
  coordinator that forwards preemption notices.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable


def _jax_distributed_active() -> bool:
    """True when ``jax.distributed.initialize`` has run in this process
    (the runtime then owns SIGTERM via its C-level preemption handler,
    which ``signal.signal`` would clobber and cannot restore)."""
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


class GracefulShutdown:
    """Context manager latching SIGTERM (and optionally others) into a
    flag checked at step boundaries. SINGLE-HOST only by design.

    The handler does no real work on purpose: checkpoint writes from a
    signal frame can re-enter arbitrary interrupted code (allocator,
    orbax async machinery) and deadlock. Installing handlers is only
    legal from the main thread; elsewhere this degrades to an inert
    guard (``requested`` stays False) rather than raising, so library
    code can use it unconditionally. Likewise, when ``jax.distributed``
    is initialized nothing is installed — the runtime's preemption
    service already owns SIGTERM and feeds the synchronized
    ``reached_preemption`` path, which a Python handler would disable
    (and ``__exit__`` could only restore Python's stale record of the
    disposition, not the runtime's C handler). If a previous *Python*
    handler exists, it is chained from ``_handler`` so this guard is
    transparent to surrounding latches.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self.signals = tuple(signals)
        self.requested = False
        self._prev = {}
        self.installed = False

    def _handler(self, signum, frame):
        self.requested = True
        prev = self._prev.get(signum)
        if callable(prev):
            prev(signum, frame)

    def __enter__(self) -> "GracefulShutdown":
        if (threading.current_thread() is threading.main_thread()
                and not _jax_distributed_active()):
            for s in self.signals:
                self._prev[s] = signal.signal(s, self._handler)
            self.installed = True
        return self

    def __exit__(self, *exc) -> bool:
        for s, prev in self._prev.items():
            # prev is None when the prior handler was installed at the C
            # level (not via the signal module): signal.signal(s, None)
            # raises, and SIG_DFL would be a lie either way — leave ours.
            if prev is not None:
                signal.signal(s, prev)
        self._prev = {}
        self.installed = False
        return False
