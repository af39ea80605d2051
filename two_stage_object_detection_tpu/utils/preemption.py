"""Graceful-preemption handling for training (SIGTERM -> save -> resume).

Cloud TPU spot/preemptible slices deliver SIGTERM with a short grace
window before the hardware is reclaimed.  The reference has no recovery
story at all: its ``_last`` checkpoint is written only at the very END of
a run (``/root/reference/train/train.py:136-143``), so a preempted job
loses everything since the last explicit save.  Here ``train()`` enters a
:class:`PreemptionGuard`: the signal handler only sets a flag (safe in a
signal context), the epoch loop polls it at step boundaries (a host flag
read — free), and on request the driver saves the full ``_last``
checkpoint (params, batch stats, optimiser moments, step counter) and
returns cleanly so ``train(resume=True)`` continues.

Multi-controller runs: signal delivery is per-process and skewed, but the
coordinated Orbax save requires every process to hand over IDENTICAL
state.  :meth:`PreemptionGuard.should_stop` therefore ORs the flag across
processes (one tiny ``process_allgather`` per poll) so everyone breaks at
the same step boundary.
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)


class PreemptionGuard:
    """Context manager turning SIGTERM into a cooperative stop flag.

    Entering installs handlers for ``signals`` (default: SIGTERM, the
    cloud preemption notice) and restores the previous handlers on exit.
    When entered off the main thread — where CPython forbids handler
    installation (e.g. ``train()`` driven from a server worker thread) —
    the guard degrades gracefully: signals keep their previous behaviour
    and only the programmatic :meth:`request` path is live.
    """

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._prev: dict = {}
        self._event = threading.Event()
        self._installed = False

    def __enter__(self) -> "PreemptionGuard":
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._on_signal)
            self._installed = True
        except ValueError:
            self._prev.clear()
            log.debug("PreemptionGuard: not on the main thread; signal "
                      "handlers not installed (request() still works)")
        return self

    def __exit__(self, *exc) -> None:
        if self._installed:
            for s, h in self._prev.items():
                signal.signal(s, h)
            self._prev.clear()
            self._installed = False

    def _on_signal(self, signum, frame) -> None:
        # only set a flag: logging/IO is unsafe inside a signal handler is
        # a myth for CPython's deferred handlers, but keep the work minimal
        self._event.set()
        log.warning("PreemptionGuard: signal %d — saving at the next step "
                    "boundary", signum)

    def request(self) -> None:
        """Programmatic graceful stop (same path as the signal)."""
        self._event.set()

    @property
    def requested(self) -> bool:
        """This process's local flag (no cross-process agreement)."""
        return self._event.is_set()

    def should_stop(self, sync: Optional[bool] = None) -> bool:
        """Poll the flag; agree across processes on multi-controller runs.

        ``sync=None`` (default) syncs exactly when ``jax.process_count()
        > 1``.  The collective is a one-bool allgather — negligible next
        to a train step, and required so every process leaves the loop at
        the SAME step before the coordinated checkpoint save.
        """
        if sync is None:
            import jax
            sync = jax.process_count() > 1
        if not sync:
            return self.requested
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray(self.requested, np.bool_))
        return bool(np.any(flags))
