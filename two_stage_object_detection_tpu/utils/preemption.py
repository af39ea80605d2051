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

    def __init__(self, signals=(signal.SIGTERM,), sync_every: int = 8):
        self._signals = tuple(signals)
        self._prev: dict = {}
        self._event = threading.Event()
        self._installed = False
        self._depth = 0            # nesting refcount: re-entry safe
        self._sync_every = max(int(sync_every), 1)
        self._polls = 0
        self._agreed = False       # last cross-process agreement

    def __enter__(self) -> "PreemptionGuard":
        # Nesting-safe: ``with PreemptionGuard() as g: train(guard=g)`` has
        # train() enter the guard a second time — only the OUTERMOST enter
        # installs handlers (else _prev would record the guard's own
        # _on_signal as the "previous" disposition and __exit__ would leave
        # SIGTERM bound to a dead guard forever).
        self._depth += 1
        if self._depth > 1:
            return self
        try:
            for s in self._signals:
                self._prev[s] = signal.signal(s, self._on_signal)
            self._installed = True
        except ValueError:
            # Either not on the main thread (CPython forbids handler
            # installation there) or an invalid signal partway through the
            # list: restore whatever was already swapped so no signal is
            # left bound to this guard without a recorded previous handler.
            for s, h in self._prev.items():
                signal.signal(s, h)
            self._prev.clear()
            log.debug("PreemptionGuard: signal handlers not installed "
                      "(request() still works)")
        return self

    def __exit__(self, *exc) -> None:
        self._depth = max(self._depth - 1, 0)
        if self._depth == 0 and self._installed:
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
        > 1``.  The cross-process agreement is a one-bool allgather issued
        only every ``sync_every``-th poll (a blocking host roundtrip per
        step would re-tax the HBM-resident fast path), so a preemption is
        acted on within ``sync_every`` steps of delivery.  On synced runs
        the return value is ALWAYS the last agreement, never the local
        flag alone — every process must leave the loop at the same step
        for the coordinated checkpoint save, so poll counts (one per step)
        stay identical across processes by construction.
        """
        if sync is None:
            import jax
            sync = jax.process_count() > 1
        if not sync:
            return self.requested
        if self._agreed:
            return True
        self._polls += 1
        if self._polls % self._sync_every:
            return False
        from jax.experimental import multihost_utils
        flags = multihost_utils.process_allgather(
            np.asarray(self.requested, np.bool_))
        self._agreed = bool(np.any(flags))
        return self._agreed
