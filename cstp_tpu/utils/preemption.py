"""Graceful preemption: SIGTERM -> finish the current step, checkpoint, stop.

Cloud TPU maintenance events and spot-VM reclaims deliver SIGTERM with a
short grace window. The reference has no recovery story at all (SURVEY §5:
"a crashed rank kills the job; manual recovery only"); our ``--auto_resume``
picks up the newest ``save_{E}`` checkpoint, and this module makes sure such
a checkpoint EXISTS at preemption time instead of losing up to
``--ckpt_every_epochs`` (reference cadence: every 100 epochs,
main_byol.py:132) of work.

Two regimes:

* single-process: a plain Python signal handler sets a flag that the train
  loop checks after every optimizer step.
* multi-process: every host must stop at the SAME step, or the surviving
  hosts deadlock in the next cross-host collective. ``jax.distributed``'s
  coordination service provides exactly this agreement — the SIGTERM'd
  host's notice propagates through the coordinator and
  ``reached_preemption_sync_point(step_id)`` returns True on ALL hosts at
  the same ``step_id`` (the mechanism Orbax preemption checkpointing uses).
  In that regime the C++ sync manager owns SIGTERM, so no Python handler is
  installed.
"""

from __future__ import annotations

import signal
import threading
from typing import Iterable

import jax


def _has_preemption_service() -> bool:
    """True iff jax.distributed's coordination client exposes a live
    preemption sync manager (created by ``jax.distributed.initialize()``
    unless ``jax_enable_preemption_service`` is off)."""
    try:
        from jax._src import distributed

        return distributed.global_state.preemption_sync_manager is not None
    except Exception:  # pragma: no cover - internal layout shift
        return False


class PreemptionGuard:
    """Install a SIGTERM flag (single-process) or poll the jax coordination
    service's preemption sync point (multi-process).

    Usage::

        guard = PreemptionGuard(enabled=True)
        for step: ...
            if guard.requested(global_step):
                save_checkpoint(...); break
        guard.close()
    """

    def __init__(self, enabled: bool = True,
                 signals: Iterable[int] = (signal.SIGTERM,)):
        self.enabled = bool(enabled)
        self._event = threading.Event()
        self._old = {}
        self._multi = jax.process_count() > 1
        self._sync_service = self._multi and _has_preemption_service()
        if not self.enabled or self._sync_service:
            # multi-process with a live coordination service: the C++
            # PreemptionSyncManager owns SIGTERM — installing a Python
            # handler on top would shadow it
            return
        for sig in signals:
            try:
                self._old[sig] = signal.signal(sig, self._on_signal)
            except ValueError:
                # not the main thread (e.g. a test runner worker): the
                # sync-point/flag fallback still works, just unsignalled
                pass

    # -- internal -----------------------------------------------------------
    def _on_signal(self, signum, frame):  # pragma: no cover - trivial
        self._event.set()

    # -- API ----------------------------------------------------------------
    def requested(self, step_id: int) -> bool:
        """True once a graceful stop should happen. ``step_id`` must be
        monotonically increasing across calls (global step counter); in the
        multi-process regime it is the agreement point all hosts stop at."""
        if not self.enabled:
            return False
        if self._sync_service:
            try:
                from jax.experimental import multihost_utils

                return bool(
                    multihost_utils.reached_preemption_sync_point(step_id))
            except Exception:
                # service went away mid-run: degrade to the local flag
                # (no handler was installed, so this stops reporting —
                # better than desyncing hosts with a local-only stop)
                return self._event.is_set()
        return self._event.is_set()

    def close(self) -> None:
        """Restore any signal handlers this guard replaced."""
        for sig, old in self._old.items():
            try:
                signal.signal(sig, old)
            except ValueError:  # pragma: no cover
                pass
        self._old.clear()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
