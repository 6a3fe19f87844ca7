"""Preemption-aware graceful shutdown.

TPU fleets preempt jobs with SIGTERM plus a grace window (maintenance
events, spot reclaims, batch-scheduler evictions).  The reference has no
story for this (SURVEY.md §5: no failure detection / elastic recovery);
here the trainers poll a :class:`PreemptionGuard` at each epoch boundary
and, when a signal has arrived, write a FULL-CONTRACT ``last.ckpt``
(models + optimizers + epoch) and return cleanly.  Paired with
``cfg.train.resume: "auto"`` the rerun picks the run back up — kill and
resume are then both hands-off.

The guard is a context manager so the previous signal disposition is
restored on exit (important under pytest and nested drivers).  A second
signal while shutdown is pending re-raises the default behaviour, so a
stuck save can still be killed.
"""
from __future__ import annotations

import signal
import threading


class PreemptionGuard:
    """Latches SIGTERM (and optionally others) into a poll-able flag."""

    def __init__(self, signals=(signal.SIGTERM,)):
        self._signals = tuple(signals)
        self._stop = threading.Event()
        self._prev: dict = {}

    def __enter__(self):
        for s in self._signals:
            try:
                self._prev[s] = signal.signal(s, self._handle)
            except ValueError:
                # not the main thread (e.g. a test harness) — polling still
                # works if someone calls request_stop() directly
                pass
        return self

    def __exit__(self, *exc):
        for s, prev in self._prev.items():
            signal.signal(s, prev)
        return False

    def _handle(self, signum, frame):
        if self._stop.is_set():
            # second signal: give up on graceful shutdown
            prev = self._prev.get(signum, signal.SIG_DFL)
            signal.signal(signum, prev)
            raise KeyboardInterrupt(f"second signal {signum} during shutdown")
        print(f"preemption signal {signum}: finishing this epoch, writing "
              "last.ckpt, then exiting (resume with cfg.train.resume='auto')",
              flush=True)
        self._stop.set()

    def request_stop(self):
        self._stop.set()

    @property
    def should_stop(self) -> bool:
        return self._stop.is_set()
