"""Graceful-preemption guard: SIGTERM -> durable mid-epoch checkpoint.

Beyond the reference, which only has epoch-boundary crash-resume
(tools/builder.py:97-145): a preempted run there loses the entire in-flight
epoch. TPU VMs are routinely preempted (spot/maintenance events deliver
SIGTERM with a grace period), so the runners poll this guard at optimizer-step
boundaries; when a preemption is requested they write ckpt-last with the
data-iterator cursor ({epoch, next_batch}) and return. ``--resume`` then
continues INSIDE the interrupted epoch at the exact next batch.

The resumed run is bit-exact with an uninterrupted one: per-step RNG streams
fold ``state.step`` into the root key (train_state.step_rngs), the loader's
index order is a pure function of (seed, epoch) (datasets/loader.py:_indices),
and state.step itself is checkpointed — pinned by tests/test_preemption.py.

Test hook: ``ACT_TPU_PREEMPT_AT_STEP=<n>`` triggers the guard once ``n``
optimizer steps have run this process, exercising the full save/exit path
deterministically (signal delivery in an e2e test is racy).
"""
from __future__ import annotations

import os
import signal
import threading
from typing import Optional


class PreemptionGuard:
    def __init__(self):
        self._requested = threading.Event()
        self._installed = False
        self._prev_handlers = {}
        at = os.environ.get("ACT_TPU_PREEMPT_AT_STEP")
        self._at_step: Optional[int] = int(at) if at else None

    def install(self, signals=(signal.SIGTERM,)):
        """Register the handlers (main thread only; idempotent)."""
        if self._installed:
            return self
        for sig in signals:
            self._prev_handlers[sig] = signal.signal(sig, self._on_signal)
        self._installed = True
        return self

    def uninstall(self):
        for sig, prev in self._prev_handlers.items():
            signal.signal(sig, prev)
        self._prev_handlers.clear()
        self._installed = False

    def _on_signal(self, signum, frame):
        self._requested.set()

    def trigger(self):
        self._requested.set()

    def reset(self):
        self._requested.clear()

    @property
    def requested(self) -> bool:
        return self._requested.is_set()

    def check(self, steps_done: Optional[int] = None) -> bool:
        """True once a preemption save should happen. ``steps_done`` feeds the
        ACT_TPU_PREEMPT_AT_STEP test hook (count of optimizer steps so far)."""
        if (self._at_step is not None and steps_done is not None
                and steps_done >= self._at_step):
            self._requested.set()
        return self._requested.is_set()


# Process-wide guard: entry points install() it, runners poll it. Library
# users who never install() pay nothing — check() is a flag read.
GUARD = PreemptionGuard()
