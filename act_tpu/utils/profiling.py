"""Profiling hooks (SURVEY.md §5: jax.profiler trace + batch/epoch meters).

Set ``ACT_TPU_PROFILE=/path/to/dir`` to capture a jax.profiler trace of steps
[start, stop) of any runner's train loop (viewable with TensorBoard's profile
plugin or xprof). Use :class:`StepTimer` for wall-clock batch/data-time meters
(the reference's AverageMeter pairs, tools/runner_pretrain.py:110-126).
"""
from __future__ import annotations

import os
import time
from typing import Optional


class TraceContext:
    """Traces steps [start, stop) when ACT_TPU_PROFILE is set; no-op otherwise."""

    def __init__(self, start: int = 10, stop: int = 15):
        self.dir = os.environ.get("ACT_TPU_PROFILE")
        self.start_step = start
        self.stop_step = stop
        self._active = False

    def step(self, i: int):
        import jax
        if not self.dir:
            return
        if i == self.start_step and not self._active:
            jax.profiler.start_trace(self.dir)
            self._active = True
        elif i == self.stop_step and self._active:
            jax.profiler.stop_trace()
            self._active = False

    def close(self):
        import jax
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


class StepTimer:
    """data-time / batch-time meters around a loader loop."""

    def __init__(self):
        from act_tpu.utils.meters import AverageMeter
        self.batch_time = AverageMeter()
        self.data_time = AverageMeter()
        self._tic = time.time()

    def data_loaded(self):
        self.data_time.update(time.time() - self._tic)

    def step_done(self):
        now = time.time()
        self.batch_time.update(now - self._tic)
        self._tic = now

    def summary(self) -> str:
        return (f"BatchTime={self.batch_time.avg():.3f}s "
                f"DataTime={self.data_time.avg():.3f}s")
