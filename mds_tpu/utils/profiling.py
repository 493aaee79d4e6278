"""Profiling hooks: jax.profiler traces + per-step timing.

What the reference lacks (SURVEY.md §5 — ad-hoc cuda.Event timing in
commented main blocks, explicit torch.cuda.synchronize per step). Here:
  * `trace(logdir)` — context manager around jax.profiler.trace (open the
    result in TensorBoard / xprof);
  * `StepTimer` — wall-clock per-step timing with an explicit
    `block_until_ready` sync point, the torch.cuda.synchronize analog
    (tools/train_amp.py:268).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, sync_every: int = 1):
        self.sync_every = sync_every
        self._t0: Optional[float] = None
        self._n = 0
        self.total = 0.0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        """Sync on `result` (block_until_ready) and return elapsed seconds."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self._n += 1
        self.total += dt
        return dt

    @property
    def mean(self) -> float:
        return self.total / max(self._n, 1)
