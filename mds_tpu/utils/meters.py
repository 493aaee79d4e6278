"""Progress meters (reference: lib/meters.py:5-49 TimeMeter/AvgMeter)."""

from __future__ import annotations

import datetime
import time


class TimeMeter:
    def __init__(self, max_iter: int):
        self.iter = 0
        self.max_iter = max_iter
        self.st = time.time()
        self.global_st = self.st
        self.curr = self.st

    def update(self) -> None:
        self.iter += 1

    def get(self):
        self.curr = time.time()
        interval = self.curr - self.st
        global_interval = self.curr - self.global_st
        eta_sec = (self.max_iter - self.iter) * global_interval / max(self.iter, 1)
        eta = str(datetime.timedelta(seconds=round(eta_sec)))
        self.st = self.curr
        return interval, eta


class AvgMeter:
    """Buffers raw values — python floats OR jax device scalars — and
    resolves them lazily at get() in ONE batched fetch.

    Converting `float(metrics['loss'])` after every train step forces a
    device sync per iteration, stalling jax's async dispatch pipeline (a
    full round-trip per step on a remote-tunnel backend). Appending the
    device scalar and stacking at the log interval keeps the hot loop
    fully asynchronous. Running (global) stats are kept as python floats,
    so nothing accumulates device buffers across a 960k-iter run."""

    def __init__(self):
        self.seq = []
        self._gsum = 0.0
        self._gcount = 0

    def update(self, val) -> None:
        self.seq.append(val)

    def _resolve(self):
        vals, self.seq = self.seq, []
        if not vals or isinstance(vals[0], (float, int)):
            return [float(v) for v in vals]
        import jax.numpy as jnp
        import numpy as np

        return np.asarray(jnp.stack(vals)).tolist()

    def get(self):
        vals = self._resolve()
        self._gsum += sum(vals)
        self._gcount += len(vals)
        avg = sum(vals) / max(len(vals), 1)
        global_avg = self._gsum / max(self._gcount, 1)
        return avg, global_avg
