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
    def __init__(self):
        self.seq = []
        self.global_seq = []

    def update(self, val: float) -> None:
        self.seq.append(val)
        self.global_seq.append(val)

    def get(self):
        avg = sum(self.seq) / max(len(self.seq), 1)
        global_avg = sum(self.global_seq) / max(len(self.global_seq), 1)
        self.seq = []
        return avg, global_avg
