"""Training-metric sinks: JSONL scalars + optional TensorBoard.

Reference observability (SURVEY.md §5): tensorboardX SummaryWriter scalar
groups loss/{seg,contrast,domain} and mious/{…} (committed event files under
runs/), plus offline parsers plt_log.py / excel_log.py that scrape the log
lines. Here scalars go to a machine-readable metrics.jsonl (stable schema —
the plt/excel role becomes a one-liner) and, when a tensorboard writer is
importable, to TB events too.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class MetricsWriter:
    def __init__(self, logdir: str, tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.path = os.path.join(logdir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(logdir)
            except Exception:
                self._tb = None

    def write(self, step: int, scalars: Dict[str, float], group: str = "") -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        if group:
            rec["group"] = group
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                tag = f"{group}/{k}" if group else k
                self._tb.add_scalar(tag, float(v), step)

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def read_metrics(logdir: str):
    """Offline parser (plt_log.py / excel_log.py role): metrics.jsonl → list."""
    path = os.path.join(logdir, "metrics.jsonl")
    out = []
    with open(path) as f:
        for line in f:
            if line.strip():
                out.append(json.loads(line))
    return out
