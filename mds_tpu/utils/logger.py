"""Logging: file+stream logger with non-primary-process demotion.

Reference: lib/logger.py:19-70 (`setup_logger`, `print_log_msg`). On TPU the
"rank" is `jax.process_index()`; non-zero processes are demoted to WARNING
exactly like the reference demotes non-zero dist ranks.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Dict, Optional


def setup_logger(name: str, logpth: Optional[str] = None, level: Optional[int] = None) -> logging.Logger:
    logger = logging.getLogger(name)
    logger.handlers.clear()
    if level is None:
        try:
            import jax

            primary = jax.process_index() == 0
        except Exception:
            primary = True
        level = logging.INFO if primary else logging.WARNING
    logger.setLevel(level)
    fmt = logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%H:%M:%S")
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if logpth:
        os.makedirs(logpth, exist_ok=True)
        logfile = os.path.join(
            logpth, "{}-{}.log".format(name, time.strftime("%Y-%m-%d-%H-%M-%S"))
        )
        fh = logging.FileHandler(logfile)
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    logger.propagate = False
    return logger


def print_log_msg(
    logger: logging.Logger,
    it: int,
    max_iter: int,
    lr: float,
    time_meter,
    loss_meters: Dict[str, "AvgMeter"],
) -> None:
    """Fixed-format iteration log line (reference: lib/logger.py:33-70)."""
    t_intv, eta = time_meter.get()
    loss_txt = ", ".join(
        "{}: {:.4f}".format(k, v.get()[0]) for k, v in loss_meters.items()
    )
    msg = "iter: {it}/{mx}, lr: {lr:.6f}, eta: {eta}, time: {t:.2f}, {loss}".format(
        it=it + 1, mx=max_iter, lr=lr, eta=eta, t=t_intv, loss=loss_txt
    )
    logger.info(msg)
