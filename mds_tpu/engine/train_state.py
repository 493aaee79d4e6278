"""Train state pytree (params + BN stats + optimizer state + step)."""

from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array  # scalar int32

    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}
