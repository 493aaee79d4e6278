"""Checkpoint save/restore via orbax.

Reference behavior being replaced (SURVEY.md §5): `torch.save(state_dict)`
every 1000 iters + `model_final.pth` (tools/train_amp.py:284-296); the GNN
trainer saves {model, optimizer, scheduler} dicts every 10k and reloads them
on finetune (tools/train_ltbgnn_all_datasets_snp.py:530-546, :691-697); the
iteration counter lives in the configer (tools/configer.py:224).

Here one orbax checkpoint holds (params, batch_stats, opt_state, step) plus
optional extras (bi_graphs, prototypes for the GNN stage).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from mds_tpu.engine.train_state import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3, save_interval: int = 1000):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.save_interval = save_interval
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def maybe_save(self, state: TrainState, extras: Optional[dict] = None,
                   force: bool = False, step: Optional[int] = None) -> bool:
        """`step` overrides the checkpoint id (default: the state's step) —
        used by trainers whose save cadence is not the state's own step
        counter (e.g. the alternating trainer's global iteration)."""
        step = int(state.step) if step is None else int(step)
        if not force and (step == 0 or step % self.save_interval != 0):
            return False
        if step in (self.mngr.all_steps() or []):
            return False  # already checkpointed at this id
        payload = {"state": state}
        if extras:
            payload["extras"] = extras
        self.mngr.save(step, args=ocp.args.StandardSave(payload))
        return True

    def wait(self):
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, abstract_state: TrainState,
                abstract_extras: Optional[dict] = None,
                step: Optional[int] = None):
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        tmpl = {"state": abstract_state}
        if abstract_extras is not None:
            tmpl["extras"] = abstract_extras
        out = self.mngr.restore(step, args=ocp.args.StandardRestore(tmpl))
        return out.get("state"), out.get("extras")
