"""Checkpoint/resume via orbax (SURVEY.md §5.4 — absent in the reference).

Saves {params, opt_state, step} per checkpoint step with automatic latest-
resume; safe under interruption (orbax atomic finalisation).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import orbax.checkpoint as ocp

from .trainer import TrainState


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.dir = os.path.abspath(directory)
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, state: TrainState) -> None:
        step = int(np.asarray(state.step))
        self._mgr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step}
                )
            ),
        )
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: TrainState) -> Optional[TrainState]:
        """Restore the latest checkpoint into the template's structure, or
        None when no checkpoint exists."""
        step = self._mgr.latest_step()
        if step is None:
            return None
        target = {
            "params": template.params,
            "opt_state": template.opt_state,
            "step": template.step,
        }
        out = self._mgr.restore(
            step,
            args=ocp.args.Composite(state=ocp.args.StandardRestore(target)),
        )["state"]
        return TrainState(out["params"], out["opt_state"], out["step"])
