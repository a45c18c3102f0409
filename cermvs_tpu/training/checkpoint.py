"""Orbax checkpointing: params + optimizer state + step.

Strictly more capable than the reference, which saves only model weights and
cannot resume (``/root/reference/train.py:95-101``, SURVEY.md section 5):
checkpoints here carry the full training state, keep a rolling window, and
restore onto any device layout.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from cermvs_tpu.training.step import TrainState


class CheckpointManager:
    def __init__(self, directory, max_to_keep: int = 20, save_interval: int = 5000):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.save_interval = save_interval
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def maybe_save(self, state: TrainState, force: bool = False) -> bool:
        step = int(state.step)
        # reference cadence: every SAVE_FREQ steps and at step 1 (train.py:95-96)
        if not force and not (step % self.save_interval == 0 or step == 1):
            return False
        self._mgr.save(step, args=ocp.args.StandardSave(state._asdict()))
        return True

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: TrainState, step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target._asdict()))
        return TrainState(**restored)

    def wait(self):
        self._mgr.wait_until_finished()


def save_params(path, params) -> None:
    """Standalone weights-only save (inference handoff, like the reference's
    ``{name}.pth``)."""
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path) -> Any:
    path = Path(path).absolute()
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)
