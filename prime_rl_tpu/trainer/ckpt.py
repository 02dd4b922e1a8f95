"""Learner checkpointing: sharded train state (orbax) + retention + progress.

Parity with the reference's CheckpointManager (reference: trainer/ckpt.py:
160-320): per-step dirs with STABLE markers, ``keep_last``/``keep_interval``
retention, resume by step or latest. TPU-native: orbax writes each device
shard in parallel from the NamedSharding layout — the analogue of torch DCP.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import asdict, dataclass, field
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from prime_rl_tpu.configs.shared import CheckpointConfig
from prime_rl_tpu.trainer.step import TrainState
from prime_rl_tpu.utils import pathing


@dataclass
class Progress:
    """Scalar training progress saved alongside the sharded state."""

    step: int = 0
    total_tokens: int = 0
    total_samples: int = 0


class CheckpointManager:
    """Save/load TrainState + Progress under
    ``{output_dir}/checkpoints/step_{N}/trainer``."""

    def __init__(self, output_dir: str | Path, config: CheckpointConfig):
        self.output_dir = Path(output_dir)
        self.config = config
        self._ckptr = ocp.StandardCheckpointer()

    def _dir(self, step: int) -> Path:
        return pathing.trainer_ckpt_dir(self.output_dir, step)

    def save(self, state: TrainState, progress: Progress) -> Path:
        step = progress.step
        path = self._dir(step)
        if path.exists():
            shutil.rmtree(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        self._ckptr.save((path / "state").absolute(), state)
        self._ckptr.wait_until_finished()
        (path / "progress.json").write_text(json.dumps(asdict(progress)))
        pathing.mark_stable(pathing.ckpt_dir(self.output_dir, step))
        self._retain()
        return path

    def load(self, abstract_state: TrainState, step: int | None = None) -> tuple[TrainState, Progress]:
        """``abstract_state``: a pytree of jax.ShapeDtypeStruct with shardings
        (from ``jax.eval_shape`` + ``state_shardings``) or a live TrainState
        whose layout the restore should match. ``step=None``/-1 = latest."""
        if step is None or step == -1:
            step = self.latest_step()
            if step is None:
                raise FileNotFoundError(f"no checkpoints under {self.output_dir}")
        path = self._dir(step)
        state = self._ckptr.restore((path / "state").absolute(), abstract_state)
        progress = Progress(**json.loads((path / "progress.json").read_text()))
        return state, progress

    def latest_step(self) -> int | None:
        return pathing.latest_step(self.output_dir / "checkpoints")

    def _retain(self) -> None:
        keep_last, keep_interval = self.config.keep_last, self.config.keep_interval
        if keep_last is None:
            return
        steps = pathing.list_step_dirs(self.output_dir / "checkpoints", stable_only=False)
        protected = set(steps[-keep_last:]) if keep_last else set()
        if keep_interval:
            protected |= {s for s in steps if s % keep_interval == 0}
        for s in steps:
            if s not in protected:
                shutil.rmtree(pathing.ckpt_dir(self.output_dir, s), ignore_errors=True)


def abstract_train_state(state: TrainState) -> TrainState:
    """Shape/sharding skeleton of a live state, for restore."""
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding), state
    )
