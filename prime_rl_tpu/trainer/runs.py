"""Multi-tenant LoRA runs: many concurrent adapters trained on one learner
deployment (reference: trainer/runs.py:29-565 MultiRunManager,
optim.py:257-313 MultiLoRAOptimizer, multi_ckpt.py).

TPU-native simplification: every tenant shares ONE jitted train step (the
adapter pytrees have identical shapes), so "switching tenants" is just
passing a different (lora_state) pytree — no per-run module surgery, no
per-run compilation. Each run owns its adapter TrainState, progress, and
checkpoint/weight dirs under ``{output_dir}/runs/{run_id}/``.
"""

from __future__ import annotations

import json
import shutil
from dataclasses import dataclass, field
from pathlib import Path

import jax

from prime_rl_tpu.trainer.ckpt import Progress
from prime_rl_tpu.trainer.step import TrainState, init_lora_train_state
from prime_rl_tpu.utils.logger import get_logger


@dataclass
class Run:
    run_id: str
    state: TrainState
    progress: Progress = field(default_factory=Progress)

    @property
    def dirty(self) -> bool:
        return self.progress.step > 0


class MultiRunManager:
    """Owns per-tenant adapter states; discovery + creation + eviction +
    per-run checkpointing (reference: runs.py discovery of run_* dirs)."""

    def __init__(self, output_dir: str | Path, spec, lora_cfg, mesh_info, optimizer,
                 max_runs: int = 8, seed: int = 0):
        self.output_dir = Path(output_dir)
        self.spec = spec
        self.lora_cfg = lora_cfg
        self.mesh_info = mesh_info
        self.optimizer = optimizer
        self.max_runs = max_runs
        self.seed = seed
        self.runs: dict[str, Run] = {}
        (self.output_dir / "runs").mkdir(parents=True, exist_ok=True)

    # -- discovery / lifecycle ----------------------------------------------

    def discover(self) -> list[str]:
        """run ids present on disk (reference: run_* dir discovery)."""
        return sorted(
            d.name for d in (self.output_dir / "runs").iterdir()
            if d.is_dir() and not d.name.startswith(".")
        )

    def run_dir(self, run_id: str) -> Path:
        return self.output_dir / "runs" / run_id

    def get_or_create(self, run_id: str) -> Run:
        run = self.runs.get(run_id)
        if run is not None:
            return run
        if len(self.runs) >= self.max_runs:
            self._evict_lru()
        state = init_lora_train_state(
            self.spec, self.lora_cfg, self.mesh_info, self.optimizer,
            seed=self.seed + (hash(run_id) % 10_000),
        )
        run = Run(run_id, state)
        ckpt = self.run_dir(run_id) / "adapter_state.msgpack.json"
        if ckpt.exists():
            self._load(run)
        self.run_dir(run_id).mkdir(parents=True, exist_ok=True)
        self.runs[run_id] = run
        get_logger().info(f"multi-run: loaded tenant '{run_id}' "
                          f"(step {run.progress.step}, {len(self.runs)}/{self.max_runs} live)")
        return run

    def evict(self, run_id: str, save: bool = True) -> None:
        run = self.runs.pop(run_id, None)
        if run is not None and save:
            self.save(run)

    def delete(self, run_id: str) -> None:
        """Tenant removal (reference: run deletion/eviction on invalid data)."""
        self.runs.pop(run_id, None)
        shutil.rmtree(self.run_dir(run_id), ignore_errors=True)

    def _evict_lru(self) -> None:
        oldest = min(self.runs.values(), key=lambda r: r.progress.step)
        get_logger().info(f"multi-run: evicting '{oldest.run_id}' (slots full)")
        self.evict(oldest.run_id)

    # -- per-run persistence -------------------------------------------------

    def save(self, run: Run) -> None:
        import numpy as np
        from safetensors.numpy import save_file

        d = self.run_dir(run.run_id)
        d.mkdir(parents=True, exist_ok=True)
        flat, treedef = jax.tree.flatten(run.state)
        save_file(
            {f"leaf_{i}": np.ascontiguousarray(np.asarray(x)) for i, x in enumerate(flat)},
            d / "adapter_state.safetensors",
        )
        (d / "adapter_state.msgpack.json").write_text(json.dumps({
            "progress": vars(run.progress), "num_leaves": len(flat),
        }))

    def _load(self, run: Run) -> None:
        import numpy as np
        from safetensors.numpy import load_file

        d = self.run_dir(run.run_id)
        meta = json.loads((d / "adapter_state.msgpack.json").read_text())
        run.progress = Progress(**meta["progress"])
        state_file = d / "adapter_state.safetensors"
        if state_file.exists():
            flat, treedef = jax.tree.flatten(run.state)
            loaded = load_file(state_file)
            new_flat = [
                jax.device_put(np.asarray(loaded[f"leaf_{i}"]), x.sharding)
                for i, x in enumerate(flat)
            ]
            run.state = jax.tree.unflatten(treedef, new_flat)

    def save_all(self) -> None:
        for run in self.runs.values():
            if run.dirty:
                self.save(run)

    # -- serving snapshots ---------------------------------------------------

    def publish(self, run: Run, base_params, version: int) -> Path:
        """Merged per-tenant weights under runs/<id>/weights/step_N
        (the filesystem broadcast surface for that tenant's sampler), plus
        the standalone PEFT-style adapter under .../adapter/ so a SHARED
        engine serves this tenant via /load_lora_adapter without a swap
        (the multi-tenant serving surface; reference: ckpt.py:322-517
        separate LoRA adapter + docs/advanced.md multi-run)."""
        import numpy as np
        from safetensors.numpy import save_file

        from prime_rl_tpu.models.lora import adapter_state_dict, merge_lora
        from prime_rl_tpu.trainer.weights import save_hf_weights

        merged = merge_lora(base_params, run.state.params, self.lora_cfg, spec=self.spec)
        path = self.run_dir(run.run_id) / "weights" / f"step_{version}"
        # adapter FIRST: save_hf_weights drops the STABLE marker, which gates
        # the tenant watcher's /load_lora_adapter — the adapter must be
        # on disk before the dir goes visible
        host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), run.state.params)
        (path / "adapter").mkdir(parents=True, exist_ok=True)
        save_file(adapter_state_dict(host, self.spec, self.lora_cfg),
                  path / "adapter" / "adapter_model.safetensors")
        save_hf_weights(merged, self.spec, path)
        return path
