"""Merged RL launch config — split into per-process configs by the launcher
(reference: entrypoints/rl.py:76-110)."""

from __future__ import annotations

from pydantic import Field

from prime_rl_tpu.configs.env_server import EnvServerConfig
from prime_rl_tpu.configs.inference import InferenceConfig
from prime_rl_tpu.configs.orchestrator import OrchestratorConfig
from prime_rl_tpu.configs.shared import BaseConfig
from prime_rl_tpu.configs.trainer import TrainerConfig


class RLConfig(BaseConfig):
    output_dir: str = "outputs"
    trainer: TrainerConfig = TrainerConfig()
    orchestrator: OrchestratorConfig = OrchestratorConfig()
    inference: InferenceConfig = InferenceConfig()
    env_servers: list[EnvServerConfig] = Field(default_factory=list)
    # colocated: sampler + learner share one process/mesh (single-host mode)
    colocated: bool = True
    dry_run: bool = False
