"""Merged RL launch config — split into per-process configs by the launcher
(reference: entrypoints/rl.py:76-110)."""

from __future__ import annotations

from pydantic import Field

from prime_rl_tpu.configs.env_server import EnvServerConfig
from prime_rl_tpu.configs.inference import InferenceConfig
from prime_rl_tpu.configs.orchestrator import OrchestratorConfig
from prime_rl_tpu.configs.shared import BaseConfig
from prime_rl_tpu.configs.trainer import TrainerConfig


class DeployConfig(BaseConfig):
    """Cluster deployment templating (reference: entrypoints/rl.py:421-615
    SLURM Jinja templates + llmd/ yamls — TPU-pod/GKE variants). ``render``
    writes the launch artifact; ``submit`` additionally runs sbatch."""

    type: str = "slurm_single"  # slurm_single | slurm_multi | gke
    submit: bool = False
    template: str | None = None  # override path; None = built-in template
    job_name: str = "prime-rl-tpu"
    partition: str = "tpu"
    time_limit: str = "24:00:00"
    trainer_hosts: int = 1
    sampler_hosts: int = 1
    coordinator_port: int = 8476
    image: str = "prime-rl-tpu:latest"
    trainer_tpu_type: str = "tpu-v5-lite-podslice"
    trainer_topology: str = "4x4"
    sampler_tpu_type: str = "tpu-v5-lite-device"
    chips_per_host: int = 4
    env_vars: dict = Field(default_factory=dict)


class RLConfig(BaseConfig):
    output_dir: str = "outputs"
    trainer: TrainerConfig = TrainerConfig()
    orchestrator: OrchestratorConfig = OrchestratorConfig()
    inference: InferenceConfig = InferenceConfig()
    env_servers: list[EnvServerConfig] = Field(default_factory=list)
    # colocated: sampler + learner share one process/mesh (single-host mode)
    colocated: bool = True
    dry_run: bool = False
    # cluster deployment: render (and optionally submit) a launch artifact
    # instead of spawning local processes
    deploy: DeployConfig | None = None
