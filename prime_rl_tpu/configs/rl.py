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

    type: str = "slurm_single"  # slurm_single | slurm_multi | slurm_pd | gke
    submit: bool = False
    template: str | None = None  # override path; None = built-in template
    job_name: str = "prime-rl-tpu"
    partition: str = "tpu"
    time_limit: str = "24:00:00"
    trainer_hosts: int = 1
    sampler_hosts: int = 1
    # P/D-disaggregated topology (type=slurm_pd): prompts prefill on
    # prefill-role hosts, decode continues on decode-role hosts behind the
    # router (reference: entrypoints/rl.py:421-615 disaggregated SLURM mode)
    prefill_hosts: int = 1
    decode_hosts: int = 2
    engine_port: int = 8100
    router_port: int = 8000
    pd_threshold: int = 512  # prompt tokens at/above this prefill remotely
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
    # disaggregated multi-process trainer world on ONE machine: the launcher
    # spawns N jax.distributed trainer ranks (rank 0 runs the packer); use
    # the SLURM/GKE templates for real multi-host (reference: torchrun
    # --nproc-per-node in rl.py local mode)
    trainer_procs: int = 1
    # devices per trainer rank (CPU testing: sets
    # --xla_force_host_platform_device_count for trainer ranks ONLY, so the
    # inference process keeps its own device view); None = inherit
    trainer_devices_per_proc: int | None = None
    dry_run: bool = False
    # cluster deployment: render (and optionally submit) a launch artifact
    # instead of spawning local processes
    deploy: DeployConfig | None = None
