"""``python -m prime_rl_tpu.entrypoints.rl @ config.toml`` — the RL launcher
(reference: entrypoints/rl.py:113-418 local mode): splits the merged config,
spawns inference + env servers + orchestrator + trainer as subprocesses with
per-child monitoring, tails progress, and fails the whole run fast when any
child dies.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time
from pathlib import Path

from prime_rl_tpu.configs import RLConfig, parse_config
from prime_rl_tpu.configs.loader import to_toml


def _write_subconfig(cfg_model, path: Path) -> Path:
    data = cfg_model.model_dump(exclude_none=True, mode="json")
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(to_toml(data))
    return path


def _spawn(name: str, args: list[str], output_dir: Path, env: dict | None = None) -> subprocess.Popen:
    logs = output_dir / "logs"
    logs.mkdir(parents=True, exist_ok=True)
    out = open(logs / f"{name}.out", "w")
    return subprocess.Popen(
        args, stdout=out, stderr=subprocess.STDOUT,
        env={**os.environ, **(env or {})},
    )


def _resolve_resume(config: RLConfig, output_dir: Path) -> None:
    """Resolve ``--trainer.ckpt.resume-step -1`` to the newest step both the
    trainer and orchestrator checkpointed, pin it in both subconfigs, and
    clean artifacts from beyond it (reference: entrypoints/rl.py:618-653)."""
    import shutil

    from prime_rl_tpu.utils import pathing

    step = config.trainer.ckpt.resume_step
    ckpts = pathing.list_step_dirs(output_dir / "checkpoints")
    both = [
        s for s in ckpts
        # a finalized orbax save has the `state` dir (tmp dirs mean the save
        # was interrupted)
        if (pathing.trainer_ckpt_dir(output_dir, s) / "state").exists()
        and (pathing.orch_ckpt_dir(output_dir, s) / "state.json").exists()
    ]
    if step == -1:
        if not both:
            print("no joint checkpoint found; starting fresh")
            config.trainer.ckpt.resume_step = None
            config.orchestrator.ckpt.resume_step = None
            return
        step = both[-1]
    config.trainer.ckpt.resume_step = step
    config.orchestrator.ckpt.resume_step = step
    # clean snapshots/rollouts written after the resume point so the version
    # protocol restarts cleanly
    for parent in ("weights", "rollouts"):
        for s in pathing.list_step_dirs(output_dir / parent, stable_only=False):
            if s > step:
                shutil.rmtree(output_dir / parent / f"step_{s}", ignore_errors=True)
    print(f"resuming both processes from step {step}")


def _deploy(config: RLConfig, cfg_dir: Path, rl_toml: Path, output_dir: Path) -> int:
    """Render a cluster launch artifact from the built-in (or user) template
    and optionally submit it (reference: entrypoints/rl.py:421-615 SLURM
    templating; TPU-pod/GKE variants under prime_rl_tpu/templates/)."""
    import shutil

    from jinja2 import Environment, FileSystemLoader

    d = config.deploy
    builtin = Path(__file__).resolve().parents[1] / "templates"
    names = {"slurm_single": "single_host_rl.sbatch.j2",
             "slurm_multi": "multi_host_rl.sbatch.j2",
             "slurm_pd": "pd_disagg_rl.sbatch.j2",
             "gke": "gke_rl.yaml.j2"}
    if d.template:
        tpath = Path(d.template)
    else:
        if d.type not in names:
            raise ValueError(f"unknown deploy type {d.type!r} (have {sorted(names)})")
        tpath = builtin / names[d.type]
    env = Environment(loader=FileSystemLoader(tpath.parent), keep_trailing_newline=True)
    script = env.get_template(tpath.name).render(
        job_name=d.job_name, partition=d.partition, time_limit=d.time_limit,
        output_dir=str(output_dir), workdir=str(Path.cwd()), python=sys.executable,
        config_path=str(rl_toml), config_dir=str(cfg_dir),
        trainer_hosts=d.trainer_hosts, sampler_hosts=d.sampler_hosts,
        prefill_hosts=d.prefill_hosts, decode_hosts=d.decode_hosts,
        engine_port=d.engine_port, router_port=d.router_port,
        pd_threshold=d.pd_threshold,
        coordinator_port=d.coordinator_port, image=d.image,
        trainer_tpu_type=d.trainer_tpu_type, trainer_topology=d.trainer_topology,
        sampler_tpu_type=d.sampler_tpu_type, chips_per_host=d.chips_per_host,
        env_vars=d.env_vars,
    )
    suffix = ".yaml" if d.type == "gke" else ".sbatch"
    out = output_dir / "deploy" / f"{d.job_name}{suffix}"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(script)
    print(f"deploy artifact written to {out}")
    if d.submit:
        if d.type == "gke":
            print("submit gke jobs with: kubectl apply -f", out)
            return 0
        sbatch = shutil.which("sbatch")
        if sbatch is None:
            print("sbatch not found on this host; submit manually")
            return 1
        import subprocess as sp

        return sp.run([sbatch, str(out)]).returncode
    return 0


def rl(config: RLConfig) -> int:
    output_dir = Path(config.output_dir)
    if config.trainer.ckpt.resume_step is not None:
        _resolve_resume(config, output_dir)
    # propagate the shared output dir into every process config
    config.trainer.output_dir = str(output_dir)
    config.orchestrator.output_dir = str(output_dir)
    config.inference.output_dir = str(output_dir)
    if config.colocated:
        config.orchestrator.watch = "liveness"
    # shutdown carve-out: the last target_lag+1 policies are never consumed
    # by a shipped batch (reference: rl/train.py:597-605 +
    # orchestrator.py:921-930 matching gate)
    if (config.trainer.final_publish_skip == 0
            and config.trainer.max_steps is not None):
        config.trainer.final_publish_skip = config.orchestrator.target_lag + 1
    plane_env: dict[str, str] = {}
    bcast = config.trainer.broadcast
    if not config.colocated and getattr(bcast, "mode", None) in ("shm", "zmq_stream"):
        # disaggregated weight plane: sampler applies weights itself and bumps
        # its /liveness version — same watcher protocol, no disk on the path
        config.orchestrator.watch = "liveness"
        if config.inference.weight_plane is None:
            from prime_rl_tpu.configs.inference import WeightPlaneConfig

            config.inference.weight_plane = WeightPlaneConfig(
                mode=bcast.mode, pub_port=bcast.pub_port, rep_port=bcast.rep_port
            )
        plane_env["PRIME_RL_WEIGHT_PLANE_ID"] = f"{output_dir}:{os.getpid()}:{time.time():.0f}"
    cfg_dir = output_dir / "configs"
    trainer_toml = _write_subconfig(config.trainer, cfg_dir / "trainer.toml")
    orch_toml = _write_subconfig(config.orchestrator, cfg_dir / "orchestrator.toml")
    inf_toml = _write_subconfig(config.inference, cfg_dir / "inference.toml")
    rl_toml = _write_subconfig(config, cfg_dir / "rl_resolved.toml")

    if config.deploy is not None:
        return _deploy(config, cfg_dir, rl_toml, output_dir)

    if config.dry_run:
        print(f"resolved configs written to {cfg_dir}")
        return 0

    py = sys.executable
    children: dict[str, subprocess.Popen] = {}
    try:
        if config.colocated:
            # one process owns the chip(s): learner + sampler time-sliced,
            # weight sync fully on-device
            children["trainer"] = _spawn(
                "colocated", [py, "-m", "prime_rl_tpu.entrypoints.colocated", f"@{rl_toml}"],
                output_dir,
            )
        else:
            children["inference"] = _spawn(
                "inference", [py, "-m", "prime_rl_tpu.entrypoints.inference", f"@{inf_toml}"],
                output_dir, env=plane_env,
            )
        for i, es in enumerate(config.env_servers):
            es.output_dir = str(output_dir)
            es_toml = _write_subconfig(es, cfg_dir / f"env_{i}.toml")
            children[f"env_{es.env}_{i}"] = _spawn(
                f"env_{i}", [py, "-m", "prime_rl_tpu.entrypoints.env_server", f"@{es_toml}"],
                output_dir,
            )
        children["orchestrator"] = _spawn(
            "orchestrator", [py, "-m", "prime_rl_tpu.entrypoints.orchestrator", f"@{orch_toml}"],
            output_dir, env={"JAX_PLATFORMS": "cpu"},  # orchestrator never touches the TPU
        )
        if not config.colocated:
            tcmd = [py, "-m", "prime_rl_tpu.entrypoints.trainer", f"@{trainer_toml}"]
            if config.trainer_procs > 1:
                import socket as _socket

                with _socket.socket() as s:
                    s.bind(("127.0.0.1", 0))
                    coord = f"127.0.0.1:{s.getsockname()[1]}"
                dev_env = {}
                if config.trainer_devices_per_proc:
                    dev_env["XLA_FLAGS"] = (
                        "--xla_force_host_platform_device_count="
                        f"{config.trainer_devices_per_proc}")
                for r in range(config.trainer_procs):
                    children[f"trainer_{r}" if r else "trainer"] = _spawn(
                        f"trainer_{r}", tcmd, output_dir,
                        env=dict(plane_env, **dev_env,
                                 PRIME_RL_COORDINATOR=coord,
                                 PRIME_RL_NUM_PROCESSES=str(config.trainer_procs),
                                 PRIME_RL_PROCESS_ID=str(r)),
                    )
            else:
                children["trainer"] = _spawn("trainer", tcmd, output_dir, env=plane_env)
        print(f"RL run: {len(children)} processes, logs under {output_dir}/logs/")

        # fail-fast child monitor (reference: rl.py:368-401)
        while True:
            for name, proc in list(children.items()):
                code = proc.poll()
                if code is not None:
                    if name.startswith("trainer") and code == 0:
                        # multi-rank world: shut down when EVERY rank is done
                        del children[name]
                        if any(n.startswith("trainer") for n in children):
                            continue
                        print("trainer finished cleanly; shutting down")
                        return 0
                    if name == "orchestrator" and code == 0:
                        # give the trainer rank(s) a grace window to finish
                        # their final checkpoint save before SIGTERM
                        deadline = time.time() + 120
                        for tn, tp in children.items():
                            if tn.startswith("trainer") and tp.poll() is None:
                                try:
                                    tp.wait(timeout=max(0.1, deadline - time.time()))
                                except subprocess.TimeoutExpired:
                                    pass
                        print("orchestrator finished cleanly; shutting down")
                        return 0
                    print(f"process {name} exited with {code}; failing run")
                    return code or 1
            time.sleep(1.0)
    finally:
        for name, proc in children.items():
            if proc.poll() is None:
                proc.send_signal(signal.SIGTERM)
        deadline = time.time() + 15
        for proc in children.values():
            try:
                proc.wait(timeout=max(0.1, deadline - time.time()))
            except subprocess.TimeoutExpired:
                proc.kill()


def main() -> None:
    sys.exit(rl(parse_config(RLConfig)))


if __name__ == "__main__":
    main()
