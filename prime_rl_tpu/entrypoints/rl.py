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


def rl(config: RLConfig) -> int:
    output_dir = Path(config.output_dir)
    # propagate the shared output dir into every process config
    config.trainer.output_dir = str(output_dir)
    config.orchestrator.output_dir = str(output_dir)
    config.inference.output_dir = str(output_dir)
    if config.colocated:
        config.orchestrator.watch = "liveness"
    cfg_dir = output_dir / "configs"
    trainer_toml = _write_subconfig(config.trainer, cfg_dir / "trainer.toml")
    orch_toml = _write_subconfig(config.orchestrator, cfg_dir / "orchestrator.toml")
    inf_toml = _write_subconfig(config.inference, cfg_dir / "inference.toml")
    rl_toml = _write_subconfig(config, cfg_dir / "rl_resolved.toml")

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
                output_dir,
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
            children["trainer"] = _spawn(
                "trainer", [py, "-m", "prime_rl_tpu.entrypoints.trainer", f"@{trainer_toml}"],
                output_dir,
            )
        print(f"RL run: {len(children)} processes, logs under {output_dir}/logs/")

        # fail-fast child monitor (reference: rl.py:368-401)
        while True:
            for name, proc in children.items():
                code = proc.poll()
                if code is not None:
                    if name == "trainer" and code == 0:
                        print("trainer finished cleanly; shutting down")
                        return 0
                    if name == "orchestrator" and code == 0:
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
