#!/usr/bin/env python
"""On-TPU learning gate (VERDICT r4 next-round #3).

Launches the colocated async-RL loop from configs/bench/northstar_learn_tpu.toml
on the REAL chip (Pallas attention, int8 Adam moments, bf16 masters, fused
weight swap), parses the orchestrator/trainer metric streams, asserts
reward-goes-up + bounded mismatch-KL, and writes a NORTHSTAR-style artifact
whose reward column rises on hardware
(reference bar: tests/integration/test_reverse_text.py:88-104).

Usage:
    python scripts/northstar_learning.py [--out benchmarks/NORTHSTAR_LEARN_r05.json]
    # CPU smoke: JAX_PLATFORMS=cpu python scripts/northstar_learning.py --cpu
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
CONFIG = REPO / "configs" / "bench" / "northstar_learn_tpu.toml"


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="benchmarks/NORTHSTAR_LEARN_r05.json")
    p.add_argument("--timeout", type=int, default=3000)
    p.add_argument("--cpu", action="store_true",
                   help="CPU smoke mode (xla attention, plain adamw lr)")
    args = p.parse_args()

    out_dir = REPO / "outputs" / "northstar_learn"
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    cmd = [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl",
           f"@{CONFIG}", "--colocated"]
    env = dict(os.environ)
    if args.cpu:
        # script smoke only: the real gate runs the 0.6B-width arch on TPU;
        # on one CPU device that model is minutes/step, so swap in the debug
        # spec (same loop, same assertions)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("XLA_FLAGS", None)
        cmd += ["--trainer.model.name", "debug",
                "--trainer.model.attn.impl", "xla",
                "--trainer.model.ac.mode", "full",
                "--trainer.model.seq-len", "256",
                "--trainer.batch.seq-len", "256",
                "--trainer.optimizer.lr", "3e-3",
                "--orchestrator.model-name", "debug",
                "--orchestrator.seq-len", "256",
                "--inference.model.name", "debug",
                "--inference.max-model-len", "512",
                "--inference.kv.page-size", "32",
                "--inference.kv.num-pages", "512"]
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=REPO, env=env, timeout=args.timeout,
                          capture_output=True, text=True)
    wall = time.time() - t0
    logs = ""
    for lp in (out_dir / "logs").glob("*.out"):
        logs += f"\n=== {lp.name} ===\n" + lp.read_text()[-1500:]
    if proc.returncode != 0:
        print(proc.stdout[-2000:])
        print(logs)
        print(f"FAIL: launcher rc={proc.returncode}")
        return 1

    rows = [json.loads(l) for l in open(out_dir / "orchestrator.jsonl")]
    rewards = [r["reward_mean"] for r in rows if "reward_mean" in r]
    trows = [json.loads(l) for l in open(out_dir / "trainer.jsonl")]
    kls = [r["mismatch_kl"] for r in trows if r.get("mismatch_kl") is not None]

    import numpy as np

    first = float(np.mean(rewards[:5])) if len(rewards) >= 5 else float("nan")
    last = float(np.mean(rewards[-8:])) if len(rewards) >= 8 else float("nan")
    kl_mean = float(np.mean(kls)) if kls else float("nan")
    learned = (len(rewards) >= 20 and last > first + 0.015 and last > first * 1.25)
    kl_ok = bool(kls) and kl_mean < 0.5

    artifact = {
        "workload": "northstar-learning-gate",
        "model": "Qwen3-0.6B arch, 4 layers, random init, byte tokenizer",
        "hardware": "cpu-smoke" if args.cpu else "1x TPU v5e (colocated, axon tunnel)",
        "compute_path": ("xla attention, f32 adamw" if args.cpu else
                         "pallas flash attn + save_attn remat + int8 adam moments "
                         "+ bf16 masters (SR) + fused colocated weight swap"),
        "config": str(CONFIG.relative_to(REPO)),
        "steps": len(rewards),
        "wall_s": round(wall, 1),
        "reward_first5_mean": round(first, 4),
        "reward_last8_mean": round(last, 4),
        "reward_column": [round(r, 4) for r in rewards],
        "mismatch_kl_mean": round(kl_mean, 5),
        "reward_goes_up": learned,
        "mismatch_kl_bounded": kl_ok,
        "pass": bool(learned and kl_ok),
    }
    out_path = REPO / args.out
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(artifact, indent=1))
    print(json.dumps(artifact, indent=1))
    if not artifact["pass"]:
        print(f"FAIL: learned={learned} kl_ok={kl_ok} rewards={rewards}")
        return 1
    print(f"PASS: reward {first:.3f} -> {last:.3f} on the TPU compute path")
    return 0


if __name__ == "__main__":
    sys.exit(main())
