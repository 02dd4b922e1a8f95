"""Real multi-host training on CPU: 2 jax.distributed processes x 4 virtual
devices each (8-device global mesh), packer-fed MicroBatch data plane, global
Scales shipped with each rank's feed. The 2-process run must produce the same
losses as the single-process run on the same TrainingBatches (VERDICT r1
item #5; reference: trainer/rl/train.py:312-334 + transport/zmq.py:176-297).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

TRAINER_TOML = """
output_dir = "{out}"
max_steps = {steps}
grad_clip = 1.0
[model]
name = "debug"
seq_len = 64
lm_head_chunk_size = 0
[model.attn]
impl = "xla"
[model.debug]
random_init = true
[mesh]
replica = 1
fsdp = {fsdp}
[optimizer]
type = "adamw"
lr = 1e-3
[batch]
seq_len = 64
micro_batch_size = 4
num_micro_batches = 2
[weight_ckpt]
interval = 100
[ckpt]
interval = 1000
[transport]
type = "filesystem"
[data]
type = "transport"
"""


# VLM variant: tiny qwen3_vl spec + pinned patch buffer (multi-host VLM
# requires batch.max_mm_patches so every rank compiles the same shape)
VLM_TRAINER_TOML = TRAINER_TOML.replace(
    'name = "debug"', 'name = "debug_vlm"'
).replace("[weight_ckpt]", "max_mm_patches = 64\n[weight_ckpt]")


def write_batches(out: Path, steps: int) -> None:
    from prime_rl_tpu.transport.filesystem import FSTrainingBatchSender
    from prime_rl_tpu.transport.types import TrainingBatch, TrainingSample

    rng = np.random.default_rng(0)
    sender = FSTrainingBatchSender(out)
    for step in range(steps):
        samples = []
        for _ in range(10):
            n = int(rng.integers(8, 60))
            samples.append(TrainingSample(
                token_ids=rng.integers(1, 500, n).astype(np.int32),
                mask=np.ones(n, bool),
                logprobs=rng.normal(-1.0, 0.1, n).astype(np.float32),
                temperatures=np.ones(n, np.float32),
                env_name="t",
                advantages=np.full(n, float(rng.normal()), np.float32),
            ))
        sender.send(TrainingBatch(examples=samples, step=step))


def write_vlm_batches(out: Path, steps: int) -> None:
    """Mixed text + image samples for the debug_vlm spec (image_token_id=301,
    vision_start=300, merge=2, patch_dim=96): every step has at least one
    sample with a real patch buffer riding TrainingSample.mm_kwargs."""
    from prime_rl_tpu.transport.filesystem import FSTrainingBatchSender
    from prime_rl_tpu.transport.types import TrainingBatch, TrainingSample

    rng = np.random.default_rng(0)
    sender = FSTrainingBatchSender(out)
    for step in range(steps):
        samples = []
        for k in range(6):
            if k % 2 == 0:
                t, h, w = 1, 4, 4  # 16 patches -> 4 merged vision tokens
                n_vis = t * (h // 2) * (w // 2)
                ids = (list(rng.integers(3, 250, size=int(rng.integers(4, 10))))
                       + [300] + [301] * n_vis
                       + list(rng.integers(3, 250, size=4)))
                mm = {"pixel_values": rng.standard_normal(
                          (t * h * w, 96)).astype(np.float32),
                      "image_grid_thw": np.asarray([[t, h, w]], np.int64)}
            else:
                ids = list(rng.integers(3, 250, size=int(rng.integers(8, 40))))
                mm = None
            n = len(ids)
            samples.append(TrainingSample(
                token_ids=np.asarray(ids, np.int32),
                mask=np.ones(n, bool),
                logprobs=rng.normal(-1.0, 0.1, n).astype(np.float32),
                temperatures=np.ones(n, np.float32),
                env_name="t",
                advantages=np.full(n, float(rng.normal()), np.float32),
                mm_kwargs=mm,
            ))
        sender.send(TrainingBatch(examples=samples, step=step))


def run_trainer(tmp: Path, tag: str, steps: int, procs: int, fsdp: int,
                vlm: bool = False) -> list[float]:
    out = tmp / tag
    out.mkdir(parents=True)
    (write_vlm_batches if vlm else write_batches)(out, steps)
    cfg = tmp / f"{tag}.toml"
    toml = VLM_TRAINER_TOML if vlm else TRAINER_TOML
    cfg.write_text(toml.format(out=out, steps=steps, fsdp=fsdp))

    base_env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    base_env.update(JAX_PLATFORMS="cpu",
                    XLA_FLAGS="--xla_force_host_platform_device_count=4")
    children = []
    if procs > 1:
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            coord = f"127.0.0.1:{s.getsockname()[1]}"
        for r in range(procs):
            env = dict(base_env, PRIME_RL_COORDINATOR=coord,
                       PRIME_RL_NUM_PROCESSES=str(procs), PRIME_RL_PROCESS_ID=str(r))
            children.append(subprocess.Popen(
                [sys.executable, "-m", "prime_rl_tpu.entrypoints.trainer", f"@{cfg}"],
                env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            ))
    else:
        children.append(subprocess.Popen(
            [sys.executable, "-m", "prime_rl_tpu.entrypoints.trainer", f"@{cfg}"],
            env=base_env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs = [p.communicate(timeout=600)[0] for p in children]
    for p, log in zip(children, logs):
        assert p.returncode == 0, f"{tag} rc={p.returncode}\n{log[-3000:]}"
    rows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    return [r["loss"] for r in rows if "loss" in r]


@pytest.mark.slow
def test_two_process_matches_single_process(tmp_path):
    steps = 4
    # single process on the full 4-device mesh
    single = run_trainer(tmp_path, "single", steps, procs=1, fsdp=4)
    # two processes x 4 devices = 8-device global fsdp mesh
    multi = run_trainer(tmp_path, "multi", steps, procs=2, fsdp=8)
    assert len(single) == len(multi) == steps
    np.testing.assert_allclose(multi, single, rtol=2e-3, atol=2e-4,
                               err_msg=f"single={single} multi={multi}")


@pytest.mark.slow
def test_two_process_vlm_matches_single_process(tmp_path):
    """Multi-host VLM contract (VERDICT r4 missing #1): per-rank patch
    buffers ride the wire, put_batch all-gathers them into one replicated
    global buffer with per-rank slot/segment offsets — the 2-process run
    must reproduce the single-process losses on identical TrainingBatches."""
    steps = 3
    single = run_trainer(tmp_path, "vlm_single", steps, procs=1, fsdp=4, vlm=True)
    multi = run_trainer(tmp_path, "vlm_multi", steps, procs=2, fsdp=8, vlm=True)
    assert len(single) == len(multi) == steps
    np.testing.assert_allclose(multi, single, rtol=5e-3, atol=5e-4,
                               err_msg=f"single={single} multi={multi}")
