"""Multimodal RL integration: the full loop on a tiny random-init qwen3_vl —
pixels ride the generate wire into the serving engine (vision prefill +
mRoPE), return on the Trace, and train through the packed VLM step. Gate:
clean run, no tracebacks, and the trainer actually consumed vision patches
(mm_patches > 0 every step) — the reference has no builtin image env; this
covers the qwen3_5-family VLM rollout path (trajectories.py mm_kwargs)."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[2]

CONFIG = """
output_dir = "{out}"
[trainer]
max_steps = 6
[trainer.model]
name = "debug_vlm"
seq_len = 128
lm_head_chunk_size = 0
[trainer.model.attn]
impl = "xla"
[trainer.model.debug]
random_init = true
[trainer.mesh]
fsdp = 1
[trainer.optimizer]
type = "adamw"
lr = 2e-3
[trainer.batch]
seq_len = 128
micro_batch_size = 4
max_mm_patches = 512
[trainer.weight_ckpt]
interval = 1
keep_last = 2
[orchestrator]
model_name = "debug_vlm"
batch_size = 16
seq_len = 128
max_steps = 6
[orchestrator.client]
base_urls = ["http://127.0.0.1:{port_h}"]
[[orchestrator.train_envs]]
name = "dominant_color"
group_size = 8
[orchestrator.train_envs.sampling]
temperature = 1.0
max_tokens = 8
[orchestrator.train_envs.algo]
type = "grpo"
[inference]
max_model_len = 256
[inference.model]
name = "debug_vlm"
[inference.model.debug]
random_init = true
[inference.tokenizer]
name = "byte"
[inference.server]
port = {port_h}
[inference.kv]
num_pages = 256
page_size = 32
[inference.scheduler]
max_batch_size = 16
"""


@pytest.mark.slow
def test_rl_vlm_end_to_end(tmp_path, free_port):
    out = tmp_path / "run"
    cfg = tmp_path / "rl.toml"
    cfg.write_text(CONFIG.format(out=out, port_h=free_port()))
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}", "--colocated"],
        env=env, cwd=REPO, timeout=720, capture_output=True, text=True,
    )
    logs = "\n".join(
        p.read_text()[-2000:] for p in (out / "logs").glob("*.out") if p.exists()
    )
    assert proc.returncode == 0, f"launcher rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        text = p.read_text()
        assert "Traceback" not in text, f"error in {p.name}:\n{text[-2000:]}"

    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    steps = [r for r in trows if "loss" in r]
    assert len(steps) >= 6
    # the train step consumed real vision patches every step
    assert all(r.get("mm_patches", 0) > 0 for r in steps), steps
    # rollouts produced rewards through the image env
    orows = [json.loads(l) for l in open(out / "orchestrator.jsonl")]
    rewards = [r["reward_mean"] for r in orows if "reward_mean" in r]
    assert len(rewards) >= 5
