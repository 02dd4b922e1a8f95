"""Full-stack RL integration: launch the 3-process loop (inference +
orchestrator + trainer) as a subprocess and assert on parsed metrics —
the reference's reverse-text integration gate adapted to the offline tiny
model (reference: tests/integration/test_reverse_text.py:1-104,
check_no_error / check_reward_goes_up / check_avg_mismatch_kl_in_range).
"""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

CONFIG = """
output_dir = "{out}"
[trainer]
max_steps = 30
[trainer.model]
name = "debug"
seq_len = 256
lm_head_chunk_size = 0
[trainer.model.attn]
impl = "xla"
[trainer.model.debug]
random_init = true
[trainer.mesh]
fsdp = 1
[trainer.optimizer]
type = "adamw"
lr = 3e-3
[trainer.batch]
seq_len = 256
micro_batch_size = 4
[trainer.weight_ckpt]
interval = 1
keep_last = 3
[trainer.transport]
batch_port = {port_b}
[orchestrator]
model_name = "debug"
batch_size = 32
seq_len = 256
max_steps = 30
[orchestrator.transport]
batch_port = {port_b}
[orchestrator.client]
base_urls = ["http://127.0.0.1:{port_h}"]
[[orchestrator.train_envs]]
name = "fixed_completion"
group_size = 8
[orchestrator.train_envs.sampling]
temperature = 1.0
max_tokens = 12
[orchestrator.train_envs.algo]
type = "grpo"
[inference]
max_model_len = 512
[inference.model]
name = "debug"
[inference.model.debug]
random_init = true
[inference.tokenizer]
name = "byte"
[inference.server]
port = {port_h}
[inference.kv]
num_pages = 512
page_size = 32
[inference.scheduler]
max_batch_size = 32
"""


@pytest.mark.slow
def test_rl_end_to_end(tmp_path, free_port):
    out = tmp_path / "run"
    cfg = tmp_path / "rl.toml"
    text = CONFIG.format(out=out, port_h=free_port(), port_b=free_port())
    # eval cohort every 10 steps (reference: eval sink per-(env, step)
    # cohorts with its own permit pool)
    text += """
[[orchestrator.eval_envs]]
name = "fixed_completion"
group_size = 2
num_examples = 4
interval = 10
[orchestrator.eval_envs.sampling]
temperature = 0.0
max_tokens = 8
"""
    cfg.write_text(text)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # the unit-test conftest forces an 8-device virtual mesh; the subprocess
    # stack runs single-device
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}"],
        env=env, cwd=REPO, timeout=720, capture_output=True, text=True,
    )
    logs = "\n".join(
        p.read_text()[-2000:] for p in (out / "logs").glob("*.out") if p.exists()
    )
    assert proc.returncode == 0, f"launcher rc={proc.returncode}\n{proc.stdout}\n{logs}"

    # check_no_error: no tracebacks in any process log
    for p in (out / "logs").glob("*.out"):
        text = p.read_text()
        assert "Traceback" not in text, f"error in {p.name}:\n{text[-2000:]}"

    # check_reward_goes_up
    rows = [json.loads(l) for l in open(out / "orchestrator.jsonl")]
    rewards = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rewards) >= 25, rewards
    first, last = np.mean(rewards[:5]), np.mean(rewards[-8:])
    assert last > first + 0.015 and last > first * 1.25, f"no learning: {rewards}"

    # check_avg_mismatch_kl_in_range: healthy one-step-off pipeline
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    kls = [r["mismatch_kl"] for r in trows if r.get("mismatch_kl") is not None]
    assert kls and float(np.mean(kls)) < 0.5, kls

    # eval cohorts completed and were logged with the metric-matrix keys
    eval_rows = [r for r in rows if any(k.startswith("eval/") for k in r)]
    assert eval_rows, "no eval metrics logged"
    assert any("eval/agg/all/reward/mean" in r for r in eval_rows)

    # checkpoints + weight snapshots were produced and retained
    assert (out / "weights").exists()
    assert any((out / "checkpoints").glob("step_*")), "no trainer checkpoint"


DISAGG_EXTRA = """
[trainer.broadcast]
type = "device"
mode = "shm"
"""


@pytest.mark.slow
def test_rl_disaggregated_weight_plane(tmp_path, free_port):
    """3-process run where weights cross the shm plane, never disk: the
    sampler's policy_version advances every step while the weights/ dir only
    sees interval snapshots (VERDICT r1 item #1; reference:
    broadcast/nccl.py:197-267 behavior)."""
    out = tmp_path / "run"
    cfg = tmp_path / "rl.toml"
    text = CONFIG.format(out=out, port_h=free_port(), port_b=free_port())
    text = text.replace("[trainer.weight_ckpt]\ninterval = 1", "[trainer.weight_ckpt]\ninterval = 10")
    text = text.replace("max_steps = 30", "max_steps = 12")
    # top-level key must precede the first [section]
    cfg.write_text("colocated = false\n" + text + DISAGG_EXTRA)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}"],
        env=env, cwd=REPO, timeout=720, capture_output=True, text=True,
    )
    logs = "\n".join(
        p.read_text()[-2000:] for p in (out / "logs").glob("*.out") if p.exists()
    )
    assert proc.returncode == 0, f"launcher rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        text = p.read_text()
        assert "Traceback" not in text, f"error in {p.name}:\n{text[-2000:]}"

    # the sampler applied every version through the plane
    inf_log = (out / "logs" / "inference.log").read_text()
    applied = [l for l in inf_log.splitlines() if "weight plane: applied v" in l]
    assert len(applied) >= 10, inf_log[-2000:]

    # per-step publishes never hit disk: only interval snapshots exist
    snap_steps = sorted(
        int(p.name.split("_")[1]) for p in (out / "weights").glob("step_*")
    ) if (out / "weights").exists() else []
    assert len(snap_steps) <= 2, f"per-step disk snapshots leaked: {snap_steps}"

    # publish latency is host-copy class, not safetensors-write class
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    pubs = [r["publish_s"] for r in trows if "publish_s" in r]
    assert pubs and float(np.median(pubs)) < 0.5, pubs

    # and training still learns through the plane
    rows = [json.loads(l) for l in open(out / "orchestrator.jsonl")]
    rewards = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rewards) >= 10


@pytest.mark.slow
def test_rl_multiprocess_trainer_full_loop(tmp_path, free_port):
    """VERDICT r4 next-round #5: the FULL 3-process async loop on a
    multi-process trainer world — orchestrator + engine + 2 jax.distributed
    trainer ranks (2 virtual devices each, global fsdp=4 mesh) with the
    packer re-binning rollouts into per-rank MicroBatch streams and weights
    crossing the shm plane. Gates: reward trend + bounded mismatch-KL +
    per-step plane applies (reference bar: the 2-GPU reverse-text CI
    topology, SURVEY.md §4)."""
    out = tmp_path / "run"
    cfg = tmp_path / "rl.toml"
    text = CONFIG.format(out=out, port_h=free_port(), port_b=free_port())
    text = text.replace("max_steps = 30", "max_steps = 20")
    text = text.replace("[trainer.mesh]\nfsdp = 1", "[trainer.mesh]\nfsdp = 4")
    text = text.replace("[trainer.weight_ckpt]\ninterval = 1",
                        "[trainer.weight_ckpt]\ninterval = 10")
    text = text.replace("micro_batch_size = 4",
                        "micro_batch_size = 4\nnum_micro_batches = 2", 1)
    port_b_line = text.split("[trainer.transport]\n", 1)[1].split("\n", 1)[0]
    text = text.replace(f"[trainer.transport]\n{port_b_line}",
                        f"[trainer.transport]\n{port_b_line}\n"
                        f"micro_batch_port = {free_port()}", 1)
    cfg.write_text("colocated = false\ntrainer_procs = 2\n"
                   "trainer_devices_per_proc = 2\n" + text + DISAGG_EXTRA)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # inference keeps a single-device view
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}"],
        env=env, cwd=REPO, timeout=900, capture_output=True, text=True,
    )
    logs = "\n".join(
        p.read_text()[-2000:] for p in (out / "logs").glob("*.out") if p.exists()
    )
    assert proc.returncode == 0, f"launcher rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        t = p.read_text()
        assert "Traceback" not in t, f"error in {p.name}:\n{t[-2000:]}"

    # the packer actually ran on rank 0 and re-binned for 2 ranks
    t0 = (out / "logs" / "trainer_0.out").read_text()
    assert "packer up: re-binning for 2 ranks" in t0, t0[-2000:]

    # reward trend through the multi-process world
    rows = [json.loads(l) for l in open(out / "orchestrator.jsonl")]
    rewards = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rewards) >= 15, rewards
    first, last = np.mean(rewards[:5]), np.mean(rewards[-6:])
    assert last > first + 0.01, f"no learning on the 2-rank world: {rewards}"

    # healthy one-step-off pipeline (rank-0 writes trainer.jsonl)
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    kls = [r["mismatch_kl"] for r in trows if r.get("mismatch_kl") is not None]
    assert kls and float(np.mean(kls)) < 0.5, kls

    # weights crossed the shm plane every step (not the disk)
    inf_log = (out / "logs" / "inference.log").read_text()
    applied = [l for l in inf_log.splitlines() if "weight plane: applied v" in l]
    assert len(applied) >= 10, inf_log[-2000:]


@pytest.mark.slow
def test_rl_hybrid_family_end_to_end(tmp_path, free_port):
    """The full async loop on the GatedDeltaNet hybrid (debug_qwen3_next):
    hybrid engine serving (recurrent pools), hybrid training step, colocated
    weight swap — short run, gated on clean logs + finite losses + policy
    version advancing (the learning-trend gate stays on the cheaper dense
    debug model above)."""
    out = tmp_path / "run"
    cfg = tmp_path / "rl.toml"
    text = CONFIG.format(out=out, port_h=free_port(), port_b=free_port())
    text = text.replace('name = "debug"', 'name = "debug_qwen3_next"')
    text = text.replace("max_steps = 30", "max_steps = 8")
    cfg.write_text(text)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}"],
        env=env, cwd=REPO, timeout=900, capture_output=True, text=True,
    )
    logs = "\n".join(
        p.read_text()[-2000:] for p in (out / "logs").glob("*.out") if p.exists()
    )
    assert proc.returncode == 0, f"launcher rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        text = p.read_text()
        assert "Traceback" not in text, f"error in {p.name}:\n{text[-2000:]}"
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    losses = [r["loss"] for r in trows if "loss" in r]
    assert len(losses) >= 6 and all(np.isfinite(losses)), losses
    orows = [json.loads(l) for l in open(out / "orchestrator.jsonl")]
    versions = [r["policy_version"] for r in orows if "policy_version" in r]
    assert versions and max(versions) >= 4, versions


def _run_rl(tmp_path, cfg_text, steps_needed=10, timeout=720):
    out = tmp_path / "run"
    cfg = tmp_path / "rl.toml"
    cfg.write_text(cfg_text)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}"],
        env=env, cwd=REPO, timeout=timeout, capture_output=True, text=True,
    )
    logs = "\n".join(
        p.read_text()[-2000:] for p in (out / "logs").glob("*.out") if p.exists()
    )
    assert proc.returncode == 0, f"launcher rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        text = p.read_text()
        assert "Traceback" not in text, f"error in {p.name}:\n{text[-2000:]}"
    rows = [json.loads(l) for l in open(out / "orchestrator.jsonl")]
    rewards = [r["reward_mean"] for r in rows if "reward_mean" in r]
    assert len(rewards) >= steps_needed, rewards
    return out, rewards


@pytest.mark.slow
def test_rl_lora_end_to_end(tmp_path, free_port):
    """LoRA RL (reference scenario matrix: reverse_text {lora}): adapters
    train while the base stays frozen, and every published snapshot is
    base+merged. A rank-8 adapter moves the tiny task's reward too slowly
    for a slope gate (offline CE fit of the same step is asserted in
    tests/unit/trainer/test_lora.py), so the e2e gates on pipeline health:
    mismatch_kl ~ 0 proves the SAMPLED policy equals the trained
    adapter+base at every step — i.e. merge -> publish -> serve is exact."""
    cfg = CONFIG.format(out=tmp_path / "run", port_h=free_port(), port_b=free_port())
    cfg = cfg.replace("[trainer.optimizer]",
                      "[trainer.model.lora]\nrank = 8\nalpha = 16.0\n[trainer.optimizer]")
    cfg = cfg.replace("lr = 3e-3", "lr = 2e-2")  # adapters train at higher lr
    out, rewards = _run_rl(tmp_path, cfg, steps_needed=20)
    assert np.mean(rewards[-8:]) > np.mean(rewards[:5]) - 0.01, \
        f"policy collapsed: {rewards}"
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    kls = [r["mismatch_kl"] for r in trows if r.get("mismatch_kl") is not None]
    assert kls and float(np.mean(kls)) < 0.25, f"publish != policy: {kls}"
    grads = [r["grad_norm"] for r in trows if r.get("grad_norm") is not None]
    assert max(grads) > 1e-3, "adapters received no gradient"
    # the published (merged) policy actually changes across steps
    import glob as _glob

    from safetensors.numpy import load_file
    snaps = sorted((out / "weights").glob("step_*"))
    a = load_file(_glob.glob(str(snaps[0] / "*.safetensors"))[0])
    b = load_file(_glob.glob(str(snaps[-1] / "*.safetensors"))[0])
    moved = max(float(np.abs(a[k].astype(np.float32) - b[k].astype(np.float32)).max())
                for k in a if "proj" in k)
    assert moved > 1e-4, "published weights never changed"
    # adapter snapshot exported alongside the merged weights
    assert any((out / "weights").rglob("adapter*")), "no adapter export"


@pytest.mark.slow
def test_rl_moe_end_to_end(tmp_path, free_port):
    """MoE RL (reference scenario matrix: reverse_text {moe}): the debug MoE
    spec (ragged-dispatch experts + router replay wire) through the full
    3-process loop."""
    cfg = CONFIG.format(out=tmp_path / "run", port_h=free_port(), port_b=free_port())
    cfg = cfg.replace('name = "debug"', 'name = "debug_moe"')
    out, rewards = _run_rl(tmp_path, cfg, steps_needed=20)
    first, last = np.mean(rewards[:5]), np.mean(rewards[-8:])
    assert last > first + 0.01, f"no MoE learning: {rewards}"
