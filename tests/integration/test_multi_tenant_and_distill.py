"""Multi-tenant + distillation end-to-end gates (VERDICT r3 next-round #5;
reference scenario matrix: tests/integration/ reverse_text
{multi_run, rl_opd, rl_sft}).

(a) two concurrent run_* tenants: launcher-less 4-process stack — one
    multi_run trainer, one shared engine serving per-tenant adapters, two
    orchestrators stamping run_idx — both tenants' rewards must move
    independently;
(b) rl_opd: teacher prefill-scoring through a second engine;
(c) sft-algo: frozen-pool generation + CE through the full loop.
"""

import json
import os
import signal
import subprocess
import sys
import time
import urllib.request
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]

pytestmark = pytest.mark.slow


def _env():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)
    return env


def _spawn(mod, cfg_path, log_path):
    log = open(log_path, "w")
    return subprocess.Popen(
        [sys.executable, "-m", f"prime_rl_tpu.entrypoints.{mod}", f"@{cfg_path}"],
        env=_env(), cwd=REPO, stdout=log, stderr=subprocess.STDOUT,
    ), log


def _wait_live(port, timeout=240):
    deadline = time.time() + timeout
    while time.time() < deadline:
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/health", timeout=2) as r:
                if r.status == 200:
                    return
        except Exception:
            time.sleep(1.0)
    raise TimeoutError(f"engine on :{port} never became live")


INFER_CFG = """
model.name = "debug"
model.debug.random_init = true
tokenizer.name = "byte"
max_model_len = 512
server.port = {port}
kv.num_pages = 512
kv.page_size = 32
scheduler.max_batch_size = 32
{extra}
"""

TRAINER_MULTI_CFG = """
output_dir = "{out}"
max_steps = {steps}
multi_run = true
max_runs = 4
[model]
name = "debug"
seq_len = 256
lm_head_chunk_size = 0
[model.attn]
impl = "xla"
[model.debug]
random_init = true
[model.lora]
rank = 16
alpha = 64.0
[mesh]
fsdp = 1
[optimizer]
type = "adamw"
lr = 2e-2
[batch]
seq_len = 256
micro_batch_size = 4
[weight_ckpt]
interval = 1
[ckpt]
interval = 50
[transport]
batch_port = {port_b}
"""

ORCH_TENANT_CFG = """
output_dir = "{out}/runs/run_{idx}"
model_name = "debug"
batch_size = 16
seq_len = 256
max_steps = {steps}
run_idx = {idx}
serve_adapter = "run_{idx}"
target_lag = 1
max_inflight_episodes = 32
[transport]
batch_port = {port_b}
[client]
base_urls = ["http://127.0.0.1:{port_h}"]
[[train_envs]]
name = "fixed_completion"
group_size = 8
[train_envs.args]
target = "{target}"
[train_envs.sampling]
temperature = 1.0
max_tokens = 8
[train_envs.algo]
type = "grpo"
[[filters]]
type = "zero_advantage"
mode = "enforce"
"""


def test_multi_tenant_two_runs(tmp_path, free_port):
    """Two tenants through one trainer + one engine: run discovery, packer
    run_idx routing, per-run publish, per-run adapter serving — and the two
    reward curves move independently."""
    out = tmp_path / "mt"
    (out / "logs").mkdir(parents=True)
    (out / "runs" / "run_0").mkdir(parents=True)
    (out / "runs" / "run_1").mkdir(parents=True)
    port_h, port_b = free_port(), free_port()
    steps = 16

    icfg = tmp_path / "inference.toml"
    icfg.write_text(INFER_CFG.format(
        port=port_h, out=out,
        extra="[lora]\nmax_adapters = 4\nrank = 16\nalpha = 64.0\n"
              'target_modules = ["q", "k", "v", "o", "gate", "up", "down"]\n'))
    tcfg = tmp_path / "trainer.toml"
    tcfg.write_text(TRAINER_MULTI_CFG.format(out=out, steps=2 * steps, port_b=port_b))
    ocfgs = []
    for idx, target in ((0, "abcd"), (1, "wxyz")):
        p = tmp_path / f"orch_{idx}.toml"
        p.write_text(ORCH_TENANT_CFG.format(
            out=out, idx=idx, steps=steps, port_b=port_b, port_h=port_h,
            target=target))
        ocfgs.append(p)

    procs = []
    try:
        procs.append(_spawn("inference", icfg, out / "logs" / "inference.out"))
        _wait_live(port_h)
        procs.append(_spawn("trainer", tcfg, out / "logs" / "trainer.out"))
        o_procs = [
            _spawn("orchestrator", p, out / "logs" / f"orch_{i}.out")
            for i, p in enumerate(ocfgs)
        ]
        procs.extend(o_procs)
        deadline = time.time() + 600
        while time.time() < deadline and any(
                p.poll() is None for p, _ in o_procs):
            time.sleep(2.0)
        for p, _ in o_procs:
            assert p.poll() is not None, "orchestrator did not finish in time"
    finally:
        for p, log in procs:
            if p.poll() is None:
                p.send_signal(signal.SIGTERM)
        time.sleep(3.0)
        for p, log in procs:
            if p.poll() is None:
                p.kill()
            log.close()

    for name in ("inference.out", "trainer.out", "orch_0.out", "orch_1.out"):
        text = (out / "logs" / name).read_text()
        assert "Traceback" not in text, f"error in {name}:\n{text[-3000:]}"

    # both tenants trained: per-run publishes exist with adapters inside
    for idx in (0, 1):
        snaps = sorted((out / "runs" / f"run_{idx}" / "weights").glob("step_*"))
        assert snaps, f"tenant {idx} never published"
        assert (snaps[-1] / "adapter" / "adapter_model.safetensors").exists()

    # independence: both tenants ran their full step budget with their own
    # reward streams and version cadence. (Reward GROWTH is not gated here,
    # matching the single-tenant LoRA e2e: rank-16 adapters on the 1M-param
    # debug model move too slowly for a CI horizon — the learning gate lives
    # in the full-finetune e2e; the multi-tenant risk is the cross-process
    # routing, which these assertions pin.)
    series = {}
    for idx in (0, 1):
        rows = [json.loads(l)
                for l in open(out / "runs" / f"run_{idx}" / "orchestrator.jsonl")]
        rewards = [r["reward_mean"] for r in rows if "reward_mean" in r]
        versions = [r["policy_version"] for r in rows if "policy_version" in r]
        assert len(rewards) >= steps, f"tenant {idx}: {rewards}"
        # each tenant's policy version advances with its OWN publishes
        assert versions[-1] > versions[0], f"tenant {idx} versions: {versions}"
        series[idx] = rewards
    assert series[0] != series[1], "tenants shared a reward stream"

    # the two tenants' adapters trained apart: published tensors differ
    from safetensors.numpy import load_file

    def _latest_adapter(idx):
        snaps = sorted((out / "runs" / f"run_{idx}" / "weights").glob("step_*"),
                       key=lambda p: int(p.name.split("_")[1]))
        return load_file(snaps[-1] / "adapter" / "adapter_model.safetensors")

    a0, a1 = _latest_adapter(0), _latest_adapter(1)
    diffs = [float(np.abs(a0[k] - a1[k]).max()) for k in a0 if k in a1]
    assert max(diffs) > 0, "tenant adapters are identical — run routing broken"

    # the shared engine actually served both adapters
    inf_log = (out / "logs" / "inference.out").read_text()
    assert "run_0" in inf_log and "run_1" in inf_log


BASE_RL_CONFIG = """
output_dir = "{out}"
[trainer]
max_steps = {steps}
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
batch_size = 16
seq_len = 256
max_steps = {steps}
[orchestrator.transport]
batch_port = {port_b}
[orchestrator.client]
base_urls = ["http://127.0.0.1:{port_h}"]
[[orchestrator.train_envs]]
name = "fixed_completion"
group_size = 8
[orchestrator.train_envs.sampling]
temperature = 1.0
max_tokens = 8
{algo}
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


def _run_rl_with_teacher(tmp_path, free_port, algo_toml, steps=10,
                         extra_args=()):
    """Colocated RL stack + one extra standalone teacher engine."""
    out = tmp_path / "run"
    (out / "logs").mkdir(parents=True)
    port_t = free_port()
    tcfg = tmp_path / "teacher.toml"
    tcfg.write_text(INFER_CFG.format(port=port_t, out=out, extra=""))
    teacher, tlog = _spawn("inference", tcfg, out / "logs" / "teacher.out")
    try:
        _wait_live(port_t)
        cfg = tmp_path / "rl.toml"
        cfg.write_text(BASE_RL_CONFIG.format(
            out=out, steps=steps, port_h=free_port(), port_b=free_port(),
            algo=algo_toml.format(port_t=port_t)))
        proc = subprocess.run(
            [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}",
             *extra_args],
            env=_env(), cwd=REPO, timeout=700, capture_output=True, text=True,
        )
        # scrape the teacher's served-request count while it is still alive
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port_t}/metrics", timeout=5) as r:
            metrics_text = r.read().decode()
    finally:
        teacher.send_signal(signal.SIGTERM)
        time.sleep(2.0)
        if teacher.poll() is None:
            teacher.kill()
        tlog.close()
    return out, proc, metrics_text


def test_rl_opd_teacher_scoring(tmp_path, free_port):
    """OPD: every finalized rollout is prefill-scored against the teacher
    engine; ref_logprobs ride the wire and the loop stays healthy."""
    algo = """
[orchestrator.train_envs.algo]
type = "opd"
[orchestrator.train_envs.algo.teacher]
name = "debug"
base_url = ["http://127.0.0.1:{port_t}"]
"""
    out, proc, teacher_metrics = _run_rl_with_teacher(tmp_path, free_port, algo)
    logs = "\n".join(p.read_text()[-2000:] for p in (out / "logs").glob("*.out"))
    assert proc.returncode == 0, f"rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        assert "Traceback" not in p.read_text(), p.name
    # teacher actually scored: its request counter moved
    served = [l for l in teacher_metrics.splitlines()
              if l.startswith("prime_rl_engine_requests_total")]
    assert served and float(served[0].split()[-1]) > 0, teacher_metrics
    # the loop shipped batches and the trainer consumed them
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    assert len(trows) >= 8
    assert all(np.isfinite(r["loss"]) for r in trows)


def test_rl_sft_algo_frozen_pool(tmp_path, free_port):
    """SFT algo: rollouts are GENERATED by the frozen teacher pool (not the
    live policy) and trained with CE. The teacher decodes GREEDILY so each
    prompt has one deterministic target — CE falls. (At temperature 1.0 a
    random teacher is ~uniform and CE starts at its optimum: flat.)"""
    algo = """
[orchestrator.train_envs.algo]
type = "sft"
[orchestrator.train_envs.algo.teacher]
name = "debug"
base_url = ["http://127.0.0.1:{port_t}"]
"""
    out, proc, teacher_metrics = _run_rl_with_teacher(
        tmp_path, free_port, algo, steps=12,
        extra_args=["--orchestrator.train-envs.0.sampling.temperature", "0.0"])
    logs = "\n".join(p.read_text()[-2000:] for p in (out / "logs").glob("*.out"))
    assert proc.returncode == 0, f"rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        assert "Traceback" not in p.read_text(), p.name
    # the teacher generated the rollouts
    served = [l for l in teacher_metrics.splitlines()
              if l.startswith("prime_rl_engine_requests_total")]
    assert served and float(served[0].split()[-1]) > 0, teacher_metrics
    # CE on a frozen target distribution falls
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    losses = [r["loss"] for r in trows if "loss" in r]
    assert len(losses) >= 10
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses


def test_rl_opsd_self_distillation(tmp_path, free_port):
    """OPSD through the full loop: each rollout is re-scored by the LIVE
    policy prefixed with the task's demonstration; ref_logprobs ride the
    wire into the ref_kl loss. No separate teacher process."""
    out = tmp_path / "run"
    (out / "logs").mkdir(parents=True)
    algo = """
[orchestrator.tokenizer]
name = "byte"
[orchestrator.train_envs.algo]
type = "opsd"
"""
    cfg = tmp_path / "rl.toml"
    cfg.write_text(BASE_RL_CONFIG.format(
        out=out, steps=10, port_h=free_port(), port_b=free_port(), algo=algo))
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl", f"@{cfg}"],
        env=_env(), cwd=REPO, timeout=700, capture_output=True, text=True,
    )
    logs = "\n".join(p.read_text()[-2000:] for p in (out / "logs").glob("*.out"))
    assert proc.returncode == 0, f"rc={proc.returncode}\n{proc.stdout}\n{logs}"
    for p in (out / "logs").glob("*.out"):
        assert "Traceback" not in p.read_text(), p.name
    trows = [json.loads(l) for l in open(out / "trainer.jsonl")]
    assert len(trows) >= 8
    assert all(np.isfinite(r["loss"]) for r in trows)
