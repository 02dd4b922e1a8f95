"""HTTP server integration: spawn the inference entrypoint as a subprocess
(token + chat + admin routes) — the reference's serving-tokens test role
(reference: tests/unit/inference/test_serving_tokens.py)."""

import json
import os
import signal
import subprocess
import sys
import time

import httpx
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it


@pytest.fixture(scope="module")
def server(free_port_module):
    port = free_port_module
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "prime_rl_tpu.entrypoints.inference",
            "--model.debug.random-init", "--model.debug.num-layers", "2",
            "--model.name", "Qwen/Qwen3-0.6B",
            "--tokenizer.name", "byte",
            "--server.port", str(port),
            "--max-model-len", "256",
            "--kv.num-pages", "64", "--kv.page-size", "16",
            "--scheduler.max-batch-size", "4",
            "--output-dir", "/tmp/test_inference_server",
        ],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    deadline = time.monotonic() + 120
    last_err = None
    while time.monotonic() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read().decode()
            raise RuntimeError(f"server died:\n{out[-3000:]}")
        try:
            r = httpx.get(f"{base}/liveness", timeout=2)
            if r.status_code == 200:
                break
        except Exception as e:
            last_err = e
        time.sleep(0.5)
    else:
        proc.kill()
        raise TimeoutError(f"server not up: {last_err}")
    yield base
    proc.send_signal(signal.SIGTERM)
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


@pytest.fixture(scope="module")
def free_port_module():
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_generate_route(server):
    r = httpx.post(
        f"{server}/inference/v1/generate",
        json={
            "token_ids": [1, 2, 3, 4, 5],
            "sampling_params": {"max_tokens": 8, "temperature": 0.7, "seed": 1},
        },
        timeout=120,
    )
    assert r.status_code == 200, r.text
    body = r.json()
    choice = body["choices"][0]
    assert 1 <= len(choice["token_ids"]) <= 8
    assert len(choice["logprobs"]) == len(choice["token_ids"])
    assert choice["finish_reason"] in ("stop", "length")
    assert body["usage"]["prompt_tokens"] == 5


def test_generate_prompt_logprobs(server):
    r = httpx.post(
        f"{server}/inference/v1/generate",
        json={
            "token_ids": [7, 8, 9, 10],
            "sampling_params": {"max_tokens": 1, "prompt_logprobs": 1},
        },
        timeout=120,
    )
    body = r.json()
    plp = body["prompt_logprobs"]
    assert plp is not None and len(plp) == 4
    assert plp[0] is None
    assert "logprob" in next(iter(plp[1].values()))


def test_chat_completions(server):
    r = httpx.post(
        f"{server}/v1/chat/completions",
        json={
            "model": "Qwen/Qwen3-0.6B",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 8,
            "temperature": 0.5,
        },
        timeout=120,
    )
    assert r.status_code == 200, r.text
    body = r.json()
    assert body["object"] == "chat.completion"
    assert isinstance(body["choices"][0]["message"]["content"], str)


def test_models_and_admin(server):
    assert httpx.get(f"{server}/v1/models", timeout=10).json()["data"][0]["id"]
    assert httpx.post(f"{server}/pause", timeout=10).json()["status"] == "paused"
    live = httpx.get(f"{server}/liveness", timeout=10).json()
    assert live["paused"] is True
    assert httpx.post(f"{server}/resume", timeout=10).json()["status"] == "running"
    # paused flag cleared and generation works again
    r = httpx.post(
        f"{server}/inference/v1/generate",
        json={"token_ids": [1, 2, 3], "sampling_params": {"max_tokens": 2}},
        timeout=120,
    )
    assert r.status_code == 200


def test_update_weights_roundtrip(server, tmp_path_factory):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from prime_rl_tpu.models import qwen3
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.trainer.weights import save_hf_weights

    spec = get_spec("Qwen/Qwen3-0.6B", num_layers=2)
    params = qwen3.init_params(spec, jax.random.key(5))
    wdir = tmp_path_factory.mktemp("weights")
    save_hf_weights(params, spec, wdir)
    r = httpx.post(
        f"{server}/update_weights",
        json={"weight_dir": str(wdir), "version": 3},
        timeout=300,
    )
    assert r.status_code == 200, r.text
    live = httpx.get(f"{server}/liveness", timeout=10).json()
    assert live["policy_version"] == 3


def test_chat_streaming(server):
    with httpx.stream(
        "POST", f"{server}/v1/chat/completions",
        json={
            "model": "m", "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6, "temperature": 0.8, "stream": True,
        },
        timeout=120,
    ) as r:
        assert r.status_code == 200
        assert r.headers["content-type"].startswith("text/event-stream")
        events = []
        for line in r.iter_lines():
            if line.startswith("data: "):
                events.append(line[6:])
        assert events[-1] == "[DONE]"
        chunks = [json.loads(e) for e in events[:-1]]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[-1]["choices"][0]["finish_reason"] in ("stop", "length")
        text = "".join(c["choices"][0]["delta"].get("content", "") for c in chunks)
        assert isinstance(text, str)


def test_opd_teacher_scoring_against_live_server(server):
    """The OPD algorithm prefill-scores rollout tokens against a (teacher)
    engine and routes them to the ref_kl loss (reference: algo/opd.py:16-47)."""
    import asyncio

    import numpy as np

    from prime_rl_tpu.configs.algorithm import FrozenModelConfig, OPDAlgoConfig
    from prime_rl_tpu.envs.types import Episode, Trace
    from prime_rl_tpu.orchestrator.algo.algorithms import OPD
    from prime_rl_tpu.orchestrator.algo.base import Rollout
    from prime_rl_tpu.orchestrator.trajectories import episode_to_samples

    algo = OPD(OPDAlgoConfig(teacher=FrozenModelConfig(name="t", base_url=[server])))
    n = 6
    trace = Trace(
        token_ids=list(range(1, n + 1)),
        sampled_mask=[False] * 2 + [True] * (n - 2),
        logprobs=[0.0] * n,
        temperatures=[1.0] * n,
        reward=0.5,
    )
    episode = Episode(traces=[trace], reward=0.5)
    rollout = Rollout(episode=episode, samples=episode_to_samples(episode, "e"),
                      env_name="e", task_data={})
    asyncio.run(algo.finalize_rollout(rollout))
    s = rollout.samples[0]
    assert s.ref_logprobs is not None and len(s.ref_logprobs) == n
    assert np.isfinite(s.ref_logprobs[1:]).all()
    algo.finalize_group([rollout])
    assert s.ref_kl_weights is not None and s.ref_kl_weights.sum() > 0
    assert s.advantages is not None and not s.advantages.any()


def test_frozen_pool_sampler_routes_sft(server, tmp_path_factory, monkeypatch):
    """The Sampler routes an sft-distillation env's rollouts to the connected
    FROZEN teacher pool (reference: orchestrator/sampler.py:1-59) and stamps
    CE loss routing; frozen groups never age off-policy."""
    import asyncio

    from prime_rl_tpu.configs import OrchestratorConfig
    from prime_rl_tpu.orchestrator.orchestrator import Orchestrator

    out = tmp_path_factory.mktemp("frozen")
    cfg = OrchestratorConfig.model_validate({
        "output_dir": str(out),
        "model_name": "debug",
        "tokenizer": {"name": "byte"},
        "client": {"base_urls": [server]},
        "transport": {"type": "filesystem"},
        "batch_size": 2,
        "seq_len": 128,
        "train_envs": [{
            "name": "reverse_text", "group_size": 2,
            "sampling": {"temperature": 1.0, "max_tokens": 8},
            "algo": {"type": "sft",
                     "teacher": {"name": "teacher", "base_url": [server]}},
        }],
        "filters": [],
    })

    async def run():
        orch = Orchestrator(cfg)

        # skip the startup trainer-weight sync (no trainer in this test)
        async def fake_apply(self):
            self.policy.version = max(self.policy.version, 0)
            return True

        monkeypatch.setattr(Orchestrator, "_apply_latest_weights", fake_apply)
        await orch.setup()
        src = orch.sources["reverse_text"]
        assert src.frozen_pool is not None
        group = await orch._schedule_group()
        assert group.frozen
        await asyncio.gather(*group.tasks)
        assert len(group.rollouts) == 2
        for r in group.rollouts:
            assert r.episode.info.get("base_url") in [
                c.base_url for c in src.frozen_pool.clients]
        # aging never cancels frozen groups
        orch.inflight.add(group)
        for _ in range(100):
            orch.age_inflight()
        assert not group.cancelled
        # group finalize stamps CE routing
        src.algorithm.finalize_group(group.rollouts)
        for r in group.rollouts:
            for s in r.samples:
                assert s.ce_weights is not None and (s.ce_weights > 0).any()
        return True

    assert asyncio.run(run())
