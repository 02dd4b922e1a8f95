"""Token-count batch assembly with whole-rollout overflow carry
(reference: train_sink.py:253-291)."""

import numpy as np

from prime_rl_tpu.configs import OrchestratorConfig
from prime_rl_tpu.envs.types import Episode
from prime_rl_tpu.orchestrator.algo.base import Rollout
from prime_rl_tpu.orchestrator.orchestrator import Orchestrator
from prime_rl_tpu.transport.types import TrainingSample


def make_rollout(n_tokens: int) -> Rollout:
    s = TrainingSample(
        token_ids=np.zeros(n_tokens, np.int32),
        mask=np.ones(n_tokens, bool),
        logprobs=np.zeros(n_tokens, np.float32),
        temperatures=np.ones(n_tokens, np.float32),
        env_name="e",
    )
    return Rollout(episode=Episode(traces=[], reward=0.0),
                   samples=[s], env_name="e", task_data={})


def make_orch(**cfg) -> Orchestrator:
    orch = object.__new__(Orchestrator)
    orch.config = OrchestratorConfig.model_validate(cfg)
    orch.completed_rollouts = []
    return orch


def test_token_budget_cut_carries_overflow():
    orch = make_orch(batch_size=100, max_batch_tokens=100)
    orch.completed_rollouts = [make_rollout(n) for n in (40, 30, 50, 10)]
    batch = orch._cut_batch()
    # 40+30 fit; +50 would blow the 100 budget -> carried to the next batch
    assert [len(r.samples[0]) for r in batch] == [40, 30]
    assert [len(r.samples[0]) for r in orch.completed_rollouts] == [50, 10]
    batch2 = orch._cut_batch()
    assert [len(r.samples[0]) for r in batch2] == [50, 10]


def test_oversized_rollout_ships_alone():
    orch = make_orch(batch_size=100, max_batch_tokens=100)
    orch.completed_rollouts = [make_rollout(300), make_rollout(20)]
    batch = orch._cut_batch()
    assert len(batch) == 1 and len(batch[0].samples[0]) == 300  # never dropped


def test_rollout_count_cut_without_budget():
    orch = make_orch(batch_size=2)
    orch.completed_rollouts = [make_rollout(10) for _ in range(5)]
    assert orch._batch_ready()
    assert len(orch._cut_batch()) == 2 and len(orch.completed_rollouts) == 3


def test_batch_ready_on_token_budget():
    orch = make_orch(batch_size=1000, max_batch_tokens=50)
    orch.completed_rollouts = [make_rollout(30)]
    assert not orch._batch_ready()
    orch.completed_rollouts.append(make_rollout(30))
    assert orch._batch_ready()
