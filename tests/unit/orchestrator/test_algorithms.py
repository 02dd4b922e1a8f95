"""Credit-assignment math for every algorithm class
(reference: tests/unit/orchestrator/test_algorithms.py, test_advantage.py)."""

import numpy as np
import pytest

from prime_rl_tpu.configs.algorithm import (
    EchoAlgoConfig,
    GRPOAlgoConfig,
    HierarchicalGRPOAlgoConfig,
    LengthPenaltyConfig,
    MaxRLAlgoConfig,
    RAEAlgoConfig,
)
from prime_rl_tpu.envs.types import Episode, Trace
from prime_rl_tpu.orchestrator.algo.algorithms import (
    GRPO,
    RAE,
    Echo,
    HierarchicalGRPO,
    MaxRL,
    make_algorithm,
)
from prime_rl_tpu.orchestrator.algo.base import Rollout
from prime_rl_tpu.orchestrator.trajectories import episode_to_samples


def make_rollout(reward, n=8, prompt=3, info=None):
    trace = Trace(
        token_ids=list(range(1, n + 1)),
        sampled_mask=[False] * prompt + [True] * (n - prompt),
        logprobs=[-1.0] * n,
        temperatures=[1.0] * n,
        reward=reward,
    )
    ep = Episode(traces=[trace], reward=reward, info=info or {})
    return Rollout(episode=ep, samples=episode_to_samples(ep, "e"),
                   env_name="e", task_data={})


def test_grpo_group_mean_baseline():
    algo = GRPO(GRPOAlgoConfig())
    group = [make_rollout(r) for r in (1.0, 0.0, 0.5, 0.5)]
    algo.finalize_group(group)
    advs = [float(r.samples[0].advantages[np.asarray(r.samples[0].mask, bool)][0]) for r in group]
    np.testing.assert_allclose(advs, [0.5, -0.5, 0.0, 0.0], atol=1e-6)
    # advantages only on sampled tokens; rl routing stamped
    s = group[0].samples[0]
    assert not s.advantages[:2].any()  # prompt tokens (idx0 force-masked later)
    assert s.rl_weights is not None


def test_grpo_length_penalty_shapes_reward():
    cfg = GRPOAlgoConfig(length_penalty=LengthPenaltyConfig(num_output_tokens_weight=0.1))
    algo = GRPO(cfg)
    short = make_rollout(1.0, n=6, prompt=3)   # 3 output tokens
    long = make_rollout(1.0, n=12, prompt=3)   # 9 output tokens
    scores = algo.score_group([short, long])
    assert scores[0] > scores[1]  # longer output penalized


def test_max_rl_normalization():
    algo = MaxRL(MaxRLAlgoConfig())
    scores = algo.score_group([make_rollout(r) for r in (2.0, 0.0, 1.0)])
    assert max(abs(s) for s in scores) == pytest.approx(1.0)
    assert sum(scores) == pytest.approx(0.0)
    # degenerate all-equal group -> zeros, not NaN
    assert algo.score_group([make_rollout(1.0)] * 3) == [0.0, 0.0, 0.0]


def test_rae_ema_baseline_persists_across_groups():
    algo = RAE(RAEAlgoConfig(ema_decay=0.5))
    g1 = [make_rollout(1.0, info={"agent": "a"})]
    s1 = algo.score_group(g1)
    assert s1 == [0.0]  # baseline initializes at first reward
    # baseline now 1.0; a zero reward scores negative
    s2 = algo.score_group([make_rollout(0.0, info={"agent": "a"})])
    assert s2[0] == pytest.approx(-1.0)
    # a different agent has its own baseline
    s3 = algo.score_group([make_rollout(0.0, info={"agent": "b"})])
    assert s3 == [0.0]


def test_hierarchical_scoped_baselines():
    algo = HierarchicalGRPO(HierarchicalGRPOAlgoConfig(scope_key="role"))
    group = [
        make_rollout(1.0, info={"role": "proposer"}),
        make_rollout(0.0, info={"role": "proposer"}),
        make_rollout(10.0, info={"role": "solver"}),
        make_rollout(0.0, info={"role": "solver"}),
    ]
    scores = algo.score_group(group)
    np.testing.assert_allclose(scores, [0.5, -0.5, 5.0, -5.0], atol=1e-6)


def test_echo_observation_ce_weights():
    algo = Echo(EchoAlgoConfig(observation_ce_weight=0.5))
    # multi-turn-shaped trace: prompt, sampled, env feedback, sampled
    trace = Trace(
        token_ids=list(range(10)),
        sampled_mask=[False, False, True, True, False, False, False, True, True, True],
        logprobs=[0.0] * 10,
        temperatures=[1.0] * 10,
        reward=1.0,
    )
    ep = Episode(traces=[trace], reward=1.0)
    r = Rollout(episode=ep, samples=episode_to_samples(ep, "e"), env_name="e", task_data={})
    algo.finalize_group([r, make_rollout(0.0)])
    ce = r.samples[0].ce_weights
    # observation tokens AFTER the first sampled span get CE weight;
    # the initial prompt does not
    assert ce is not None
    assert not ce[:2].any()
    np.testing.assert_allclose(ce[4:7], [0.5, 0.5, 0.5])
    assert not ce[2:4].any() and not ce[7:].any()


def test_registry_builds_all():
    for t in ("grpo", "max_rl", "rae", "hierarchical_grpo", "echo", "opd", "opsd", "sft"):
        from prime_rl_tpu.configs.loader import parse_argv
        from prime_rl_tpu.configs.orchestrator import EnvSourceConfig

        cfg = EnvSourceConfig(name="e", algo={"type": t})
        assert make_algorithm(cfg.algo) is not None
