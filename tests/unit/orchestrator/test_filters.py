"""Rollout filters, incl. group-level down-sampling (PAPERS.md
arXiv:2504.13818 — keep the max-|advantage| extremes of each group)."""

import numpy as np

from prime_rl_tpu.configs.algorithm import GRPOAlgoConfig
from prime_rl_tpu.configs.orchestrator import (
    DownsampleFilterConfig,
    ZeroAdvantageFilterConfig,
)
from prime_rl_tpu.envs.types import Episode, Trace
from prime_rl_tpu.orchestrator.algo.algorithms import GRPO
from prime_rl_tpu.orchestrator.algo.base import Rollout
from prime_rl_tpu.orchestrator.filters import FilterSet, advantage_magnitude
from prime_rl_tpu.orchestrator.trajectories import episode_to_samples


def make_group(rewards):
    group = []
    for r in rewards:
        trace = Trace(token_ids=list(range(1, 9)),
                      sampled_mask=[False] * 3 + [True] * 5,
                      logprobs=[-1.0] * 8, temperatures=[1.0] * 8, reward=r)
        ep = Episode(traces=[trace], reward=r, info={})
        group.append(Rollout(episode=ep, samples=episode_to_samples(ep, "e"),
                             env_name="e", task_data={}))
    GRPO(GRPOAlgoConfig()).finalize_group(group)
    return group


def test_downsample_keeps_extremes():
    rewards = [1.0, 0.5, 0.52, 0.48, 0.5, 0.0]  # mean ~0.5: extremes are 1.0 / 0.0
    group = make_group(rewards)
    fs = FilterSet([DownsampleFilterConfig(keep_frac=0.33, mode="enforce")])
    kept = fs.apply(group)
    kept_rewards = sorted(r.episode.reward for r in kept)
    assert kept_rewards == [0.0, 1.0], kept_rewards
    assert fs.counts["downsample"] == 4
    # arrival order preserved among kept
    assert [r.episode.reward for r in kept] == [1.0, 0.0]


def test_downsample_monitor_only_counts():
    group = make_group([1.0, 0.0, 0.5, 0.5])
    fs = FilterSet([DownsampleFilterConfig(keep_frac=0.5, mode="monitor")])
    kept = fs.apply(group)
    assert len(kept) == 4  # nothing dropped in monitor mode
    assert fs.counts["downsample"] == 2


def test_downsample_respects_min_keep():
    group = make_group([1.0, 0.0, 0.5])
    fs = FilterSet([DownsampleFilterConfig(keep_frac=0.01, min_keep=2,
                                           mode="enforce")])
    assert len(fs.apply(group)) == 2


def test_downsample_composes_with_rollout_filters():
    group = make_group([1.0, 0.5, 0.5, 0.0])
    # the two 0.5-reward rollouts sit near the baseline -> tiny |advantage|
    mags = [advantage_magnitude(r) for r in group]
    assert mags[0] > mags[1] and mags[3] > mags[2]
    fs = FilterSet([
        ZeroAdvantageFilterConfig(mode="enforce"),
        DownsampleFilterConfig(keep_frac=0.5, mode="enforce"),
    ])
    kept = fs.apply(group)
    assert {r.episode.reward for r in kept} == {1.0, 0.0}
