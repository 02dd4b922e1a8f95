"""Fork-node branch dedup: every sampled token span trains exactly once
across branching rollouts (reference: trajectories.py:69-89)."""

import numpy as np

from prime_rl_tpu.envs.types import Episode, Trace
from prime_rl_tpu.orchestrator.trajectories import episode_to_samples


def trace(ids, sampled_from=0):
    n = len(ids)
    mask = [i >= sampled_from for i in range(n)]
    return Trace(token_ids=list(ids), sampled_mask=mask,
                 logprobs=[-1.0] * n, temperatures=[1.0] * n)


def total_trained(samples):
    return sum(int(s.mask.sum()) for s in samples)


def test_whole_prefix_dedup():
    # branch B extends branch A: A's span trains once
    ep = Episode(traces=[trace([1, 2, 3]), trace([1, 2, 3, 4, 5])])
    samples = episode_to_samples(ep, "e")
    assert total_trained(samples) == 5  # 3 (A) + 2 (B suffix)


def test_mid_stream_fork_dedup():
    """Two branches forking mid-stream (neither a whole-stream prefix of the
    other): the shared span before the fork still trains once — the r1
    whole-prefix shortcut double-trained it."""
    shared = [1, 2, 3, 4]
    a = trace(shared + [10, 11])
    b = trace(shared + [20, 21, 22])
    samples = episode_to_samples(Episode(traces=[a, b]), "e")
    assert total_trained(samples) == 6 + 3  # a full; b only its 3 fork tokens


def test_three_way_fork():
    shared = [7, 8]
    eps = Episode(traces=[trace(shared + [1]), trace(shared + [2, 3]),
                          trace(shared + [2, 4])])
    samples = episode_to_samples(eps, "e")
    # spans: [7,8] once, [1], [2,3], [2->shared with trace2? [2] shared, 4]
    # trace3 shares [7,8,2] with trace2 -> masks 3, trains only [4]
    assert total_trained(samples) == 3 + 2 + 1


def test_context_tokens_stay_untrainable():
    a = trace([1, 2, 3, 4], sampled_from=2)  # first 2 are prompt
    samples = episode_to_samples(Episode(traces=[a]), "e")
    assert total_trained(samples) == 2
