"""Trace → TrainingSample conversion (reference: orchestrator/
trajectories.py:1-135). One sample per trace branch; fork dedup: if two
traces share a sampled prefix (branching rollouts), the shared sampled span
trains only once — later branches mask it out (reference: l.69-89)."""

from __future__ import annotations

import numpy as np

from prime_rl_tpu.envs.types import Episode, Trace
from prime_rl_tpu.transport.types import TrainingSample


def trace_to_sample(trace: Trace, env_name: str) -> TrainingSample:
    return TrainingSample(
        token_ids=np.asarray(trace.token_ids, np.int32),
        mask=np.asarray(trace.sampled_mask, bool),
        logprobs=np.asarray(trace.logprobs, np.float32),
        temperatures=np.asarray(trace.temperatures, np.float32),
        env_name=env_name,
    )


def episode_to_samples(episode: Episode, env_name: str) -> list[TrainingSample]:
    """All trainable branches, with shared-sampled-prefix dedup."""
    samples = []
    seen_prefixes: list[tuple[int, ...]] = []
    for trace in episode.traces:
        sample = trace_to_sample(trace, env_name)
        ids = tuple(trace.token_ids)
        for prev in seen_prefixes:
            if len(prev) <= len(ids) and ids[: len(prev)] == prev:
                # shared prefix already trained by an earlier branch
                sample.mask[: len(prev)] = False
                break
        seen_prefixes.append(ids)
        samples.append(sample)
    return samples
