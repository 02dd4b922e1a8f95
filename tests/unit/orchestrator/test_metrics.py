"""Metrics math (reference: tests/unit/orchestrator/test_metrics.py role)."""

import numpy as np
import pytest

from prime_rl_tpu.orchestrator.metrics import (
    RolloutMetrics,
    Stat,
    compute_pass_metrics,
    pass_at_k,
    pass_hat_k,
)


def test_stat_views():
    s = Stat()
    for v in range(1, 11):
        s.add(v)
    view = s.view()
    assert view["mean"] == 5.5 and view["max"] == 10 and view["min"] == 1
    assert view["p10"] < view["p90"]
    assert Stat().view() == {}


def test_pass_at_k_bounds():
    assert pass_at_k(0, 8, 1) == 0.0
    assert pass_at_k(8, 8, 8) == 1.0
    # 1 correct of 2, k=1 -> 0.5
    assert abs(pass_at_k(1, 2, 1) - 0.5) < 1e-9
    # monotone in k
    assert pass_at_k(2, 8, 4) > pass_at_k(2, 8, 1)


def test_pass_hat_k():
    assert pass_hat_k(8, 8, 4) == 1.0
    assert pass_hat_k(1, 8, 2) == 0.0
    # 4 of 8 correct, k=2: C(4,2)/C(8,2) = 6/28
    assert abs(pass_hat_k(4, 8, 2) - 6 / 28) < 1e-9


def test_compute_pass_metrics_skips_small_groups():
    out = compute_pass_metrics([(1, 2), (4, 8)], ks=[1, 4])
    assert "pass@1" in out and "pass@4" in out
    # only the size-8 group counts for k=4
    assert out["pass@4"] == pass_at_k(4, 8, 4)


def test_rollout_metrics_matrix():
    m = RolloutMetrics("train")
    m.add_rollout("env_a", {"reward": 1.0}, effective=True)
    m.add_rollout("env_a", {"reward": 0.0}, effective=False)
    m.add_group("env_a", 1, 2)
    view = m.view(ks=[1])
    assert view["train/agg/all/reward/mean"] == 0.5
    assert view["train/agg/effective/reward/mean"] == 1.0
    assert view["train/env=env_a/all/reward/mean"] == 0.5
    assert abs(view["train/agg/all/pass@1"] - 0.5) < 1e-9
    m.reset()
    assert m.view() == {}
