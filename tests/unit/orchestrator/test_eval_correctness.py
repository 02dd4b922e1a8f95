"""Per-env eval correctness config (VERDICT r3 Weak #7): pass@k must be
meaningful for continuous-reward envs — `reward >= 1.0` is only the fallback,
and both the metric name and the threshold are configurable per env."""

from types import SimpleNamespace

from prime_rl_tpu.configs.orchestrator import EvalSourceConfig
from prime_rl_tpu.orchestrator.metrics import RolloutMetrics
from prime_rl_tpu.orchestrator.orchestrator import EvalRun, GroupState, Orchestrator


class _Stub:
    """Bare state needed by Orchestrator._process_eval_group."""

    _process_eval_group = Orchestrator._process_eval_group

    def __init__(self, cfg):
        self.eval_sources = {cfg.name: SimpleNamespace(config=cfg)}
        self._eval_runs = {}
        self.monitor = SimpleNamespace(log=lambda *a, **k: None)
        self.logger = SimpleNamespace(info=lambda *a, **k: None)


def _rollout(reward, metrics=None):
    return SimpleNamespace(
        reward=reward, episode=SimpleNamespace(metrics=metrics or {}))


def _run_group(cfg, rollouts):
    stub = _Stub(cfg)
    run = EvalRun(env_name=cfg.name, eval_step=0, num_groups=2,
                  metrics=RolloutMetrics("eval"))
    stub._eval_runs[(cfg.name, 0)] = run
    group = GroupState(env_name=cfg.name, task_data={}, group_size=len(rollouts),
                      policy_version_at_start=0, kind="eval", eval_step=0)
    group.rollouts = rollouts
    stub._process_eval_group(group)
    return run


def _pass_at_1(run):
    view = run.metrics.view()
    key = next((k for k in view if "pass@1" in k or "pass_at_1" in k), None)
    return view.get(key) if key else None


def test_continuous_reward_env_with_threshold():
    # a 0.99-reward continuous env: old heuristic reported pass@k = 0
    cfg = EvalSourceConfig(name="cont", correct_threshold=0.5)
    run = _run_group(cfg, [_rollout(0.99), _rollout(0.4), _rollout(0.7)])
    g = run.metrics._groups["env=cont"][-1]
    assert g == (2, 3)


def test_explicit_correct_metric_wins_over_reward():
    cfg = EvalSourceConfig(name="m", correct_metric="solved")
    run = _run_group(cfg, [
        _rollout(0.0, {"solved": 1}),   # low reward, but env says solved
        _rollout(1.0, {"solved": 0}),   # full reward, env says unsolved
        _rollout(1.0, {}),              # metric missing -> not correct
    ])
    assert run.metrics._groups["env=m"][-1] == (1, 3)


def test_env_emitted_correct_metric_auto_detected():
    cfg = EvalSourceConfig(name="auto")
    run = _run_group(cfg, [
        _rollout(0.2, {"correct": True}),
        _rollout(0.9, {"exact": 0}),
        _rollout(1.0),                  # fallback: reward >= 1.0
        _rollout(0.99),
    ])
    assert run.metrics._groups["env=auto"][-1] == (2, 4)
