"""Engine-metrics scraping rolls up per deployment role behind an allowlist
(VERDICT r3 Weak #6): step records carry `inference/{role}/{metric}/{stat}`
keys only — cardinality bounded by the metric table, not the fleet size.
Reference: orchestrator/inference_metrics.py:136 per-node/role rollup."""

import asyncio
from types import SimpleNamespace

from prime_rl_tpu.orchestrator.orchestrator import Orchestrator


def _engine_text(role, requests, active, free_pages, version):
    return "\n".join([
        f'prime_rl_engine_info{{role="{role}"}} 1',
        f"prime_rl_engine_requests_total {requests}",
        f"prime_rl_engine_active_requests {active}",
        f"prime_rl_engine_free_kv_pages {free_pages}",
        f"prime_rl_engine_policy_version {version}",
        "prime_rl_engine_unlisted_metric 42",        # not in the allowlist
        "prime_rl_engine_requests_aborted_total 1",
    ])


class _Stub(SimpleNamespace):
    _ENGINE_METRIC_ROLLUP = Orchestrator._ENGINE_METRIC_ROLLUP
    _scrape_engine_metrics = Orchestrator._scrape_engine_metrics


class _FakeClient:
    def __init__(self, text):
        self.base_url = "http://x"
        self._client = SimpleNamespace(get=self._get)
        self._text = text

    async def _get(self, url, timeout=None):
        return SimpleNamespace(text=self._text)


def test_rollup_per_role_with_allowlist():
    stub = _Stub(pool=SimpleNamespace(clients=[
        _FakeClient(_engine_text("decode", 10, 3, 100, 7)),
        _FakeClient(_engine_text("decode", 30, 1, 50, 8)),
        _FakeClient(_engine_text("prefill", 5, 2, 10, 8)),
    ]))
    out = asyncio.run(stub._scrape_engine_metrics())

    assert out["inference/decode/num_engines"] == 2
    assert out["inference/prefill/num_engines"] == 1
    assert out["inference/decode/requests_total/sum"] == 40
    assert out["inference/decode/active_requests/sum"] == 4
    assert out["inference/decode/active_requests/max"] == 3
    assert out["inference/decode/free_kv_pages/mean"] == 75
    assert out["inference/decode/free_kv_pages/min"] == 50
    # version skew across a role is visible as min != max
    assert out["inference/decode/policy_version/min"] == 7
    assert out["inference/decode/policy_version/max"] == 8
    assert out["inference/prefill/requests_total/sum"] == 5
    # nothing outside the allowlist, no per-engine keys
    assert not [k for k in out if "unlisted" in k]
    assert not [k for k in out if k.startswith("inference/0/")]


def test_rollup_defaults_to_mixed_and_survives_dead_engines():
    class _DeadClient(_FakeClient):
        async def _get(self, url, timeout=None):
            raise ConnectionError("down")

    text = "\n".join([  # no info line -> role defaults to mixed
        "prime_rl_engine_requests_total 2",
        "prime_rl_engine_policy_version 3",
    ])
    stub = _Stub(pool=SimpleNamespace(clients=[
        _FakeClient(text), _DeadClient(""),
    ]))
    out = asyncio.run(stub._scrape_engine_metrics())
    assert out["inference/mixed/num_engines"] == 1
    assert out["inference/mixed/requests_total/sum"] == 2
