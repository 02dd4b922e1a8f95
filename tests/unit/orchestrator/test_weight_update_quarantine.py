"""Hardened fleet weight updates (VERDICT r3 Weak #5 / next-round #6):
pause-all then update, retry with backoff, and QUARANTINE an engine whose
/update_weights keeps failing — it must leave the pool and its pinned groups
must be cancelled, so no group ever trains on mixed policy versions.
Reference: utils/client.py:373-441 tenacity fan-out + fatal treatment."""

import asyncio
from types import SimpleNamespace

from prime_rl_tpu.orchestrator.orchestrator import GroupState, Orchestrator
from prime_rl_tpu.orchestrator.pool import PoolMember, StaticInferencePool


class _FakeEngine:
    def __init__(self, base_url, fail_update=False):
        self.base_url = base_url
        self.fail_update = fail_update
        self.calls = []
        self.version = -1

    async def pause(self):
        self.calls.append("pause")

    async def resume(self):
        self.calls.append("resume")

    async def update_weights(self, wdir, version):
        self.calls.append("update")
        if self.fail_update:
            raise ConnectionError("engine wedged")
        self.version = version


class _Stub:
    _retry = Orchestrator._retry
    _update_engines = Orchestrator._update_engines
    _quarantine_engine = Orchestrator._quarantine_engine

    def __init__(self, engines):
        self.pool = StaticInferencePool([])
        self.pool.members = [PoolMember(e) for e in engines]
        self.inflight = set()
        self.logger = SimpleNamespace(
            warning=lambda *a, **k: None, error=lambda *a, **k: None,
            info=lambda *a, **k: None)


def _group(base_url):
    g = GroupState(env_name="e", task_data={}, group_size=2,
                   policy_version_at_start=0, base_url=base_url)

    async def _hang():
        await asyncio.sleep(3600)

    async def _make(stub):
        g.tasks = [asyncio.ensure_future(_hang()) for _ in range(2)]
        stub.inflight.add(g)
        return g

    return g, _make


def test_failed_engine_is_quarantined_and_groups_cancelled():
    good = _FakeEngine("http://good")
    bad = _FakeEngine("http://bad", fail_update=True)
    stub = _Stub([good, bad])
    g_bad, make_bad = _group("http://bad")
    g_good, make_good = _group("http://good")

    async def run():
        await make_bad(stub)
        await make_good(stub)
        await stub._update_engines("/w/step_3", 3)
        await asyncio.sleep(0)  # let cancellations propagate

    asyncio.run(run())
    # good engine got the full pause/update/resume cycle and the new version
    assert good.version == 3
    assert good.calls[-1] == "resume"
    # bad engine was retried (3 attempts) then dropped from the pool
    assert bad.calls.count("update") == 3
    assert [c.base_url for c in stub.pool.clients] == ["http://good"]
    # its pinned group is cancelled with synthetic markers; the good group is untouched
    assert g_bad.cancelled and all(t.cancelled() for t in g_bad.tasks)
    assert not g_good.cancelled


def test_last_engine_is_never_quarantined():
    bad = _FakeEngine("http://only", fail_update=True)
    stub = _Stub([bad])
    g, make = _group("http://only")

    async def run():
        await make(stub)
        await stub._update_engines("/w/step_1", 1)

    asyncio.run(run())
    # pool refuses to empty itself; the group survives (better a stale engine
    # than a dead run — the operator sees the error log)
    assert [c.base_url for c in stub.pool.clients] == ["http://only"]
    assert not g.cancelled
    for t in g.tasks:
        t.cancel()


def test_retry_recovers_transient_failure():
    class _Flaky(_FakeEngine):
        async def update_weights(self, wdir, version):
            self.calls.append("update")
            if self.calls.count("update") < 2:
                raise TimeoutError("transient")
            self.version = version

    flaky = _Flaky("http://flaky")
    stub = _Stub([flaky])

    async def run():
        await stub._update_engines("/w/step_5", 5)

    asyncio.run(run())
    assert flaky.version == 5
    assert flaky.calls.count("update") == 2
    assert [c.base_url for c in stub.pool.clients] == ["http://flaky"]
