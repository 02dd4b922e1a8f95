"""Router: consistent-hash session affinity, load spreading, failover, and
admin bypass semantics (reference: docs/inference.md Router — vllm-router
consistent_hash policy + llm-d active-request-scorer)."""

import asyncio

import pytest
from aiohttp import ClientSession, web

from prime_rl_tpu.sampler.router import HashRing, Router


def make_backend(name: str, hits: dict):
    async def generate(request: web.Request):
        hits.setdefault(name, 0)
        hits[name] += 1
        body = await request.json()
        return web.json_response({"backend": name, "echo": body.get("x")})

    async def liveness(request: web.Request):
        return web.json_response({"ok": True})

    app = web.Application()
    app.add_routes([web.post("/inference/v1/generate", generate),
                    web.get("/liveness", liveness)])
    return app


async def _start(app, port):
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", port)
    await site.start()
    return runner


def test_hash_ring_stability():
    ring = HashRing(["a", "b", "c"])
    picks = {k: ring.pick(k) for k in map(str, range(200))}
    assert all(ring.pick(k) == v for k, v in picks.items())  # deterministic
    assert len({*picks.values()}) == 3  # all nodes used
    ring.remove("b")
    moved = sum(1 for k, v in picks.items() if v != "b" and ring.pick(k) != v)
    assert moved == 0  # only keys on the removed node re-map


def test_router_affinity_and_failover(free_port):
    hits: dict[str, int] = {}
    p1, p2, pr = free_port(), free_port(), free_port()

    async def run():
        r1 = await _start(make_backend("b1", hits), p1)
        r2 = await _start(make_backend("b2", hits), p2)
        router = Router([f"http://127.0.0.1:{p1}", f"http://127.0.0.1:{p2}"],
                        policy="consistent_hash", health_interval=0.2)
        rr = await router.start_async("127.0.0.1", pr)
        base = f"http://127.0.0.1:{pr}"
        async with ClientSession() as c:
            # same session id -> same backend, every time
            seen = set()
            for _ in range(6):
                async with c.post(f"{base}/inference/v1/generate", json={"x": 1},
                                  headers={"X-Session-ID": "traj-42"}) as r:
                    assert r.status == 200
                    seen.add((await r.json())["backend"])
            assert len(seen) == 1
            # many sessions -> both backends participate
            backs = set()
            for i in range(40):
                async with c.post(f"{base}/inference/v1/generate", json={"x": i},
                                  headers={"X-Session-ID": f"t{i}"}) as r:
                    backs.add((await r.json())["backend"])
            assert backs == {"b1", "b2"}
            # cache_salt in the body works as the affinity key too
            seen2 = set()
            for _ in range(4):
                async with c.post(f"{base}/inference/v1/generate",
                                  json={"x": 2, "cache_salt": "g7"}) as r:
                    seen2.add((await r.json())["backend"])
            assert len(seen2) == 1

            # failover: kill one backend, wait a health tick, all traffic
            # lands on the survivor
            await r1.cleanup()
            await asyncio.sleep(0.6)
            for i in range(6):
                async with c.post(f"{base}/inference/v1/generate", json={"x": i},
                                  headers={"X-Session-ID": f"t{i}"}) as r:
                    assert r.status == 200
                    assert (await r.json())["backend"] == "b2"
        await rr.cleanup()
        await r2.cleanup()

    asyncio.run(run())


def test_round_robin_spreads(free_port):
    hits: dict[str, int] = {}
    p1, p2, pr = free_port(), free_port(), free_port()

    async def run():
        r1 = await _start(make_backend("b1", hits), p1)
        r2 = await _start(make_backend("b2", hits), p2)
        router = Router([f"http://127.0.0.1:{p1}", f"http://127.0.0.1:{p2}"],
                        policy="round_robin", health_interval=5.0)
        rr = await router.start_async("127.0.0.1", pr)
        async with ClientSession() as c:
            for i in range(10):
                async with c.post(f"http://127.0.0.1:{pr}/inference/v1/generate",
                                  json={"x": i}) as r:
                    assert r.status == 200
        assert hits["b1"] == 5 and hits["b2"] == 5
        await rr.cleanup(); await r1.cleanup(); await r2.cleanup()

    asyncio.run(run())
