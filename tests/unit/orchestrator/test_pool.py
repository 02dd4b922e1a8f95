"""Pool selection + elastic reconciliation (reference: tests/unit/utils/
test_client.py, test_elastic.py roles)."""

import asyncio

import pytest

from prime_rl_tpu.orchestrator.pool import ElasticInferencePool, StaticInferencePool


def test_least_loaded_pick_and_release():
    pool = StaticInferencePool(["http://a:1", "http://b:1"])
    m1 = pool.pick()
    m2 = pool.pick()
    assert {m1.base_url, m2.base_url} == {"http://a:1", "http://b:1"}
    m3 = pool.pick()  # both at 1 -> either; now one has 2
    pool.release(m1.base_url)
    counts = {m.base_url: m.inflight for m in pool.members}
    assert sum(counts.values()) == 2


def test_elastic_file_discovery(tmp_path):
    urls = tmp_path / "urls.txt"
    urls.write_text("")
    pool = ElasticInferencePool(f"file://{urls}")
    assert pool._discover() == []
    urls.write_text("http://x:1\nhttp://y:2\n")
    assert pool._discover() == ["http://x:1", "http://y:2"]


def test_elastic_sync_admits_live_only(tmp_path, free_port):
    """A live stub server is admitted; a dead URL is not."""
    from aiohttp import web

    port = free_port()
    urls = tmp_path / "urls.txt"
    urls.write_text(f"http://127.0.0.1:{port}\nhttp://127.0.0.1:1\n")

    async def run():
        app = web.Application()
        app.add_routes([web.get("/liveness", lambda r: web.json_response({"policy_version": 5}))])
        runner = web.AppRunner(app)
        await runner.setup()
        await web.TCPSite(runner, "127.0.0.1", port).start()
        pool = ElasticInferencePool(f"file://{urls}", timeout=5)
        await pool.sync()
        assert len(pool.members) == 1
        assert pool.members[0].base_url == f"http://127.0.0.1:{port}"
        # dead member later: mark unhealthy and drop when gone from source
        urls.write_text("")
        await runner.cleanup()
        await pool.sync()
        assert not any(m.healthy for m in pool.members)
        await pool.sync()
        assert pool.members == []

    asyncio.run(run())


def test_elastic_adapter_reconciliation(tmp_path, free_port):
    """Registered serving adapters load onto joiners at admission and onto
    existing members on the next sync (reference: utils/elastic.py:250-400
    per-server LoRA adapter reconciliation)."""
    from aiohttp import web

    port = free_port()
    urls = tmp_path / "urls.txt"
    urls.write_text(f"http://127.0.0.1:{port}\n")
    loaded: list[tuple[str, str]] = []

    async def run():
        async def load(request):
            body = await request.json()
            loaded.append((body["lora_name"], body["lora_path"]))
            return web.json_response({"ok": True})

        app = web.Application()
        app.add_routes([
            web.get("/liveness", lambda r: web.json_response({"policy_version": 1})),
            web.post("/load_lora_adapter", load),
        ])
        runner = web.AppRunner(app)
        await runner.setup()
        await web.TCPSite(runner, "127.0.0.1", port).start()

        pool = ElasticInferencePool(f"file://{urls}", timeout=5)
        pool.register_adapter("tenant-a", "/weights/a")
        await pool.sync()  # joiner gets the pre-registered adapter
        assert loaded == [("tenant-a", "/weights/a")]
        assert pool.members[0].adapters == {"tenant-a"}

        pool.register_adapter("tenant-b", "/weights/b")
        await pool.sync()  # existing member reconciles the late registration
        assert ("tenant-b", "/weights/b") in loaded and len(loaded) == 2
        assert pool.members[0].adapters == {"tenant-a", "tenant-b"}

        await pool.sync()  # idempotent: nothing re-loads
        assert len(loaded) == 2
        await runner.cleanup()

    asyncio.run(run())
