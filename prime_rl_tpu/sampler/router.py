"""Inference router: one client-facing URL fronting many engine replicas
(reference: docs/inference.md "Router" — the vllm-router / llm-d EPP role).

Policies:
- ``consistent_hash`` (default): requests hash by the ``X-Session-ID``
  header (falling back to the body's ``cache_salt``, then to least-loaded)
  onto a vnode hash ring — every request of one rollout lands on the same
  engine, so the engine's prefix cache re-serves the shared prompt across
  turns (reference routing policy ``consistent_hash``).
- ``round_robin``: uniform spread, for unsaturated workloads.
- ``least_loaded``: pick the backend with the fewest in-flight proxied
  requests (the llm-d ``active-request-scorer`` analogue — an in-process
  counter, not a lagging scraped metric).

Liveness: a background task polls each backend's ``/liveness``; dead
backends leave the ring (their hash range redistributes) and rejoin on
recovery. Admin operations (pause/update_weights) bypass the router and hit
engines directly, exactly like the reference deployment layout.
"""

from __future__ import annotations

import asyncio
import bisect
import hashlib
import json

from aiohttp import ClientSession, ClientTimeout, web

from prime_rl_tpu.utils.logger import get_logger

_HOP_HEADERS = {"host", "content-length", "transfer-encoding", "connection", "keep-alive"}


class HashRing:
    """Consistent hashing with virtual nodes."""

    def __init__(self, nodes: list[str], vnodes: int = 64):
        self.vnodes = vnodes
        self._ring: list[tuple[int, str]] = []
        for n in nodes:
            self.add(n)

    @staticmethod
    def _hash(key: str) -> int:
        return int.from_bytes(hashlib.sha1(key.encode()).digest()[:8], "big")

    def add(self, node: str) -> None:
        for i in range(self.vnodes):
            self._ring.append((self._hash(f"{node}#{i}"), node))
        self._ring.sort()

    def remove(self, node: str) -> None:
        self._ring = [(h, n) for h, n in self._ring if n != node]

    def pick(self, key: str) -> str | None:
        if not self._ring:
            return None
        h = self._hash(key)
        i = bisect.bisect(self._ring, (h, ""))
        return self._ring[i % len(self._ring)][1]

    @property
    def nodes(self) -> set[str]:
        return {n for _, n in self._ring}


class Router:
    def __init__(self, backends: list[str], policy: str = "consistent_hash",
                 health_interval: float = 2.0, request_timeout: float = 600.0,
                 prefill_backends: list[str] | None = None,
                 pd_threshold: int = 16):
        self.all_backends = [b.rstrip("/") for b in backends]
        self.policy = policy
        self.health_interval = health_interval
        # P/D disaggregation (reference: docs/inference.md optimized P/D):
        # prompts >= pd_threshold tokens prefill on a prefill-role engine,
        # then the KV blob injects into the session-affine decode engine.
        # Below the threshold (llm-d non_cached_tokens), skip remote prefill.
        self.prefill_backends = [b.rstrip("/") for b in (prefill_backends or [])]
        self.pd_threshold = pd_threshold
        self.prefill_live: set[str] = set(self.prefill_backends)
        self.prefill_inflight: dict[str, int] = {b: 0 for b in self.prefill_backends}
        self.ring = HashRing(self.all_backends)
        self.live: set[str] = set(self.all_backends)
        self.inflight: dict[str, int] = {b: 0 for b in self.all_backends}
        self._rr = 0
        self._session: ClientSession | None = None
        self._timeout = ClientTimeout(total=request_timeout)
        self.app = web.Application(client_max_size=256 * 1024 * 1024)
        self.app.add_routes([
            web.get("/liveness", self.liveness),
            web.get("/health", self.liveness),
            web.get("/backends", self.backends_view),
            web.route("*", "/{tail:.*}", self.proxy),
        ])
        self.app.on_startup.append(self._startup)
        self.app.on_cleanup.append(self._cleanup)

    async def _startup(self, app) -> None:
        self._session = ClientSession(timeout=self._timeout)
        self._health_task = asyncio.create_task(self._health_loop())

    async def _cleanup(self, app) -> None:
        self._health_task.cancel()
        if self._session is not None:
            await self._session.close()

    # -- backend selection ---------------------------------------------------

    def _pick(self, session_key: str | None) -> str | None:
        live = [b for b in self.all_backends if b in self.live]
        if not live:
            return None
        if self.policy == "round_robin" or session_key is None and self.policy == "consistent_hash":
            if self.policy == "consistent_hash" and session_key is None:
                # no session key: fall back to spreading by load
                return min(live, key=lambda b: self.inflight[b])
            self._rr += 1
            return live[self._rr % len(live)]
        if self.policy == "least_loaded":
            return min(live, key=lambda b: self.inflight[b])
        node = self.ring.pick(session_key)
        return node if node in self.live else min(live, key=lambda b: self.inflight[b])

    @staticmethod
    def _session_key(request: web.Request, body: bytes) -> str | None:
        sid = request.headers.get("X-Session-ID")
        if sid:
            return sid
        if body:
            try:
                parsed = json.loads(body)
                return parsed.get("cache_salt") or (parsed.get("sampling_params") or {}).get("cache_salt")
            except Exception:
                return None
        return None

    # -- routes ---------------------------------------------------------------

    async def liveness(self, request: web.Request) -> web.Response:
        return web.json_response({"live_backends": sorted(self.live),
                                  "policy": self.policy})

    async def backends_view(self, request: web.Request) -> web.Response:
        return web.json_response({
            b: {"live": b in self.live, "inflight": self.inflight[b]}
            for b in self.all_backends
        })

    async def proxy(self, request: web.Request) -> web.StreamResponse:
        body = await request.read()
        backend = self._pick(self._session_key(request, body))
        if backend is None:
            return web.json_response({"error": "no live backends"}, status=503)
        if (self.prefill_backends and request.method == "POST"
                and request.path.endswith("/inference/v1/generate")):
            pd = await self._maybe_pd(request, body, backend)
            if pd is not None:
                return pd
        url = f"{backend}/{request.match_info['tail']}"
        if request.query_string:
            url += f"?{request.query_string}"
        headers = {k: v for k, v in request.headers.items()
                   if k.lower() not in _HOP_HEADERS}
        self.inflight[backend] += 1
        try:
            async with self._session.request(
                request.method, url, data=body or None, headers=headers
            ) as upstream:
                resp = web.StreamResponse(status=upstream.status)
                for k, v in upstream.headers.items():
                    if k.lower() not in _HOP_HEADERS:
                        resp.headers[k] = v
                await resp.prepare(request)
                async for chunk in upstream.content.iter_chunked(1 << 16):
                    await resp.write(chunk)
                await resp.write_eof()
                return resp
        except (asyncio.CancelledError, ConnectionResetError):
            raise
        except Exception as e:
            get_logger().warning(f"router: backend {backend} failed: {type(e).__name__}: {e}")
            self.live.discard(backend)
            return web.json_response({"error": f"backend error: {e}"}, status=502)
        finally:
            self.inflight[backend] -= 1

    async def _maybe_pd(self, request: web.Request, body: bytes,
                        decode_backend: str) -> web.Response | None:
        """Disaggregated generate: prefill on a prefill-role engine, inject
        the KV into the decode engine. Returns None to fall through to the
        plain proxy (short prompt / no live prefill engines)."""
        try:
            parsed = json.loads(body)
        except Exception:
            return None
        ids = parsed.get("token_ids") or []
        live_p = [b for b in self.prefill_backends if b in self.prefill_live]
        if len(ids) < self.pd_threshold or not live_p or parsed.get("mm"):
            return None
        from prime_rl_tpu.transport.types import pack, unpack

        prefill_b = min(live_p, key=lambda b: self.prefill_inflight[b])
        sp = parsed.get("sampling_params", {})
        self.prefill_inflight[prefill_b] += 1
        try:
            async with self._session.post(
                f"{prefill_b}/pd/prefill",
                data=pack({"token_ids": ids, "sampling_params": sp}),
            ) as r:
                if r.status != 200:
                    return None  # fall back to monolithic serving
                blob = unpack(await r.read())
        except Exception as e:
            get_logger().warning(f"router: P/D prefill failed on {prefill_b}: {e}")
            self.prefill_live.discard(prefill_b)
            return None
        finally:
            self.prefill_inflight[prefill_b] -= 1

        inject = {
            "token_ids": ids, "sampling_params": sp,
            "request_id": parsed.get("request_id"),
            "k": blob["k"], "v": blob.get("v"), "r": blob.get("r"),
            "first_token": blob["first_token"],
            "first_logprob": blob["first_logprob"],
            "pos_delta": blob["pos_delta"],
        }
        self.inflight[decode_backend] += 1
        try:
            async with self._session.post(f"{decode_backend}/pd/inject",
                                          data=pack(inject)) as r:
                return web.Response(body=await r.read(), status=r.status,
                                    content_type="application/json")
        except Exception as e:
            get_logger().warning(f"router: P/D inject failed on {decode_backend}: {e}")
            self.live.discard(decode_backend)
            return web.json_response({"error": f"decode backend error: {e}"}, status=502)
        finally:
            self.inflight[decode_backend] -= 1

    # -- health ---------------------------------------------------------------

    async def _health_loop(self) -> None:
        logger = get_logger()
        while True:
            await asyncio.sleep(self.health_interval)
            for b in self.prefill_backends:
                try:
                    async with self._session.get(
                        f"{b}/liveness", timeout=ClientTimeout(total=2.0)
                    ) as r:
                        ok = r.status == 200
                except Exception:
                    ok = False
                if ok:
                    self.prefill_live.add(b)
                else:
                    self.prefill_live.discard(b)
            for b in self.all_backends:
                try:
                    async with self._session.get(
                        f"{b}/liveness", timeout=ClientTimeout(total=2.0)
                    ) as r:
                        ok = r.status == 200
                except Exception:
                    ok = False
                if ok and b not in self.live:
                    logger.info(f"router: backend {b} recovered")
                    self.live.add(b)
                elif not ok and b in self.live:
                    logger.warning(f"router: backend {b} down")
                    self.live.discard(b)

    async def start_async(self, host: str, port: int) -> web.AppRunner:
        runner = web.AppRunner(self.app)
        await runner.setup()
        site = web.TCPSite(runner, host, port)
        await site.start()
        return runner

    def run(self, host: str = "0.0.0.0", port: int = 8000) -> None:
        web.run_app(self.app, host=host, port=port, print=None)
