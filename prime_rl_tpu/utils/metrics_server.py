"""Prometheus metrics endpoint + health probe
(reference: utils/metrics_server.py:1-259): a tiny threaded HTTP server
exposing ``/metrics`` (text format) and ``/health`` for k8s probes. Gauges
are set from the train-loop metric dicts."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

try:
    from prometheus_client import CollectorRegistry, Gauge, generate_latest

    _HAVE_PROM = True
except ImportError:  # pragma: no cover
    _HAVE_PROM = False


class MetricsServer:
    def __init__(self, host: str = "0.0.0.0", port: int = 9100, prefix: str = "prime_rl"):
        if not _HAVE_PROM:
            raise ImportError("prometheus_client not available")
        self.registry = CollectorRegistry()
        self.prefix = prefix
        self._gauges: dict[str, Gauge] = {}
        self._healthy = True
        server = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802
                if self.path.startswith("/metrics"):
                    body = generate_latest(server.registry)
                    self.send_response(200)
                    self.send_header("Content-Type", "text/plain; version=0.0.4")
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path.startswith("/health"):
                    self.send_response(200 if server._healthy else 503)
                    self.end_headers()
                    self.wfile.write(b"ok" if server._healthy else b"unhealthy")
                else:
                    self.send_response(404)
                    self.end_headers()

            def log_message(self, *args):  # silence
                pass

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_port
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def start(self) -> "MetricsServer":
        self._thread.start()
        return self

    def set_healthy(self, healthy: bool) -> None:
        self._healthy = healthy

    def update(self, metrics: dict[str, Any]) -> None:
        """Set gauges from a flat metric dict; non-numeric values skipped."""
        for name, value in metrics.items():
            try:
                value = float(value)
            except (TypeError, ValueError):
                continue
            key = name.replace("/", ":").replace("@", "_at_").replace("^", "_hat_")
            safe = "".join(c if c.isalnum() or c == "_" else "_" for c in key)
            gname = f"{self.prefix}_{safe}"
            g = self._gauges.get(gname)
            if g is None:
                g = self._gauges[gname] = Gauge(gname, name, registry=self.registry)
            g.set(value)

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


def maybe_start_metrics_server(config) -> MetricsServer | None:
    """From a MetricsServerConfig; None when disabled or unsupported."""
    if not getattr(config, "enable", False):
        return None
    try:
        return MetricsServer(config.host, config.port).start()
    except Exception:
        return None
