"""Metrics server + token export (reference: tests/unit/utils/
test_metrics_server.py role)."""

import json

import httpx
import numpy as np

from prime_rl_tpu.utils.metrics_server import MetricsServer


def test_metrics_server_roundtrip():
    server = MetricsServer(host="127.0.0.1", port=0).start()
    try:
        server.update({"loss": 1.5, "train/agg/all/pass@1": 0.25, "not_numeric": "x"})
        base = f"http://127.0.0.1:{server.port}"
        text = httpx.get(f"{base}/metrics", timeout=5).text
        assert "prime_rl_loss 1.5" in text
        assert "pass_at_1" in text
        assert httpx.get(f"{base}/health", timeout=5).status_code == 200
        server.set_healthy(False)
        assert httpx.get(f"{base}/health", timeout=5).status_code == 503
    finally:
        server.stop()


def test_token_export(tmp_path):
    from prime_rl_tpu.trainer.rl.data import FakeDataLoader
    from prime_rl_tpu.trainer.rl.token_export import TokenExporter

    loader = FakeDataLoader(128, 64, 1, 2, seed=0)
    batch, _ = loader.next_batch()
    exporter = TokenExporter(tmp_path)
    t_lp = np.full(batch.input_ids.shape, -1.5, np.float32)
    path = exporter.export(3, batch, t_lp)
    rows = [json.loads(l) for l in open(path)]
    assert rows
    r = rows[0]
    assert len(r["token_ids"]) == len(r["trainer_logprobs"]) == len(r["importance_ratio"])
    assert path.with_suffix(".STABLE").exists()
