"""Benchmark regression gate (VERDICT r3 next-round #3): run bench.py on the
real chip and compare against the checked-in baselines at ±tolerance.
Reference: tests/integration/test_benchmark_regression.py +
benchmarks/baselines/*.json (mean/std, 5% gate).

Run with: PRIME_RL_TPU_TESTS=1 pytest tests/tpu/test_benchmark_regression.py
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[2]
BASELINES = sorted((REPO / "benchmarks" / "baselines").glob("*.json"))

pytestmark = pytest.mark.tpu


def _on_tpu() -> bool:
    if os.environ.get("PRIME_RL_TPU_TESTS") != "1":
        return False
    import jax

    return jax.default_backend() not in ("cpu",)


@pytest.mark.parametrize("baseline_path", BASELINES, ids=[p.stem for p in BASELINES])
def test_benchmark_regression(baseline_path):
    if not _on_tpu():
        pytest.skip("needs a real TPU (set PRIME_RL_TPU_TESTS=1)")
    base = json.loads(baseline_path.read_text())
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), *base["bench_args"],
         "--deadline", "900"],
        capture_output=True, text=True, timeout=1200, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # bench streams cumulative JSON lines; the last one is the result
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON output:\n{proc.stdout}\n{proc.stderr[-1000:]}"
    result = json.loads(lines[-1])
    tol = base.get("tolerance", 0.05)
    # Environment-variance-aware gating (VERDICT r4 next-round #2): when both
    # the baseline and this run carry the PIPELINED device rate (K chained
    # steps, one sync — immune to per-dispatch tunnel-latency drift), gate on
    # that; the wall-clock median becomes advisory. Otherwise fall back to
    # wall with a WIDER floor (the tunnel has been observed to drift ~15%
    # per-dispatch between sessions, which is not a code regression).
    dev_base = base.get("device_tokens_per_sec")
    dev_got = result.get("device_tok_s")
    if dev_base and dev_got:
        want, std, got, kind = dev_base["mean"], dev_base.get("std", 0.0), dev_got, "device"
        floor = want * (1 - tol) - 2 * std
    else:
        want, std, got, kind = (base["tokens_per_sec"]["mean"],
                                base["tokens_per_sec"]["std"],
                                result["value"], "wall")
        wall_tol = max(tol, base.get("wall_tolerance", 0.18))
        floor = want * (1 - wall_tol) - 2 * std
    assert got >= floor, (
        f"{baseline_path.stem}: {got:.0f} tok/s ({kind}) below regression "
        f"floor {floor:.0f} (baseline {want:.0f} ± {tol * 100:.0f}%)")
