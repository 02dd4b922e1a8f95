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
    want = base["tokens_per_sec"]["mean"]
    got = result["value"]
    # one-sided with slack: regressions beyond tolerance+2*std fail; faster
    # is always fine (update the baseline when a speedup lands)
    floor = want * (1 - tol) - 2 * base["tokens_per_sec"]["std"]
    assert got >= floor, (
        f"{baseline_path.stem}: {got:.0f} tok/s below regression floor "
        f"{floor:.0f} (baseline {want:.0f} ± {tol * 100:.0f}%)")
