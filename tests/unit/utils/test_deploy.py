"""Deployment templating (reference: entrypoints/rl.py:421-615 SLURM mode)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[3]


def render(tmp_path, *extra):
    out = tmp_path / "run"
    proc = subprocess.run(
        [sys.executable, "-m", "prime_rl_tpu.entrypoints.rl",
         f"@{REPO}/configs/debug/rl.toml", "--output-dir", str(out), *extra],
        capture_output=True, text=True, cwd=REPO,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return out / "deploy"


def test_slurm_multi_template(tmp_path):
    d = render(tmp_path, "--deploy.type", "slurm_multi",
               "--deploy.trainer-hosts", "8", "--deploy.sampler-hosts", "4")
    text = (d / "prime-rl-tpu.sbatch").read_text()
    assert "#SBATCH --nodes=12" in text
    assert "PRIME_RL_NUM_PROCESSES=8" in text
    assert "prime_rl_tpu.entrypoints.orchestrator" in text
    assert "prime_rl_tpu.entrypoints.inference" in text


def test_slurm_pd_disaggregated_template(tmp_path):
    """P/D-disaggregated topology (VERDICT r4 next-round #10): prefill/decode
    role split + router wiring, orchestrator fronted by the router only."""
    d = render(tmp_path, "--deploy.type", "slurm_pd",
               "--deploy.trainer-hosts", "4", "--deploy.prefill-hosts", "2",
               "--deploy.decode-hosts", "3", "--deploy.pd-threshold", "256")
    text = (d / "prime-rl-tpu.sbatch").read_text()
    # 4 trainer + 1 router/orch + 2 prefill + 3 decode
    assert "#SBATCH --nodes=10" in text
    assert "T=4" in text and "P=2" in text and "D=3" in text
    assert "PRIME_RL_NUM_PROCESSES=" in text
    assert "--server.role prefill" in text
    assert "--server.role decode" in text
    assert "entrypoints.router" in text
    assert "pd_threshold = 256" in text
    # orchestrator talks to the ROUTER, not engines directly
    assert "--client.base-urls" in text and "ROUTER_HOST" in text


def test_gke_template_parses(tmp_path):
    import yaml

    d = render(tmp_path, "--deploy.type", "gke", "--deploy.trainer-hosts", "4")
    doc = yaml.safe_load((d / "prime-rl-tpu.yaml").read_text())
    jobs = {j["name"]: j for j in doc["spec"]["replicatedJobs"]}
    assert jobs["trainer"]["template"]["spec"]["parallelism"] == 4
    assert "sampler" in jobs and "orchestrator" in jobs
