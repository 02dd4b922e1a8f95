"""Auto-routing of expert>1 meshes through the shard_map a2a path
(VERDICT r3 next-round #2): the GSPMD sort/take dispatch backward transposes
to a scatter-add the partitioner replicates ("Involuntary full
rematerialization"); the explicit a2a path must (a) kick in automatically,
(b) match the GSPMD path numerically, (c) leave the SPMD log clean."""

import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prime_rl_tpu.ops import moe as moe_mod
from prime_rl_tpu.ops.moe import moe_mlp


@pytest.fixture
def ep_mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("fsdp", "expert"))
    yield mesh
    moe_mod.set_ep_mesh(None)


def _weights(seed=0, e=8, d=32, m=16, t=64):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal((d, e)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal((e, d, m)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((e, d, m)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((e, m, d)) * 0.2, jnp.float32),
    )


def test_auto_ep_matches_gspmd(ep_mesh):
    x, rw, wg, wu, wd = _weights()
    moe_mod.set_ep_mesh(None)
    want, routing_ref = moe_mlp(x, rw, wg, wu, wd, top_k=2, norm_topk_prob=True)

    moe_mod.set_ep_mesh(ep_mesh, ("fsdp", "expert"))
    xs = jax.device_put(x, NamedSharding(ep_mesh, P(("fsdp", "expert"))))
    ws = [jax.device_put(w, NamedSharding(ep_mesh, P("expert"))) for w in (wg, wu, wd)]
    rws = jax.device_put(rw, NamedSharding(ep_mesh, P()))
    got, routing = jax.jit(
        lambda *a: moe_mlp(*a, top_k=2, norm_topk_prob=True))(xs, rws, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    # router stats survive the shard_map boundary. lb is a per-shard
    # estimator pmean'd over ranks (the usual distributed form): it tracks
    # the global value but is not bit-equal (f_i * P_i is nonlinear in the
    # token partition), so same-ballpark only.
    np.testing.assert_allclose(float(routing.load_balance_loss),
                               float(routing_ref.load_balance_loss), rtol=0.25)
    assert routing.expert_ids.shape == routing_ref.expert_ids.shape


def test_unsupported_calls_fall_back(ep_mesh):
    """gpt-oss-style per-expert biases stay on the GSPMD path (and still
    run correctly with the EP mesh registered)."""
    x, rw, wg, wu, wd = _weights(seed=2)
    b = jnp.zeros((8, 16), jnp.float32)
    moe_mod.set_ep_mesh(ep_mesh, ("fsdp", "expert"))
    out, _ = moe_mlp(x, rw, wg, wu, wd, top_k=2, norm_topk_prob=True,
                     b_gate=b, b_up=b, b_down=jnp.zeros((8, 32)))
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_moe_dryrun_spmd_log_is_clean():
    """The full multichip MoE dryrun leg must compile with no involuntary
    full rematerialization (the r3 pathology). Subprocess: the warning is
    emitted by XLA C++ on stderr."""
    code = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=1200,
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"},
        cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "moe ok" in proc.stdout
    assert "Involuntary full rematerialization" not in proc.stderr
