"""Explicit-a2a expert parallelism: parity with the GSPMD path at ample
capacity, graceful drops at tight capacity (reference: distributed/deepep.py
token dispatch/combine semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from prime_rl_tpu.ops.moe import moe_mlp
from prime_rl_tpu.ops.moe_ep import moe_mlp_ep


@pytest.fixture(scope="module")
def mesh():
    devs = np.asarray(jax.devices()[:8]).reshape(8)
    return Mesh(devs, ("expert",))


def make_weights(seed=0, e=8, d=32, m=16, t=64, k=2):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.standard_normal((t, d)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal((d, e)) * 0.5, jnp.float32),
        jnp.asarray(rng.standard_normal((e, d, m)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((e, d, m)) * 0.2, jnp.float32),
        jnp.asarray(rng.standard_normal((e, m, d)) * 0.2, jnp.float32),
    )


def test_a2a_matches_gspmd_at_full_capacity(mesh):
    x, rw, wg, wu, wd = make_weights()
    want, _ = moe_mlp(x, rw, wg, wu, wd, top_k=2, norm_topk_prob=True)

    xs = jax.device_put(x, NamedSharding(mesh, P("expert")))
    ws = [jax.device_put(w, NamedSharding(mesh, P("expert"))) for w in (wg, wu, wd)]
    rws = jax.device_put(rw, NamedSharding(mesh, P()))
    got, routing, dropped = jax.jit(
        lambda *a: moe_mlp_ep(*a, top_k=2, norm_topk_prob=True, mesh=mesh,
                              capacity_factor=16.0)
    )(xs, rws, *ws)
    assert float(dropped) == 0.0
    assert routing.expert_ids.shape == (64, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_a2a_drops_at_tight_capacity(mesh):
    # enough tokens that capacity_factor=0.25 actually binds after the
    # static round-up (512 tokens -> 128 pairs/rank, cap 8/dst)
    x, rw, wg, wu, wd = make_weights(seed=3, t=512)
    xs = jax.device_put(x, NamedSharding(mesh, P("expert")))
    ws = [jax.device_put(w, NamedSharding(mesh, P("expert"))) for w in (wg, wu, wd)]
    rws = jax.device_put(rw, NamedSharding(mesh, P()))
    got, _routing, dropped = jax.jit(
        lambda *a: moe_mlp_ep(*a, top_k=2, norm_topk_prob=True, mesh=mesh,
                              capacity_factor=0.25)
    )(xs, rws, *ws)
    assert np.isfinite(np.asarray(got)).all()
    assert 0.0 < float(dropped) < 1.0


def test_a2a_gradients_flow(mesh):
    x, rw, wg, wu, wd = make_weights(seed=5)
    xs = jax.device_put(x, NamedSharding(mesh, P("expert")))
    ws = [jax.device_put(w, NamedSharding(mesh, P("expert"))) for w in (wg, wu, wd)]
    rws = jax.device_put(rw, NamedSharding(mesh, P()))

    def loss(wg_, wu_, wd_):
        out, _r, _d = moe_mlp_ep(xs, rws, wg_, wu_, wd_, top_k=2, norm_topk_prob=True,
                                 mesh=mesh, capacity_factor=16.0)
        return jnp.sum(out ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*ws)
    for gi in g:
        assert float(jnp.abs(gi).sum()) > 0
