"""Ring-attention CP parity vs single-program attention, fwd + bwd
(reference role: ring CP correctness, ring_attn.py / docs/scaling.md:106-118)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.configs import MeshConfig
from prime_rl_tpu.ops.attention import xla_attention
from prime_rl_tpu.ops.ring_attention import ring_attention
from prime_rl_tpu.parallel.mesh import build_mesh


@pytest.mark.parametrize("nkv", [2, 4])
def test_ring_matches_single_program(nkv):
    mesh_info = build_mesh(MeshConfig(fsdp=2, context=4))
    B, L, NH, HD = 2, 64, 4, 16
    ks = jax.random.split(jax.random.key(0), 3)
    q = jax.random.normal(ks[0], (B, L, NH, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, nkv, HD), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, nkv, HD), jnp.float32)
    # packed: two segments + trailing pad
    seg = jnp.concatenate(
        [jnp.full((B, 24), 1), jnp.full((B, 24), 2), jnp.zeros((B, 16))], axis=1
    ).astype(jnp.int32)
    want = np.asarray(xla_attention(q, k, v, seg, seg))
    got = jax.jit(lambda *a: ring_attention(*a, mesh_info.mesh))(q, k, v, seg)
    # pad positions attend nothing -> undefined; compare valid positions only
    valid = np.asarray(seg != 0)
    np.testing.assert_allclose(
        np.asarray(got)[valid], want[valid], atol=1e-5, rtol=1e-5
    )


def test_ring_backward():
    mesh_info = build_mesh(MeshConfig(context=4, fsdp=2))
    B, L, NH, NKV, HD = 1, 32, 4, 2, 8
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, L, NH, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, NKV, HD), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, NKV, HD), jnp.float32)
    seg = jnp.ones((B, L), jnp.int32)

    gu = jax.jit(jax.grad(lambda q, k, v: jnp.sum(
        ring_attention(q, k, v, seg, mesh_info.mesh) ** 2), argnums=(0, 1, 2)))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        xla_attention(q, k, v, seg, seg) ** 2), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gu, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_train_step_with_ring_cp():
    from prime_rl_tpu.configs import TrainerConfig
    from prime_rl_tpu.models.base import debug_spec
    from prime_rl_tpu.trainer import step as step_lib
    from prime_rl_tpu.trainer.optim import make_optimizer
    from prime_rl_tpu.trainer.rl.data import FakeDataLoader
    from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step

    cfg = TrainerConfig()
    cfg.model.attn.impl = "xla"
    cfg.model.cp_style = "ring"
    cfg.model.lm_head_chunk_size = 0
    spec = debug_spec(num_layers=2)
    mesh_info = build_mesh(MeshConfig(fsdp=2, context=2, tensor=2))
    opt, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    state = init_train_state(spec, mesh_info, opt, seed=0)
    ts = make_train_step(spec, cfg.model, cfg.loss, opt, mesh_info)
    loader = FakeDataLoader(spec.vocab_size, 128, 2, 2, seed=7)
    batch, counts = loader.next_batch()
    batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
    scales = Scales(jnp.float32(max(counts["rl"], 1)), jnp.float32(1), jnp.float32(1))
    _, metrics = ts(state, batch, scales)
    assert np.isfinite(float(metrics["loss"]))
