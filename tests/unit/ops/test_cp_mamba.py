"""Context-parallel Mamba SSD: sharded conv+scan must equal the single-
program mixer, including packed segments crossing rank boundaries and
gradients through the carry chain (reference: cp_mamba.py:1-249 behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.configs import MeshConfig
from prime_rl_tpu.ops.mamba import mamba2_mixer
from prime_rl_tpu.parallel.mesh import build_mesh

H, P, G, N, D_MODEL, K, CHUNK = 4, 16, 2, 8, 32, 4, 8
INTER = H * P


def make_lp(seed=0):
    rng = np.random.default_rng(seed)
    conv_dim = INTER + 2 * G * N

    def w(*shape, scale=0.1):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    return {
        "in_proj": w(D_MODEL, INTER + conv_dim + H),
        "conv_w": w(conv_dim, K),
        "conv_b": w(conv_dim),
        "A_log": jnp.asarray(rng.uniform(0.2, 0.7, size=(H,)).astype(np.float32)),
        "D": w(H, scale=1.0),
        "dt_bias": jnp.asarray(rng.uniform(0.2, 0.7, size=(H,)).astype(np.float32)),
        "ssm_norm": jnp.ones((INTER,), jnp.float32),
        "out_proj": w(INTER, D_MODEL),
    }


def run(lp, x, seg, mesh=None):
    return mamba2_mixer(
        x, lp, num_heads=H, head_dim=P, ssm_state_size=N, n_groups=G,
        chunk_size=CHUNK, segment_ids=seg, mesh=mesh)


@pytest.mark.parametrize("cp", [2, 4])
def test_cp_matches_single_program(cp):
    mesh = build_mesh(MeshConfig(fsdp=8 // cp, context=cp)).mesh
    rng = np.random.default_rng(1)
    B, L = 2, 64
    x = jnp.asarray(rng.normal(size=(B, L, D_MODEL)).astype(np.float32) * 0.5)
    # segments cross rank boundaries at cp=2 and cp=4 (cuts at 24 and 49)
    seg = jnp.asarray(np.concatenate(
        [np.full((B, 24), 1), np.full((B, 25), 2), np.full((B, 15), 3)],
        axis=1).astype(np.int32))
    lp = make_lp()
    want = np.asarray(run(lp, x, seg))
    got = np.asarray(jax.jit(lambda x: run(lp, x, seg, mesh=mesh))(x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_cp_backward_matches():
    mesh = build_mesh(MeshConfig(fsdp=2, context=4)).mesh
    rng = np.random.default_rng(2)
    B, L = 1, 64
    x = jnp.asarray(rng.normal(size=(B, L, D_MODEL)).astype(np.float32) * 0.5)
    seg = jnp.ones((B, L), jnp.int32)
    lp = make_lp(3)

    def loss(x, mesh=None):
        return jnp.sum(jnp.sin(run(lp, x, seg, mesh=mesh)))

    g_single = np.asarray(jax.grad(loss)(x))
    g_cp = np.asarray(jax.jit(jax.grad(lambda x: loss(x, mesh=mesh)))(x))
    np.testing.assert_allclose(g_cp, g_single, rtol=5e-4, atol=5e-4)


def test_cp_rejects_misaligned_chunks():
    mesh = build_mesh(MeshConfig(context=4, fsdp=2)).mesh
    x = jnp.zeros((1, 40, D_MODEL))  # 40/4=10, not a multiple of CHUNK=8
    with pytest.raises(ValueError, match="chunk_size"):
        run(make_lp(), x, jnp.ones((1, 40), jnp.int32), mesh=mesh)
