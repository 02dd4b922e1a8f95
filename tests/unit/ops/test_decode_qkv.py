"""Fused decode QKV-prep kernel (ops/decode_qkv.py) vs the XLA chain
(rms_norm -> projections -> qk-norm -> rope), in Pallas interpret mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.ops.decode_qkv import decode_qkv_prep, fits_vmem
from prime_rl_tpu.ops.layers import apply_rope, rms_norm


@pytest.mark.parametrize("qk_norm,bias,partial", [
    (True, False, False),   # qwen3-style
    (False, True, False),   # gpt-oss-style biases
    (True, False, True),    # partial rotary
])
def test_parity_vs_xla_chain(qk_norm, bias, partial):
    rng = np.random.default_rng(0)
    S, D, NH, NKV, HD = 8, 64, 4, 2, 16
    h = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    nw = jnp.asarray(rng.standard_normal(D), jnp.float32)
    wq = jnp.asarray(rng.standard_normal((D, NH * HD)) * 0.1, jnp.float32)
    wk = jnp.asarray(rng.standard_normal((D, NKV * HD)) * 0.1, jnp.float32)
    wv = jnp.asarray(rng.standard_normal((D, NKV * HD)) * 0.1, jnp.float32)
    qn = jnp.asarray(rng.standard_normal(HD), jnp.float32) if qk_norm else None
    kn = jnp.asarray(rng.standard_normal(HD), jnp.float32) if qk_norm else None
    qb = jnp.asarray(rng.standard_normal(NH * HD), jnp.float32) if bias else None
    kb = jnp.asarray(rng.standard_normal(NKV * HD), jnp.float32) if bias else None
    vb = jnp.asarray(rng.standard_normal(NKV * HD), jnp.float32) if bias else None
    pos = jnp.asarray(rng.integers(0, 300, S), jnp.int32)
    rot = HD // 2 if partial else HD
    inv = jnp.asarray(1.0 / (1e4 ** (np.arange(0, rot, 2) / rot)), jnp.float32)

    def ref():
        x = rms_norm(h[:, None, :], nw, 1e-6)
        q = jnp.dot(x, wq)
        k = jnp.dot(x, wk)
        v = jnp.dot(x, wv)
        if bias:
            q, k, v = q + qb, k + kb, v + vb
        q = q.reshape(S, 1, NH, HD)
        k = k.reshape(S, 1, NKV, HD)
        v = v.reshape(S, 1, NKV, HD)
        if qk_norm:
            q = rms_norm(q, qn, 1e-6)
            k = rms_norm(k, kn, 1e-6)
        q = apply_rope(q, pos[:, None], inv, 1.1)
        k = apply_rope(k, pos[:, None], inv, 1.1)
        return q[:, 0], k[:, 0], v[:, 0]

    rq, rk, rv = ref()
    fq, fk, fv = decode_qkv_prep(
        h, nw, wq, wk, wv, pos, inv,
        num_heads=NH, num_kv_heads=NKV, head_dim=HD, qk_norm=qk_norm,
        q_norm_w=qn, k_norm_w=kn, q_bias=qb, k_bias=kb, v_bias=vb,
        scaling=1.1, eps=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(rq), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fk), np.asarray(rk), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(fv), np.asarray(rv), atol=2e-5, rtol=2e-5)


def test_fits_vmem_gate():
    assert fits_vmem(1024, 16, 8, 128)        # qwen3-0.6B
    assert not fits_vmem(5120, 40, 8, 128)    # qwen3-14B: stream via XLA
