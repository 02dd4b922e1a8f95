"""On-device kernel parity (run manually / by the driver on real TPU:
``JAX_PLATFORMS='' pytest tests/tpu -m tpu``). These checks caught a real
bug: the jax paged-attention kernel applies no softmax scale."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",), reason="needs a TPU device"
)


@requires_tpu
def test_paged_decode_attention_parity():
    from prime_rl_tpu.sampler.model import _decode_attention

    S, NH, NKV, HD, NP, PS, P = 8, 4, 2, 128, 64, 64, 8
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (S, NH, HD), jnp.bfloat16)
    k_pages = jax.random.normal(ks[1], (NKV, NP, PS, HD), jnp.bfloat16)
    v_pages = jax.random.normal(ks[2], (NKV, NP, PS, HD), jnp.bfloat16)
    lengths = jnp.array([5, 64, 65, 100, 128, 200, 300, 1], jnp.int32)
    page_table = jax.random.permutation(ks[3], NP)[: S * P].reshape(S, P).astype(jnp.int32)
    o_ref = np.asarray(_decode_attention(q, k_pages, v_pages, lengths, page_table, "xla"), np.float32)
    o_pal = np.asarray(_decode_attention(q, k_pages, v_pages, lengths, page_table, "pallas"), np.float32)
    np.testing.assert_allclose(o_pal, o_ref, atol=2e-2, rtol=2e-2)


@requires_tpu
def test_flash_attention_parity_tpu():
    from prime_rl_tpu.ops.attention import xla_attention
    from prime_rl_tpu.ops.flash_attention import flash_attention

    B, L, NH, NKV, HD = 1, 1024, 4, 2, 128
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, L, NH, HD), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, NKV, HD), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, NKV, HD), jnp.bfloat16)
    seg = jnp.concatenate([jnp.full((B, L // 2), 1), jnp.full((B, L // 2), 2)], axis=1).astype(jnp.int32)
    o_ref = np.asarray(xla_attention(q, k, v, seg, seg), np.float32)
    o_pal = np.asarray(flash_attention(q, k, v, seg, block_q=256, block_kv=256), np.float32)
    np.testing.assert_allclose(o_pal, o_ref, atol=2e-2, rtol=2e-2)
