"""XLA attention semantics: causality, segment isolation, GQA."""

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.ops.attention import make_position_ids, make_segment_ids, xla_attention


def naive_attention(q, k, v, causal=True):
    # single sequence, [L, H, D]
    scale = q.shape[-1] ** -0.5
    scores = np.einsum("qhd,khd->hqk", q, k) * scale
    if causal:
        l = q.shape[0]
        mask = np.tril(np.ones((l, l), bool))
        scores = np.where(mask, scores, -1e30)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    return np.einsum("hqk,khd->qhd", np.asarray(probs), v)


def test_matches_naive_single_sequence():
    rng = np.random.default_rng(0)
    l, h, d = 12, 4, 8
    q = rng.normal(size=(l, h, d)).astype(np.float32)
    k = rng.normal(size=(l, h, d)).astype(np.float32)
    v = rng.normal(size=(l, h, d)).astype(np.float32)
    seg = np.ones((1, l), np.int32)
    out = xla_attention(jnp.asarray(q[None]), jnp.asarray(k[None]), jnp.asarray(v[None]), seg, seg)
    np.testing.assert_allclose(np.asarray(out)[0], naive_attention(q, k, v), rtol=1e-5, atol=1e-5)


def test_gqa_repeat():
    rng = np.random.default_rng(0)
    l, nh, nkv, d = 8, 4, 2, 8
    q = rng.normal(size=(1, l, nh, d)).astype(np.float32)
    k = rng.normal(size=(1, l, nkv, d)).astype(np.float32)
    v = rng.normal(size=(1, l, nkv, d)).astype(np.float32)
    seg = np.ones((1, l), np.int32)
    out = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), seg, seg)
    # head i should equal full attention with kv head i//2 replicated
    k_rep = np.repeat(k, 2, axis=2)
    v_rep = np.repeat(v, 2, axis=2)
    ref = xla_attention(jnp.asarray(q), jnp.asarray(k_rep), jnp.asarray(v_rep), seg, seg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_segment_isolation():
    rng = np.random.default_rng(0)
    l, h, d = 16, 2, 4
    q = rng.normal(size=(1, l, h, d)).astype(np.float32)
    k = rng.normal(size=(1, l, h, d)).astype(np.float32)
    v = rng.normal(size=(1, l, h, d)).astype(np.float32)
    seg = np.asarray(make_segment_ids([8, 8], l))[None]
    out = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), seg, seg))
    # second segment must equal standalone attention over its own tokens
    out_b = naive_attention(q[0, 8:], k[0, 8:], v[0, 8:])
    np.testing.assert_allclose(out[0, 8:], out_b, rtol=1e-5, atol=1e-5)


def test_padding_attends_nothing_and_is_hidden():
    rng = np.random.default_rng(0)
    l = 8
    q = rng.normal(size=(1, l, 1, 4)).astype(np.float32)
    k = rng.normal(size=(1, l, 1, 4)).astype(np.float32)
    v = rng.normal(size=(1, l, 1, 4)).astype(np.float32)
    seg = np.asarray(make_segment_ids([4], l))[None]  # tail 4 tokens are pad (0)
    out = np.asarray(xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), seg, seg))
    ref = naive_attention(q[0, :4], k[0, :4], v[0, :4])
    np.testing.assert_allclose(out[0, :4], ref, rtol=1e-5, atol=1e-5)


def test_position_helpers():
    assert list(np.asarray(make_segment_ids([3, 2], 7))) == [1, 1, 1, 2, 2, 0, 0]
    assert list(np.asarray(make_position_ids([3, 2], 7))) == [0, 1, 2, 0, 1, 0, 0]
