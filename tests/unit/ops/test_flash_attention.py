"""Pallas flash attention vs XLA reference (interpret mode on CPU):
forward + gradients, causal, segments, GQA."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.ops.attention import make_segment_ids, xla_attention
from prime_rl_tpu.ops.flash_attention import flash_attention


def rand_qkv(rng, b, l, nh, nkv, d):
    q = rng.normal(size=(b, l, nh, d)).astype(np.float32)
    k = rng.normal(size=(b, l, nkv, d)).astype(np.float32)
    v = rng.normal(size=(b, l, nkv, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("nkv", [4, 2])
@pytest.mark.parametrize("seq_lens", [[64], [24, 40], [16, 16, 8]])
def test_forward_matches_xla(nkv, seq_lens):
    rng = np.random.default_rng(0)
    b, l, nh, d = 1, 64, 4, 32
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    seg = jnp.asarray(make_segment_ids(seq_lens, l))[None]
    out_f = flash_attention(q, k, v, seg, block_q=16, block_kv=16)
    out_x = xla_attention(q, k, v, seg, seg)
    valid = np.asarray(seg)[0] != 0
    np.testing.assert_allclose(
        np.asarray(out_f)[0, valid], np.asarray(out_x)[0, valid], rtol=1e-5, atol=1e-5
    )


def test_gradients_match_xla():
    rng = np.random.default_rng(1)
    b, l, nh, nkv, d = 1, 32, 2, 1, 16
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    seg = jnp.asarray(make_segment_ids([20, 12], l))[None]
    dout = jnp.asarray(rng.normal(size=(b, l, nh, d)).astype(np.float32))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, seg, block_q=8, block_kv=8) * dout)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, seg) * dout)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4)


def test_padding_rows_zero_output():
    rng = np.random.default_rng(2)
    b, l, nh, nkv, d = 1, 32, 2, 2, 16
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    seg = jnp.asarray(make_segment_ids([16], l))[None]  # tail is padding
    out = np.asarray(flash_attention(q, k, v, seg, block_q=8, block_kv=8))
    np.testing.assert_allclose(out[0, 16:], 0.0, atol=1e-6)


def test_block_size_mismatch_raises():
    rng = np.random.default_rng(3)
    q, k, v = rand_qkv(rng, 1, 20, 2, 2, 16)
    seg = jnp.ones((1, 20), jnp.int32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, seg, block_q=16, block_kv=16)


@pytest.mark.parametrize("window", [8, 24, 64, 1000])
def test_windowed_forward_matches_xla(window):
    """Banded kernel vs XLA sliding-window mask (VERDICT r1 item #4)."""
    rng = np.random.default_rng(2)
    b, l, nh, nkv, d = 1, 128, 4, 2, 32
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    seg = jnp.asarray(make_segment_ids([80, 48], l))[None]
    out_f = flash_attention(q, k, v, seg, block_q=16, block_kv=16, window=window)
    out_x = xla_attention(q, k, v, seg, seg, window=window)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)


def test_sinks_forward_matches_xla():
    rng = np.random.default_rng(3)
    b, l, nh, nkv, d = 1, 64, 4, 2, 32
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    sinks = jnp.asarray(rng.normal(size=(nh,)).astype(np.float32))
    seg = jnp.asarray(make_segment_ids([40, 24], l))[None]
    out_f = flash_attention(q, k, v, seg, block_q=16, block_kv=16, sinks=sinks)
    out_x = xla_attention(q, k, v, seg, seg, sinks=sinks)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_x), rtol=1e-5, atol=1e-5)


def test_windowed_sinks_gradients_match_xla():
    """gpt-oss shape: window + sinks together, full gradient parity incl.
    the sink gradient (computed outside the kernels from lse/delta)."""
    rng = np.random.default_rng(4)
    b, l, nh, nkv, d = 1, 64, 2, 1, 16
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    sinks = jnp.asarray(rng.normal(size=(nh,)).astype(np.float32))
    seg = jnp.asarray(make_segment_ids([40, 16], l))[None]

    def loss_flash(q, k, v, s):
        o = flash_attention(q, k, v, seg, block_q=16, block_kv=16, window=24, sinks=s)
        return jnp.sum(jnp.sin(o) * jnp.where((seg != 0)[..., None, None], 1.0, 0.0))

    def loss_xla(q, k, v, s):
        o = xla_attention(q, k, v, seg, seg, window=24, sinks=s)
        return jnp.sum(jnp.sin(o) * jnp.where((seg != 0)[..., None, None], 1.0, 0.0))

    gf = jax.grad(loss_flash, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, sinks)
    for a, b_, name in zip(gf, gx, "qkvs"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name}")


def test_windowed_gradients_match_xla():
    rng = np.random.default_rng(5)
    b, l, nh, nkv, d = 1, 64, 2, 2, 16
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    seg = jnp.asarray(make_segment_ids([64], l))[None]

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(jnp.sin(fn(q, k, v)))
        return inner

    f = loss(lambda q, k, v: flash_attention(q, k, v, seg, block_q=16, block_kv=16, window=16))
    x = loss(lambda q, k, v: xla_attention(q, k, v, seg, seg, window=16))
    gf = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(x, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gf, gx, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
                                   err_msg=f"d{name}")


def test_with_lse_split_merge_matches_full():
    """Ring-attention inner contract: attending two KV halves separately and
    merging by lse equals full attention — forward and GRADIENTS (the lse
    cotangent path through the custom VJP)."""
    from prime_rl_tpu.ops.flash_attention import flash_attention_with_lse

    rng = np.random.default_rng(6)
    b, l, nh, nkv, d = 1, 64, 2, 1, 16
    q, k, v = rand_qkv(rng, b, l, nh, nkv, d)
    seg = jnp.asarray(make_segment_ids([40, 24], l))[None]
    dout = jnp.asarray(rng.normal(size=(b, l, nh, d)).astype(np.float32))

    def merged(q, k, v):
        h = l // 2
        # q attends [first half] and [second half] of kv separately, merged
        o1, lse1 = flash_attention_with_lse(q, k[:, :h], v[:, :h], seg, seg[:, :h],
                                            causal=False, block_q=16, block_kv=16)
        o2, lse2 = flash_attention_with_lse(q, k[:, h:], v[:, h:], seg, seg[:, h:],
                                            causal=False, block_q=16, block_kv=16)
        m = jnp.maximum(lse1, lse2)
        w1 = jnp.exp(lse1 - m)
        w2 = jnp.exp(lse2 - m)
        den = w1 + w2
        o = (o1 * jnp.swapaxes(w1 / den, 1, 2)[..., None]
             + o2 * jnp.swapaxes(w2 / den, 1, 2)[..., None])
        return jnp.sum(o * dout)

    def full(q, k, v):
        return jnp.sum(xla_attention(q, k, v, seg, seg, causal=False) * dout)

    np.testing.assert_allclose(float(merged(q, k, v)), float(full(q, k, v)),
                               rtol=1e-4)
    gm = jax.grad(merged, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(full, argnums=(0, 1, 2))(q, k, v)
    for a, b_, name in zip(gm, gf, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=2e-4,
                                   atol=2e-4, err_msg=f"d{name}")
