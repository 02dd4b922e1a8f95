"""Sliding-window attention + attention sinks (mistral/gemma/gpt-oss axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.ops.attention import xla_attention


def naive_window_attention(q, k, v, window, sinks=None):
    """Oracle: full-matrix softmax with causal+window mask and optional sink
    denominator."""
    b, l, nh, hd = q.shape
    nkv = k.shape[2]
    group = nh // nkv
    k = np.repeat(np.asarray(k), group, axis=2)
    v = np.repeat(np.asarray(v), group, axis=2)
    out = np.zeros_like(np.asarray(q), dtype=np.float64)
    for bi in range(b):
        for h in range(nh):
            s = (np.asarray(q)[bi, :, h] @ k[bi, :, h].T) * hd ** -0.5
            mask = np.tril(np.ones((l, l), bool))
            if window > 0:
                qpos = np.arange(l)[:, None]
                kpos = np.arange(l)[None, :]
                mask &= (qpos - kpos) < window
            s = np.where(mask, s, -1e30)
            m = s.max(-1, keepdims=True)
            if sinks is not None:
                m = np.maximum(m, float(sinks[h]))
            p = np.exp(s - m)
            p = np.where(mask, p, 0.0)
            denom = p.sum(-1, keepdims=True)
            if sinks is not None:
                denom = denom + np.exp(float(sinks[h]) - m)
            out[bi, :, h] = (p / denom) @ v[bi, :, h]
    return out


@pytest.mark.parametrize("window,with_sinks", [(4, False), (0, True), (4, True)])
def test_window_and_sink_attention_matches_oracle(window, with_sinks):
    B, L, NH, NKV, HD = 1, 16, 4, 2, 8
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (B, L, NH, HD), jnp.float32)
    k = jax.random.normal(ks[1], (B, L, NKV, HD), jnp.float32)
    v = jax.random.normal(ks[2], (B, L, NKV, HD), jnp.float32)
    sinks = jax.random.normal(ks[3], (NH,), jnp.float32) if with_sinks else None
    seg = jnp.ones((B, L), jnp.int32)
    got = np.asarray(xla_attention(q, k, v, seg, seg, window=window, sinks=sinks))
    want = naive_window_attention(q, k, v, window, sinks)
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_layer_window_pattern():
    spec = debug_spec(num_layers=6, sliding_window=8, sliding_window_pattern=3)
    assert qwen3.layer_windows_list(spec) == [8, 8, 0, 8, 8, 0]
    spec1 = debug_spec(num_layers=3, sliding_window=8)
    assert qwen3.layer_windows_list(spec1) == [8, 8, 8]


def test_forward_and_grads_with_window_and_sinks():
    spec = debug_spec(num_layers=2, sliding_window=8, sliding_window_pattern=2,
                      attn_sinks=True)
    params = qwen3.init_params(spec, jax.random.key(0))
    assert "sink" in params["layers"]
    ids = jnp.arange(24)[None, :].astype(jnp.int32) % spec.vocab_size
    seg = jnp.ones_like(ids)
    pos = jnp.arange(24)[None, :].astype(jnp.int32)

    def loss(p):
        h = qwen3.forward(p, spec, ids, seg, pos, compute_dtype=jnp.float32,
                          attn_impl="xla", remat="none")
        return jnp.sum(h ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(grads["layers"]["sink"])).sum() > 0


def test_engine_parity_with_window_and_sinks():
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    spec = debug_spec(num_layers=2, vocab_size=128, sliding_window=6,
                      sliding_window_pattern=2, attn_sinks=True)
    params = jax.tree.map(lambda x: x * 3.0, qwen3.init_params(spec, jax.random.key(1)))
    # make sinks non-trivial
    params["layers"]["sink"] = jnp.linspace(-1, 1, 2 * spec.num_heads).reshape(2, spec.num_heads)
    engine = Engine(params, spec,
                    CacheConfig(num_pages=64, page_size=16, max_slots=2, max_seq_len=128),
                    compute_dtype=jnp.float32)
    prompt = [5, 9, 23, 47, 3, 11, 30, 2]
    got = engine.generate([prompt], SamplingParams(max_tokens=10, temperature=0.0))[0]

    ids = list(prompt)
    want = []
    for _ in range(10):
        arr = jnp.asarray([ids], jnp.int32)
        h = qwen3.forward(params, spec, arr, jnp.ones_like(arr),
                          jnp.asarray([list(range(len(ids)))], jnp.int32),
                          compute_dtype=jnp.float32, attn_impl="xla", remat="none")
        tok = int(jnp.argmax(h[0, -1] @ qwen3.get_lm_head(params, spec)))
        want.append(tok)
        ids.append(tok)
        if tok == spec.eos_token_id:
            break
    assert got.token_ids == want[: len(got.token_ids)]
