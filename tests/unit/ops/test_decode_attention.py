"""Fused decode-attention + KV-append kernel (ops/decode_attention.py) vs
the XLA oracle (_write_tokens + _decode_attention_xla), in Pallas interpret
mode — so the 400-line DMA-ring kernel is exercised by the default CPU suite,
not only by the tpu-marked hardware tests (ADVICE r3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.ops.decode_attention import decode_paged_attention
from prime_rl_tpu.sampler.model import _decode_attention_xla, _write_tokens

S, NH, NKV, HD, PS, NP, P = 4, 4, 2, 128, 8, 32, 8


def _setup(lengths, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((S, NH, HD)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((S, NKV, HD)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((S, NKV, HD)), jnp.float32)
    k_pool = jnp.asarray(rng.standard_normal((NKV, NP, PS, HD)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((NKV, NP, PS, HD)), jnp.float32)
    # contiguous pre-allocated pages per slot (the KVPool contract: flat
    # index == token position within the slot)
    table = jnp.asarray(
        [[s * P + i for i in range(P)] for s in range(S)], jnp.int32)
    return q, k_new, v_new, k_pool, v_pool, jnp.asarray(lengths, jnp.int32), table


def _oracle(q, k_new, v_new, k_pool, v_pool, lengths, table, window=0, sinks=None):
    page_idx = jnp.take_along_axis(table, (lengths // PS)[:, None], axis=1)[:, 0]
    flat_idx = page_idx * PS + lengths % PS
    k_pool = _write_tokens(k_pool, k_new.transpose(1, 0, 2), flat_idx)
    v_pool = _write_tokens(v_pool, v_new.transpose(1, 0, 2), flat_idx)
    o = _decode_attention_xla(q, k_pool, v_pool, lengths + 1, table,
                              window=window, sinks=sinks)
    return o, k_pool, v_pool


@pytest.mark.parametrize(
    "lengths,window,use_sinks,block_pages",
    [
        ([5, 0, 13, 31], 0, False, 4),     # incl. an empty slot
        ([63, 17, 33, 48], 0, False, 2),   # multi-block tails
        ([5, 0, 20, 31], 12, False, 4),    # sliding window
        ([7, 15, 0, 26], 0, True, 4),      # attention sinks (gpt-oss)
        ([40, 0, 63, 9], 9, True, 2),      # window + sinks + tails + empty
    ],
)
def test_parity_vs_xla_oracle(lengths, window, use_sinks, block_pages):
    q, k_new, v_new, k_pool, v_pool, lens, table = _setup(lengths)
    sinks = (jnp.asarray(np.random.default_rng(1).standard_normal(NH),
                         jnp.float32) if use_sinks else None)
    ro, rk, rv = _oracle(q, k_new, v_new, k_pool, v_pool, lens, table,
                         window=window, sinks=sinks)
    fo, fk, fv = decode_paged_attention(
        q, k_new, v_new, k_pool, v_pool, lens, table,
        sinks=sinks, window=window, block_pages=block_pages, interpret=True)
    np.testing.assert_allclose(np.asarray(fo), np.asarray(ro),
                               atol=2e-5, rtol=2e-5)
    # the fused RMW append must land the new token rows AND leave every other
    # pool row byte-identical
    np.testing.assert_array_equal(np.asarray(fk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(rv))
