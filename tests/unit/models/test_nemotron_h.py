"""nemotron_h hybrid-Mamba family: conversion roundtrip, packed-segment
equivalence through the full stack, gradients + MoE aux, sharding coverage
(reference: trainer/models/nemotron_h/ — the SSD-core math itself is
HF-parity-tested in tests/unit/ops/test_mamba.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import BUILTIN_SPECS, ModelSpec, count_params, param_pspec
from prime_rl_tpu.models.nemotron_h import (
    forward,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)

SPEC = ModelSpec(
    family="nemotron_h", vocab_size=256, hidden_size=64, num_layers=5,
    num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=96,
    rms_eps=1e-5, tie_embeddings=False, qk_norm=False,
    eos_token_id=255, pad_token_id=0, layer_pattern="M*-EM",
    mamba_num_heads=4, mamba_head_dim=16, mamba_n_groups=2,
    mamba_state_size=8, mamba_conv_kernel=4, mamba_chunk_size=8,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
    moe_latent_size=32, moe_shared_expert_size=48, router_sigmoid=True,
    n_group=1, topk_group=1, routed_scaling_factor=1.0,
)


@pytest.fixture(scope="module")
def params():
    return init_params(SPEC, jax.random.key(0))


def fwd(params, ids, seg, **kw):
    pos = np.maximum(np.cumsum(seg != 0, axis=1) - 1, 0).astype(np.int32)
    return forward(params, SPEC, jnp.asarray(ids), jnp.asarray(seg),
                   jnp.asarray(pos), compute_dtype=jnp.float32,
                   attn_impl="xla", remat="none", **kw)


def test_conversion_roundtrip(params):
    state = params_to_hf_state_dict(params, SPEC)
    assert any(k.startswith("backbone.layers.0.mixer.A_log") for k in state)
    back = params_from_hf_state_dict(state, SPEC)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def test_packed_equals_unpacked(params):
    rng = np.random.default_rng(0)
    a = rng.integers(1, 255, size=(1, 11)).astype(np.int32)
    b = rng.integers(1, 255, size=(1, 13)).astype(np.int32)
    packed = np.concatenate([a, b], axis=1)
    seg = np.concatenate([np.full((1, 11), 1), np.full((1, 13), 2)], axis=1).astype(np.int32)
    got = np.asarray(fwd(params, packed, seg))
    wa = np.asarray(fwd(params, a, np.ones((1, 11), np.int32)))
    wb = np.asarray(fwd(params, b, np.ones((1, 13), np.int32)))
    np.testing.assert_allclose(got[0, :11], wa[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[0, 11:], wb[0], rtol=2e-4, atol=2e-4)


def test_grads_finite_and_aux(params):
    ids = np.arange(1, 17, dtype=np.int32).reshape(1, 16)
    seg = np.ones((1, 16), np.int32)

    def loss(p):
        h, aux = fwd(p, ids, seg, collect_aux=True)
        return jnp.sum(h * h) * 1e-3 + 0.0 * aux, aux

    (val, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(val)) and np.isfinite(float(aux)) and float(aux) > 0
    for path, g in jax.tree_util.tree_leaves_with_path(grads):
        assert np.isfinite(np.asarray(g)).all(), path


def test_sharding_rules_cover_all_params(params):
    from prime_rl_tpu.models.base import _iter_paths

    for path, _ in _iter_paths(params):
        param_pspec(path)  # raises KeyError on a missing rule


def test_num_params_accounting(params):
    assert SPEC.num_params() == count_params(params)
    assert SPEC.flops_per_token(2048) > 0
    big = BUILTIN_SPECS["nvidia/Nemotron-H-8B-Base-8K"]
    assert len(big.layer_pattern) == big.num_layers == 52
    # 8B-class: param count within 15% of 8e9
    assert abs(big.num_params() - 8.1e9) / 8.1e9 < 0.15


def test_remat_modes_match(params):
    ids = np.arange(1, 17, dtype=np.int32).reshape(1, 16)
    seg = np.ones((1, 16), np.int32)
    pos = np.arange(16, dtype=np.int32).reshape(1, 16)
    base = None
    for remat in ("none", "full", "save_attn"):
        out = np.asarray(forward(params, SPEC, jnp.asarray(ids), jnp.asarray(seg),
                                 jnp.asarray(pos), compute_dtype=jnp.float32,
                                 attn_impl="xla", remat=remat))
        if base is None:
            base = out
        else:
            np.testing.assert_allclose(out, base, rtol=1e-5, atol=1e-5)


def test_engine_greedy_matches_training_forward(params):
    """Hybrid Mamba serving: SSD prefill state handoff + single-token
    recurrent decode (all four block kinds M/*/-/E) must reproduce the
    training forward token-for-token."""
    from prime_rl_tpu.models.nemotron_h import get_lm_head
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    big = jax.tree.map(lambda x: x * 2.0, params)
    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=192)
    engine = Engine(big, SPEC, cache_cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(11)
    prompt = [int(x) for x in rng.integers(1, 200, 17)]
    ids = list(prompt)
    want = []
    for _ in range(6):
        arr = jnp.asarray([ids], jnp.int32)
        h = forward(big, SPEC, arr, jnp.ones_like(arr),
                    jnp.asarray([list(range(len(ids)))], jnp.int32),
                    compute_dtype=jnp.float32, attn_impl="xla", remat="none")
        tok = int(jnp.argmax(h[0, -1] @ get_lm_head(big, SPEC)))
        want.append(tok)
        ids.append(tok)
    got = engine.generate([prompt], SamplingParams(max_tokens=6, temperature=0.0))[0]
    assert got.token_ids == want
