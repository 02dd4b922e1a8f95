"""MLA / DSA families: HF DeepseekV3 logits parity (dense MLA + noaux-tc
MoE), sparse==dense equivalence at full top-k, indexer causality/sentinel
contract, conversion roundtrip, sharding coverage, and indexer no-grad
(reference: glm_moe_dsa/modeling_glm_moe_dsa.py, sparse_mla_attention.py,
kernels/fp8_indexer.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import ModelSpec, param_pspec, spec_from_hf_config
from prime_rl_tpu.models.mla_moe import (
    forward,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)
from prime_rl_tpu.ops.sparse_mla import mla_topk_indices


def tiny_hf_config():
    from transformers import DeepseekV3Config

    return DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, n_shared_experts=1, n_routed_experts=8,
        routed_scaling_factor=2.5, kv_lora_rank=32, q_lora_rank=48,
        qk_rope_head_dim=8, v_head_dim=16, qk_nope_head_dim=24,
        n_group=2, topk_group=1, num_experts_per_tok=2,
        first_k_dense_replace=1, norm_topk_prob=True, rope_theta=1e4,
        rms_norm_eps=1e-6, tie_word_embeddings=False, attention_bias=False,
        max_position_embeddings=512,
    )


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers import DeepseekV3ForCausalLM

    torch.manual_seed(0)
    return DeepseekV3ForCausalLM(tiny_hf_config()).eval().float()


@pytest.fixture(scope="module")
def spec(hf_model) -> ModelSpec:
    return spec_from_hf_config(hf_model.config.to_dict() | {
        "architectures": ["DeepseekV3ForCausalLM"]})


@pytest.fixture(scope="module")
def params(hf_model, spec):
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf_state_dict(state, spec)


def dsa_spec(index_topk=64) -> ModelSpec:
    return ModelSpec(
        family="glm_moe_dsa", vocab_size=256, hidden_size=64, num_layers=2,
        num_heads=4, num_kv_heads=4, head_dim=32, intermediate_size=128,
        moe_intermediate_size=48, num_experts=8, num_experts_per_tok=2,
        n_shared_experts=1, first_k_dense_replace=1, router_sigmoid=True,
        routed_scaling_factor=1.0, q_lora_rank=48, kv_lora_rank=32,
        qk_rope_head_dim=8, qk_nope_head_dim=24, v_head_dim=16,
        index_n_heads=4, index_head_dim=16, index_topk=index_topk,
        rope_interleave=True, tie_embeddings=False, qk_norm=False,
        eos_token_id=255, pad_token_id=0,
    )


def run_forward(params, spec, ids, seg=None, pos=None):
    B, L = ids.shape
    seg = jnp.ones((B, L), jnp.int32) if seg is None else seg
    pos = jnp.tile(jnp.arange(L, dtype=jnp.int32), (B, 1)) if pos is None else pos
    return forward(params, spec, jnp.asarray(ids), seg, pos,
                   compute_dtype=jnp.float32, remat="none")


def test_logits_parity_with_hf_deepseek_v3(hf_model, spec, params):
    import torch

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=(1, 33)).astype(np.int32)
    h = run_forward(params, spec, ids)
    ours = np.asarray(h @ params["lm_head"].astype(h.dtype))[0]
    with torch.no_grad():
        theirs = hf_model(torch.tensor(ids, dtype=torch.long)).logits[0].numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_sparse_equals_dense_at_full_topk():
    """index_topk >= S selects every causal index, so the DSA path must
    reproduce dense MLA attention on the same weights."""
    L = 48
    sp_sparse = dsa_spec(index_topk=64)
    sp_dense = dataclasses.replace(sp_sparse, index_topk=0)
    params = init_params(sp_sparse, jax.random.key(1))
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 250, size=(2, L)).astype(np.int32)
    # packed rows: two segments per row, positions restart
    seg = np.ones((2, L), np.int32)
    seg[:, L // 2:] = 2
    pos = np.concatenate([np.arange(L // 2), np.arange(L - L // 2)]).astype(np.int32)
    pos = np.tile(pos, (2, 1))
    out_sparse = run_forward(params, sp_sparse, ids, jnp.asarray(seg), jnp.asarray(pos))
    out_dense = run_forward(params, sp_dense, ids, jnp.asarray(seg), jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(out_sparse), np.asarray(out_dense),
                               rtol=2e-3, atol=2e-3)


def test_sparse_topk_actually_restricts():
    """With a small top-k the output must differ from dense (the selection
    is really sparse) while staying finite."""
    L = 64
    sp_sparse = dsa_spec(index_topk=8)
    sp_dense = dataclasses.replace(sp_sparse, index_topk=0)
    params = init_params(sp_sparse, jax.random.key(2))
    rng = np.random.default_rng(2)
    ids = rng.integers(3, 250, size=(1, L)).astype(np.int32)
    out_sparse = np.asarray(run_forward(params, sp_sparse, ids))
    out_dense = np.asarray(run_forward(params, sp_dense, ids))
    assert np.isfinite(out_sparse).all()
    assert not np.allclose(out_sparse, out_dense, atol=1e-3)


def test_indexer_causality_and_sentinel():
    rng = np.random.default_rng(3)
    S, Hi, Di, topk = 32, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((S, Hi, Di)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((S, Di)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((S, Hi)), jnp.float32)
    # two segments: [0, 20) and [20, 32)
    pos = np.concatenate([np.arange(20), np.arange(12)]).astype(np.int32)
    tok = np.arange(S, dtype=np.int32)
    ks = jnp.asarray(tok - pos)
    ke = jnp.asarray(tok + 1)
    idx = np.asarray(mla_topk_indices(q, k, w, ks, ke, topk, chunk=16))
    assert idx.shape == (S, topk)
    for t in range(S):
        real = idx[t][idx[t] < S]
        assert (real >= int(ks[t])).all() and (real < int(ke[t])).all(), t
        # number of real selections = min(topk, causal window)
        assert len(real) == min(topk, int(ke[t]) - int(ks[t]))
        assert len(np.unique(real)) == len(real)
    # a zero-width window (padding row contract) selects only sentinels
    idx0 = np.asarray(mla_topk_indices(q, k, w, ks, jnp.zeros_like(ke), topk))
    assert (idx0 == S).all()


def test_conversion_roundtrip_dsa():
    spec = dsa_spec()
    params = init_params(spec, jax.random.key(4))
    state = params_to_hf_state_dict(params, spec)
    assert "model.layers.1.self_attn.indexer.wq_b.weight" in state
    assert "model.layers.1.self_attn.kv_a_proj_with_mqa.weight" in state
    back = params_from_hf_state_dict(state, spec)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def test_sharding_rules_cover_all_params():
    from prime_rl_tpu.models.base import _iter_paths

    p = init_params(dsa_spec(), jax.random.key(0))
    for path, _ in _iter_paths(p):
        param_pspec(path)


def test_indexer_gets_no_gradient_but_attention_does():
    spec = dsa_spec(index_topk=8)
    params = init_params(spec, jax.random.key(5))
    ids = np.arange(1, 33, dtype=np.int32)[None]

    def loss(p):
        return jnp.sum(run_forward(p, spec, ids) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["layers"]["idx_wq_b"]).sum()) == 0.0
    assert float(jnp.abs(g["layers"]["idx_w_proj"]).sum()) == 0.0
    assert float(jnp.abs(g["layers"]["kv_a"]).sum()) > 0
    assert float(jnp.abs(g["layers"]["q_b"]).sum()) > 0
    assert float(jnp.abs(g["layers"]["expert_down"]).sum()) > 0


def _engine_greedy_check(spec, params, n_gen=6):
    from prime_rl_tpu.models.mla_moe import get_lm_head
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=192)
    engine = Engine(params, spec, cache_cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(9)
    prompt = [int(x) for x in rng.integers(1, 200, 17)]
    ids = list(prompt)
    want = []
    for _ in range(n_gen):
        arr = jnp.asarray([ids], jnp.int32)
        h = run_forward(params, spec, arr)
        tok = int(jnp.argmax(h[0, -1] @ get_lm_head(params, spec)))
        want.append(tok)
        ids.append(tok)
    got = engine.generate([prompt], SamplingParams(max_tokens=n_gen, temperature=0.0,
                                                   ignore_eos=True))[0]
    assert got.token_ids == want


def test_engine_greedy_matches_training_deepseek(params, spec):
    """Dense MLA serving (latent-kv paged cache: prefill pages the latent
    rows, decode attends the absorbed query against them) reproduces the
    training forward token-for-token."""
    big = jax.tree.map(lambda x: x * 1.5, params)
    _engine_greedy_check(spec, big)


def test_engine_greedy_matches_training_dsa():
    """DSA serving: prefill runs the REAL sparse indexer path; decode is the
    dense relaxation, exact while history <= index_topk (here topk=64 >>
    prompt+gen, so sparse selection == dense)."""
    spec = dsa_spec(index_topk=64)
    params = jax.tree.map(lambda x: x * 2.0, init_params(spec, jax.random.key(3)))
    _engine_greedy_check(spec, params)


def test_mla_prefix_cache_reuse_exact(params, spec):
    """Dense MLA keeps prefix caching: a second request sharing the prompt
    routes through the latent-page chunk path (cached prefix never
    recomputed) and must produce the identical greedy continuation."""
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    big = jax.tree.map(lambda x: x * 1.5, params)
    cache_cfg = CacheConfig(num_pages=64, page_size=16, max_slots=2,
                            max_seq_len=192, enable_prefix_cache=True,
                            prefill_chunk=32)
    engine = Engine(big, spec, cache_cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(13)
    prompt = [int(x) for x in rng.integers(1, 200, 41)]
    sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    first = engine.generate([prompt], sp)[0]
    assert engine.stats["prefill_tokens_cached"] == 0
    second = engine.generate([prompt], sp)[0]
    assert engine.stats["prefill_tokens_cached"] > 0, "no prefix reuse"
    assert second.token_ids == first.token_ids


def test_engine_greedy_matches_training_dsa_sparse_decode():
    """index_topk SMALLER than the history: decode must run the exact sparse
    selection via the paged indexer keys (threshold form of the training
    top-k), still matching the training-forward rollout token-for-token."""
    spec = dsa_spec(index_topk=8)
    params = jax.tree.map(lambda x: x * 2.0, init_params(spec, jax.random.key(5)))
    _engine_greedy_check(spec, params)


def test_dsa_prefix_cache_reuse_exact():
    """DSA keeps prefix caching: the second request's chunked continuation
    re-runs the exact top-k selection against the cached latent + indexer
    pages and must produce the identical greedy continuation."""
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    spec = dsa_spec(index_topk=8)
    params = jax.tree.map(lambda x: x * 2.0, init_params(spec, jax.random.key(7)))
    cache_cfg = CacheConfig(num_pages=64, page_size=16, max_slots=2,
                            max_seq_len=192, enable_prefix_cache=True,
                            prefill_chunk=32)
    engine = Engine(params, spec, cache_cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(17)
    prompt = [int(x) for x in rng.integers(1, 200, 39)]
    sp = SamplingParams(max_tokens=5, temperature=0.0, ignore_eos=True)
    first = engine.generate([prompt], sp)[0]
    second = engine.generate([prompt], sp)[0]
    assert engine.stats["prefill_tokens_cached"] > 0, "no prefix reuse"
    assert second.token_ids == first.token_ids
