"""minimax_m2 / afmoe / laguna families: forward sanity, gate semantics,
conversion roundtrip, serving-vs-training greedy consistency, HF config
parsing (reference: trainer/models/minimax_m2/ afmoe/ laguna/ modeling +
converting files; no HF transformers classes exist for these, so parity is
asserted between our own training and serving paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import get_family
from prime_rl_tpu.models.base import BUILTIN_SPECS, ModelSpec, spec_from_hf_config

SPECS = {
    name: BUILTIN_SPECS[name]
    for name in ("debug_minimax", "debug_afmoe", "debug_laguna")
}


def _fwd(spec, params, ids):
    fam = get_family(spec)
    seg = jnp.ones_like(ids)
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1], dtype=jnp.int32), ids.shape)
    return fam.forward(params, spec, ids, seg, pos, compute_dtype=jnp.float32,
                       attn_impl="xla", remat="none")


@pytest.mark.parametrize("name", sorted(SPECS))
def test_forward_finite_and_causal(name):
    spec = SPECS[name]
    fam = get_family(spec)
    params = fam.init(spec, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, spec.vocab_size, (2, 24)), jnp.int32)
    h = _fwd(spec, params, ids)
    assert h.shape == (2, 24, spec.hidden_size)
    assert bool(jnp.all(jnp.isfinite(h)))
    # causality: changing a suffix token must not affect earlier positions
    ids2 = ids.at[:, 20].set((ids[:, 20] + 1) % spec.vocab_size)
    h2 = _fwd(spec, params, ids2)
    np.testing.assert_allclose(np.asarray(h[:, :20]), np.asarray(h2[:, :20]),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_conversion_roundtrip(name):
    spec = SPECS[name]
    fam = get_family(spec)
    params = fam.init(spec, jax.random.PRNGKey(1))
    back = fam.from_hf(fam.to_hf(params, spec), spec)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[key]),
                                   err_msg=key, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("name", sorted(SPECS))
def test_engine_greedy_matches_training_forward(name):
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    spec = SPECS[name]
    fam = get_family(spec)
    params = jax.tree.map(lambda x: x * 2.0, fam.init(spec, jax.random.PRNGKey(3)))
    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=192)
    engine = Engine(params, spec, cache_cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 200, 19)]
    ids = list(prompt)
    want = []
    for _ in range(6):
        arr = jnp.asarray([ids], jnp.int32)
        h = _fwd(spec, params, arr)
        tok = int(jnp.argmax(h[0, -1] @ fam.get_lm_head(params, spec)))
        want.append(tok)
        ids.append(tok)
    got = engine.generate([prompt], SamplingParams(max_tokens=6, temperature=0.0))[0]
    assert got.token_ids == want


def test_attn_gate_semantics():
    """sigmoid: zero gate weights scale the attention output by exactly 0.5;
    softplus_head: per-head softplus(x @ Wg) scaling (laguna
    modeling_laguna.py:130-131)."""
    from prime_rl_tpu.models.qwen3 import apply_attn_gate

    rng = np.random.default_rng(2)
    b, l, h, hd, d = 2, 5, 4, 8, 16
    o = jnp.asarray(rng.standard_normal((b, l, h, hd)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((b, l, d)), jnp.float32)

    spec_sig = ModelSpec(family="afmoe", vocab_size=8, hidden_size=d, num_layers=1,
                         num_heads=h, num_kv_heads=h, head_dim=hd,
                         intermediate_size=8, attn_gate="sigmoid")
    out = apply_attn_gate(o, x, {"attn_gate": jnp.zeros((d, h * hd))}, spec_sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(o) * 0.5, rtol=1e-6)

    spec_sp = ModelSpec(family="laguna", vocab_size=8, hidden_size=d, num_layers=1,
                        num_heads=h, num_kv_heads=h, head_dim=hd,
                        intermediate_size=8, attn_gate="softplus_head")
    wg = jnp.asarray(rng.standard_normal((d, h)), jnp.float32)
    out = apply_attn_gate(o, x, {"attn_gate": wg}, spec_sp)
    g = np.log1p(np.exp(np.asarray(x) @ np.asarray(wg)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(o) * g[..., None],
                               rtol=1e-5, atol=1e-5)


def test_spec_from_hf_config_minimax():
    spec = spec_from_hf_config({
        "architectures": ["MiniMaxM2ForCausalLM"], "vocab_size": 1024,
        "hidden_size": 128, "num_hidden_layers": 4, "num_attention_heads": 8,
        "num_key_value_heads": 2, "head_dim": 32, "intermediate_size": 256,
        "num_local_experts": 16, "num_experts_per_tok": 4,
        "scoring_func": "sigmoid", "use_routing_bias": True,
        "use_qk_norm": True, "qk_norm_type": "per_layer", "rotary_dim": 16,
        "rope_theta": 5e6, "tie_word_embeddings": False, "eos_token_id": 2,
    })
    assert spec.family == "minimax_m2"
    assert spec.qk_norm and spec.qk_norm_scope == "layer"
    assert spec.partial_rotary_factor == 0.5
    assert spec.router_sigmoid and spec.num_experts == 16
    assert spec.moe_intermediate_size == 256


def test_spec_from_hf_config_afmoe():
    lt = (["sliding_attention"] * 3 + ["full_attention"]) * 2
    spec = spec_from_hf_config({
        "architectures": ["AfmoeForCausalLM"], "vocab_size": 1024,
        "hidden_size": 128, "num_hidden_layers": 8, "num_attention_heads": 8,
        "num_key_value_heads": 2, "head_dim": 32, "intermediate_size": 256,
        "moe_intermediate_size": 64, "num_experts": 16, "num_experts_per_tok": 4,
        "num_shared_experts": 2, "num_dense_layers": 1,
        "score_func": "sigmoid", "route_norm": True, "route_scale": 1.0,
        "sliding_window": 512, "global_attn_every_n_layers": 4,
        "layer_types": lt, "rope_theta": 10000.0,
        "tie_word_embeddings": False, "eos_token_id": 2,
    })
    assert spec.family == "afmoe"
    assert spec.attn_gate == "sigmoid" and spec.sandwich_norm
    assert spec.sliding_window == 512 and spec.sliding_window_pattern == 4
    assert spec.first_k_dense_replace == 1 and spec.n_shared_experts == 2


def test_spec_from_hf_config_laguna():
    lt = ["sliding_attention", "full_attention"] * 2
    spec = spec_from_hf_config({
        "architectures": ["LagunaForCausalLM"], "vocab_size": 1024,
        "hidden_size": 128, "num_hidden_layers": 4, "num_attention_heads": 8,
        "num_key_value_heads": 2, "head_dim": 32, "intermediate_size": 256,
        "moe_intermediate_size": 64, "num_experts": 16, "num_experts_per_tok": 4,
        "shared_expert_intermediate_size": 96,
        "mlp_layer_types": ["dense", "sparse", "sparse", "sparse"],
        "layer_types": lt, "sliding_window": 512,
        "rope_parameters": {
            "full_attention": {"rope_theta": 500000.0},
            "sliding_attention": {"rope_theta": 10000.0},
        },
        "moe_routed_scaling_factor": 2.0,
        "tie_word_embeddings": False, "eos_token_id": 2,
    })
    assert spec.family == "laguna"
    assert spec.attn_gate == "softplus_head"
    assert spec.sliding_window == 512 and spec.sliding_window_pattern == 2
    assert spec.rope_theta == 500000.0 and spec.rope_theta_local == 10000.0
    assert spec.first_k_dense_replace == 1 and spec.shared_expert_size == 96
    assert spec.routed_scaling_factor == 2.0
