"""glm4_moe family: forward parity vs HF transformers on a tiny random
Glm4Moe + conversion roundtrip + serving parity. Exercises partial rotary,
qk-norm, sigmoid noaux-tc routing with correction bias, shared experts, and
first-k dense layers (reference: trainer/models/glm_moe_dsa/ MoE block)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import ModelSpec
from prime_rl_tpu.models.glm4_moe import (
    forward,
    get_lm_head,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)

SPEC = ModelSpec(
    family="glm4_moe", vocab_size=256, hidden_size=64, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=96,
    rope_theta=10000.0, rms_eps=1e-5, tie_embeddings=False, qk_norm=True,
    max_position_embeddings=512, eos_token_id=255, pad_token_id=0,
    num_experts=8, num_experts_per_tok=2, moe_intermediate_size=32,
    norm_topk_prob=True, partial_rotary_factor=0.5, n_shared_experts=1,
    first_k_dense_replace=1, routed_scaling_factor=1.5, router_sigmoid=True,
    n_group=2, topk_group=1,
)


def make_hf_model(spec: ModelSpec):
    torch = pytest.importorskip("torch")
    from transformers.models.glm4_moe import Glm4MoeConfig, Glm4MoeForCausalLM

    cfg = Glm4MoeConfig(
        vocab_size=spec.vocab_size,
        hidden_size=spec.hidden_size,
        num_hidden_layers=spec.num_layers,
        num_attention_heads=spec.num_heads,
        num_key_value_heads=spec.num_kv_heads,
        head_dim=spec.head_dim,
        intermediate_size=spec.intermediate_size,
        moe_intermediate_size=spec.moe_intermediate_size,
        n_routed_experts=spec.num_experts,
        num_experts_per_tok=spec.num_experts_per_tok,
        n_shared_experts=spec.n_shared_experts,
        n_group=spec.n_group,
        topk_group=spec.topk_group,
        first_k_dense_replace=spec.first_k_dense_replace,
        routed_scaling_factor=spec.routed_scaling_factor,
        norm_topk_prob=spec.norm_topk_prob,
        partial_rotary_factor=spec.partial_rotary_factor,
        use_qk_norm=spec.qk_norm,
        rope_theta=spec.rope_theta,
        rms_norm_eps=spec.rms_eps,
        tie_word_embeddings=spec.tie_embeddings,
        attention_bias=False,
        max_position_embeddings=spec.max_position_embeddings,
    )
    torch.manual_seed(0)
    model = Glm4MoeForCausalLM(cfg).eval()
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            scale = 0.5 if "e_score_correction_bias" in k else 0.05
            sd[k] = torch.randn(v.shape, generator=gen, dtype=torch.float32) * scale
    model.load_state_dict(sd)
    return model


def test_forward_parity_vs_hf():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    model = make_hf_model(SPEC)
    state = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_state_dict(state, SPEC)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, SPEC.vocab_size, (2, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.float().numpy()

    seg = np.ones((2, 24), np.int32)
    pos = np.broadcast_to(np.arange(24, dtype=np.int32), (2, 24))
    h = forward(params, SPEC, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
                compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    logits = np.asarray(h @ get_lm_head(params, SPEC))
    np.testing.assert_allclose(logits, hf_logits, rtol=3e-4, atol=3e-4)


def test_conversion_roundtrip():
    import jax

    params = init_params(SPEC, jax.random.PRNGKey(0))
    back = params_from_hf_state_dict(params_to_hf_state_dict(params, SPEC), SPEC)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[key]),
                                   err_msg=key, rtol=1e-6, atol=1e-6)


def test_engine_greedy_matches_training_forward():
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    params = jax.tree.map(lambda x: x * 2.0, init_params(SPEC, jax.random.PRNGKey(3)))
    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=128)
    engine = Engine(params, SPEC, cache_cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 200, 19)]
    ids = list(prompt)
    want = []
    for _ in range(8):
        arr = jnp.asarray([ids], jnp.int32)
        h = forward(params, SPEC, arr, jnp.ones_like(arr),
                    jnp.asarray([list(range(len(ids)))], jnp.int32),
                    compute_dtype=jnp.float32, attn_impl="xla", remat="none")
        tok = int(jnp.argmax(h[0, -1] @ get_lm_head(params, SPEC)))
        want.append(tok)
        ids.append(tok)
    got = engine.generate([prompt], SamplingParams(max_tokens=8, temperature=0.0))[0]
    assert got.token_ids == want


def test_spec_from_hf_config():
    from prime_rl_tpu.models.base import spec_from_hf_config

    cfg = {
        "architectures": ["Glm4MoeForCausalLM"], "vocab_size": 256,
        "hidden_size": 64, "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "intermediate_size": 96,
        "moe_intermediate_size": 32, "n_routed_experts": 8,
        "num_experts_per_tok": 2, "n_shared_experts": 1, "n_group": 2,
        "topk_group": 1, "first_k_dense_replace": 1,
        "routed_scaling_factor": 1.5, "partial_rotary_factor": 0.5,
        "use_qk_norm": True, "rope_theta": 10000.0,
        "tie_word_embeddings": False, "eos_token_id": 255,
    }
    spec = spec_from_hf_config(cfg)
    assert spec.family == "glm4_moe" and spec.router_sigmoid and spec.qk_norm
    assert spec.num_experts == 8 and spec.n_shared_experts == 1
    assert spec.first_k_dense_replace == 1 and spec.partial_rotary_factor == 0.5
    assert spec.routed_scaling_factor == 1.5 and spec.n_group == 2
