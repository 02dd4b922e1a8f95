"""qwen3_next family: forward parity vs HF transformers Qwen3NextForCausalLM
(GatedDeltaNet hybrid), conversion roundtrip, packed-batch consistency.
Reference: trainer/models/qwen3_5_moe/ (the reference's torch twin of the
same architecture)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import BUILTIN_SPECS, spec_from_hf_config
from prime_rl_tpu.models.qwen3_next import (
    forward,
    get_lm_head,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)

SPEC = BUILTIN_SPECS["debug_qwen3_next"]


def make_hf_model(spec):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    cfg = Qwen3NextConfig(
        vocab_size=spec.vocab_size,
        hidden_size=spec.hidden_size,
        num_hidden_layers=spec.num_layers,
        num_attention_heads=spec.num_heads,
        num_key_value_heads=spec.num_kv_heads,
        head_dim=spec.head_dim,
        intermediate_size=spec.intermediate_size,
        moe_intermediate_size=spec.moe_intermediate_size,
        num_experts=spec.num_experts,
        num_experts_per_tok=spec.num_experts_per_tok,
        shared_expert_intermediate_size=spec.shared_expert_size,
        norm_topk_prob=spec.norm_topk_prob,
        decoder_sparse_step=1,
        linear_num_key_heads=spec.gdn_k_heads,
        linear_num_value_heads=spec.gdn_v_heads,
        linear_key_head_dim=spec.gdn_k_dim,
        linear_value_head_dim=spec.gdn_v_dim,
        linear_conv_kernel_dim=spec.gdn_conv_kernel,
        partial_rotary_factor=spec.partial_rotary_factor,
        rope_theta=spec.rope_theta,
        rms_norm_eps=spec.rms_eps,
        tie_word_embeddings=spec.tie_embeddings,
        max_position_embeddings=512,
        layer_types=["full_attention" if c == "A" else "linear_attention"
                     for c in spec.gdn_pattern],
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Qwen3NextForCausalLM(cfg).eval()
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if not v.dtype.is_floating_point:
            continue
        if k.endswith("A_log"):
            sd[k] = torch.log(torch.rand(v.shape, generator=gen) * 4 + 1)
        elif k.endswith("dt_bias"):
            sd[k] = torch.rand(v.shape, generator=gen) * 0.2
        elif "norm" in k and "linear_attn" not in k:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.05  # zero-centered
        else:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.05
    model.load_state_dict(sd)
    return model


def test_forward_parity_vs_hf():
    torch = pytest.importorskip("torch")

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
    np.testing.assert_allclose(logits, hf_logits, rtol=2e-3, atol=2e-3)


def test_conversion_roundtrip():
    params = init_params(SPEC, jax.random.PRNGKey(0))
    back = params_from_hf_state_dict(params_to_hf_state_dict(params, SPEC), SPEC)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[key]),
                                   err_msg=key, rtol=1e-6, atol=1e-6)


def test_packed_equals_separate():
    """Two sequences packed into one row (segment ids) must produce the same
    hidden states as running them in separate rows — exercises the GDN
    conv + delta-rule segment resets through the full model."""
    params = init_params(SPEC, jax.random.PRNGKey(2))
    rng = np.random.default_rng(3)
    a = rng.integers(0, SPEC.vocab_size, 11)
    b = rng.integers(0, SPEC.vocab_size, 9)
    packed = np.concatenate([a, b])[None, :]
    seg = np.concatenate([np.full(11, 1), np.full(9, 2)])[None, :]
    pos = np.concatenate([np.arange(11), np.arange(9)])[None, :]
    h_packed = forward(params, SPEC, jnp.asarray(packed, jnp.int32),
                       jnp.asarray(seg, jnp.int32), jnp.asarray(pos, jnp.int32),
                       compute_dtype=jnp.float32, attn_impl="xla", remat="none")

    def solo(ids):
        arr = jnp.asarray(ids[None, :], jnp.int32)
        return forward(params, SPEC, arr, jnp.ones_like(arr),
                       jnp.asarray(np.arange(len(ids))[None, :], jnp.int32),
                       compute_dtype=jnp.float32, attn_impl="xla", remat="none")

    np.testing.assert_allclose(np.asarray(h_packed[0, :11]), np.asarray(solo(a)[0]),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_packed[0, 11:]), np.asarray(solo(b)[0]),
                               rtol=2e-4, atol=2e-4)


def test_engine_greedy_matches_training_forward():
    """Serving path (GDN prefill state handoff + recurrent decode + paged
    attention layers) must reproduce the training forward token-for-token."""
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    params = jax.tree.map(lambda x: x * 2.0, init_params(SPEC, jax.random.PRNGKey(3)))
    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=192)
    engine = Engine(params, SPEC, cache_cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 200, 19)]
    ids = list(prompt)
    want = []
    for _ in range(6):
        arr = jnp.asarray([ids], jnp.int32)
        h = forward(params, SPEC, arr, jnp.ones_like(arr),
                    jnp.asarray([list(range(len(ids)))], jnp.int32),
                    compute_dtype=jnp.float32, attn_impl="xla", remat="none")
        tok = int(jnp.argmax(h[0, -1] @ get_lm_head(params, SPEC)))
        want.append(tok)
        ids.append(tok)
    got = engine.generate([prompt], SamplingParams(max_tokens=6, temperature=0.0))[0]
    assert got.token_ids == want


def test_spec_from_hf_config():
    spec = spec_from_hf_config({
        "architectures": ["Qwen3NextForCausalLM"], "vocab_size": 1024,
        "hidden_size": 128, "num_hidden_layers": 8, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 32, "intermediate_size": 256,
        "moe_intermediate_size": 64, "num_experts": 16, "num_experts_per_tok": 4,
        "shared_expert_intermediate_size": 96, "partial_rotary_factor": 0.25,
        "linear_num_key_heads": 2, "linear_num_value_heads": 4,
        "linear_key_head_dim": 16, "linear_value_head_dim": 16,
        "linear_conv_kernel_dim": 4, "rope_theta": 10000.0,
        "tie_word_embeddings": False, "eos_token_id": 2,
    })
    assert spec.family == "qwen3_next"
    assert spec.gdn_pattern == "LLLA" * 2
    assert spec.attn_gate == "sigmoid" and spec.shared_expert_gate
    assert spec.gdn_v_heads == 4 and spec.shared_expert_size == 96
    assert spec.partial_rotary_factor == 0.25
