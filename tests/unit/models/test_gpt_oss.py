"""gpt-oss family: forward parity vs HF transformers (torch CPU) on a tiny
random GptOss model + state-dict conversion roundtrip. Exercises every
gpt-oss axis at once: alternating sliding windows, attention sinks, qkv/o
biases, clamped-GLU experts with biases, top-k-softmax routing, YaRN RoPE
(reference: trainer/models/gpt_oss/ — behavior parity only)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import ModelSpec
from prime_rl_tpu.models.gpt_oss import (
    forward,
    get_lm_head,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)

SPEC = ModelSpec(
    family="gpt_oss", vocab_size=256, hidden_size=64, num_layers=4,
    num_heads=4, num_kv_heads=2, head_dim=16, intermediate_size=48,
    rope_theta=150000.0, rms_eps=1e-5, tie_embeddings=False, qk_norm=False,
    max_position_embeddings=512, eos_token_id=255, pad_token_id=0,
    num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
    sliding_window=8, sliding_window_pattern=2, attn_sinks=True,
    attn_bias=True, swiglu_alpha=1.702, swiglu_limit=7.0,
    expert_bias=True, router_bias=True, router_softmax_topk=True,
    rope_yarn_factor=4.0, rope_yarn_orig_max=128, rope_yarn_truncate=False,
)


def make_hf_model(spec: ModelSpec):
    torch = pytest.importorskip("torch")
    from transformers.models.gpt_oss import GptOssConfig, GptOssForCausalLM

    cfg = GptOssConfig(
        vocab_size=spec.vocab_size,
        hidden_size=spec.hidden_size,
        num_hidden_layers=spec.num_layers,
        num_attention_heads=spec.num_heads,
        num_key_value_heads=spec.num_kv_heads,
        head_dim=spec.head_dim,
        intermediate_size=spec.moe_intermediate_size,
        num_local_experts=spec.num_experts,
        num_experts_per_tok=spec.num_experts_per_tok,
        rope_theta=spec.rope_theta,
        rms_norm_eps=spec.rms_eps,
        tie_word_embeddings=spec.tie_embeddings,
        sliding_window=spec.sliding_window,
        max_position_embeddings=spec.max_position_embeddings,
        rope_scaling={
            "rope_type": "yarn", "factor": spec.rope_yarn_factor,
            "beta_fast": 32.0, "beta_slow": 1.0, "truncate": False,
            "original_max_position_embeddings": spec.rope_yarn_orig_max,
        },
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    model = GptOssForCausalLM(cfg).eval()
    # random (non-empty-init) weights everywhere
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=gen, dtype=torch.float32) * 0.05
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

    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_conversion_roundtrip():
    import jax

    params = init_params(SPEC, jax.random.PRNGKey(0))
    state = params_to_hf_state_dict(params, SPEC)
    back = params_from_hf_state_dict(state, SPEC)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(p): v for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in flat_a:
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[key]),
                                   err_msg=key, rtol=1e-6, atol=1e-6)


def test_spec_from_hf_config():
    from prime_rl_tpu.models.base import spec_from_hf_config

    cfg = {
        "architectures": ["GptOssForCausalLM"], "vocab_size": 256,
        "hidden_size": 64, "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 16, "intermediate_size": 48,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "sliding_window": 8, "rope_theta": 150000.0,
        "layer_types": ["sliding_attention", "full_attention"] * 2,
        "rope_scaling": {"rope_type": "yarn", "factor": 32.0,
                         "original_max_position_embeddings": 4096, "truncate": False},
        "tie_word_embeddings": False, "eos_token_id": 255,
    }
    spec = spec_from_hf_config(cfg)
    assert spec.family == "gpt_oss" and spec.attn_sinks and spec.attn_bias
    assert spec.num_experts == 4 and spec.moe_intermediate_size == 48
    assert spec.sliding_window == 8 and spec.sliding_window_pattern == 2
    assert spec.rope_yarn_factor == 32.0 and not spec.rope_yarn_truncate
    assert spec.router_softmax_topk and spec.swiglu_limit == 7.0


def test_engine_greedy_matches_training_forward():
    """Paged-cache serving (windows + sinks + MoE biases in decode) matches
    the training forward token-for-token."""
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    params = jax.tree.map(lambda x: x * 2.0, init_params(SPEC, jax.random.PRNGKey(3)))
    cache_cfg = CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=128)
    engine = Engine(params, SPEC, cache_cfg, compute_dtype=jnp.float32)

    rng = np.random.default_rng(7)
    prompt = [int(x) for x in rng.integers(1, 200, 21)]

    ids = list(prompt)
    want = []
    for _ in range(10):
        arr = jnp.asarray([ids], jnp.int32)
        h = forward(params, SPEC, arr, jnp.ones_like(arr),
                    jnp.asarray([list(range(len(ids)))], jnp.int32),
                    compute_dtype=jnp.float32, attn_impl="xla", remat="none")
        tok = int(jnp.argmax(h[0, -1] @ get_lm_head(params, SPEC)))
        want.append(tok)
        ids.append(tok)

    got = engine.generate([prompt], SamplingParams(max_tokens=10, temperature=0.0))[0]
    assert got.token_ids == want

def test_lora_and_router_replay():
    """LoRA threads through the period-2 super-block scan: zero-B adapters
    are exact identity; nonzero adapters (incl. per-expert moe_* targets)
    change the output and receive gradients. Router replay (forced expert
    ids) reproduces the recorded routing (reference: routed_experts replay +
    trainer/lora.py targeting grouped experts)."""
    import jax
    import jax.numpy as jnp

    from prime_rl_tpu.configs.shared import LoRAConfig
    from prime_rl_tpu.models.lora import init_lora, lora_scale
    from prime_rl_tpu.ops.moe import route_topk

    params = init_params(SPEC, jax.random.PRNGKey(0))
    cfg = LoRAConfig(rank=4, alpha=8, target_modules=["q", "v", "up", "down"],
                     experts=True)
    lora = init_lora(SPEC, cfg, jax.random.key(1))
    assert "moe_up_a" in lora["layers"] and "q_a" in lora["layers"]

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, SPEC.vocab_size, (2, 16)))
    seg = jnp.ones((2, 16), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(16, dtype=jnp.int32), (2, 16))
    kw = dict(compute_dtype=jnp.float32, attn_impl="xla", remat="none")

    base = forward(params, SPEC, ids, seg, pos, **kw)
    with_zero = forward(params, SPEC, ids, seg, pos, lora=lora,
                        lora_scale=lora_scale(cfg), **kw)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_zero),
                               rtol=1e-6, atol=1e-6)

    # nonzero B: output changes and every adapter tensor gets a gradient
    lora2 = jax.tree.map(lambda x: x + 0.02, lora)

    def loss_fn(lo):
        h = forward(params, SPEC, ids, seg, pos, lora=lo,
                    lora_scale=lora_scale(cfg), **kw)
        return jnp.sum(h * h)

    g = jax.grad(loss_fn)(lora2)
    assert abs(loss_fn(lora2) - loss_fn(lora)) > 0
    for k, v in g["layers"].items():
        assert float(jnp.abs(v).max()) > 0, f"no gradient through {k}"

    # router replay: -1 rows (keep own routing) reproduce the unforced
    # output exactly through the super-block scan
    own = jnp.full((2, 16, SPEC.num_layers, SPEC.num_experts_per_tok), -1, jnp.int32)
    out_own = forward(params, SPEC, ids, seg, pos, routed_experts=own, **kw)
    np.testing.assert_allclose(np.asarray(base), np.asarray(out_own),
                               rtol=1e-6, atol=1e-6)
