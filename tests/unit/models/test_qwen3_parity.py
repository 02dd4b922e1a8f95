"""Forward parity vs HF transformers (torch CPU) on a tiny random Qwen3 +
state-dict conversion roundtrip (reference test strategy: SURVEY.md §4,
models/test_* per-family parity)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import ModelSpec, debug_spec
from prime_rl_tpu.models.qwen3 import (
    forward,
    get_lm_head,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)

SPEC = debug_spec(
    vocab_size=256, hidden_size=64, num_layers=3, num_heads=4, num_kv_heads=2,
    head_dim=16, intermediate_size=112, tie_embeddings=False, rope_theta=10000.0,
)


def make_hf_model(spec: ModelSpec):
    torch = pytest.importorskip("torch")
    from transformers import Qwen3Config, Qwen3ForCausalLM

    cfg = Qwen3Config(
        vocab_size=spec.vocab_size,
        hidden_size=spec.hidden_size,
        num_hidden_layers=spec.num_layers,
        num_attention_heads=spec.num_heads,
        num_key_value_heads=spec.num_kv_heads,
        head_dim=spec.head_dim,
        intermediate_size=spec.intermediate_size,
        rope_theta=spec.rope_theta,
        rms_norm_eps=spec.rms_eps,
        tie_word_embeddings=spec.tie_embeddings,
        attention_bias=False,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    model = Qwen3ForCausalLM(cfg).eval()
    return model


def test_forward_parity_vs_hf():
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    model = make_hf_model(SPEC)
    state = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = params_from_hf_state_dict(state, SPEC)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, SPEC.vocab_size, (2, 24))
    with torch.no_grad():
        hf_logits = model(torch.tensor(ids)).logits.numpy()

    seg = np.ones((2, 24), np.int32)
    pos = np.broadcast_to(np.arange(24, dtype=np.int32), (2, 24))
    h = forward(params, SPEC, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
                compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    logits = np.asarray(h @ get_lm_head(params, SPEC))

    np.testing.assert_allclose(logits, hf_logits, rtol=2e-4, atol=2e-4)


def test_packed_equals_unpacked():
    """Two sequences packed into one row give the same hidden states as
    running them separately — the segment-mask invariant everything
    downstream (loss, logprobs) depends on."""
    import jax
    import jax.numpy as jnp

    params = init_params(SPEC, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    a = rng.integers(0, SPEC.vocab_size, 10)
    b = rng.integers(0, SPEC.vocab_size, 14)

    def run(ids, seg, pos):
        return forward(params, SPEC, jnp.asarray(ids), jnp.asarray(seg), jnp.asarray(pos),
                       compute_dtype=jnp.float32, attn_impl="xla", remat="none")

    packed_ids = np.concatenate([a, b])[None]
    packed_seg = np.concatenate([np.full(10, 1), np.full(14, 2)]).astype(np.int32)[None]
    packed_pos = np.concatenate([np.arange(10), np.arange(14)]).astype(np.int32)[None]
    packed = np.asarray(run(packed_ids, packed_seg, packed_pos))

    ha = np.asarray(run(a[None], np.ones((1, 10), np.int32), np.arange(10, dtype=np.int32)[None]))
    hb = np.asarray(run(b[None], np.ones((1, 14), np.int32), np.arange(14, dtype=np.int32)[None]))

    np.testing.assert_allclose(packed[0, :10], ha[0], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(packed[0, 10:], hb[0], rtol=1e-5, atol=1e-5)


def test_hf_roundtrip():
    import jax

    params = init_params(SPEC, jax.random.PRNGKey(0))
    state = params_to_hf_state_dict(params, SPEC)
    back = params_from_hf_state_dict(state, SPEC)
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_num_params_formula():
    import jax

    params = init_params(SPEC, jax.random.PRNGKey(0))
    from prime_rl_tpu.models.base import count_params

    assert count_params(params) == SPEC.num_params()
