"""Chunked gated delta rule vs the published HF Qwen3-Next torch reference
(`torch_chunk_gated_delta_rule` / `torch_recurrent_gated_delta_rule`) +
packed-segment reset exactness + chunk/recurrent self-consistency."""

import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.ops.gated_delta import (
    chunk_gated_delta_rule,
    recurrent_gated_delta_rule,
)


def _case(seed, b, s, h, dk, dv):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, s, h, dk)).astype(np.float32)
    k = rng.standard_normal((b, s, h, dk)).astype(np.float32)
    v = rng.standard_normal((b, s, h, dv)).astype(np.float32)
    # realistic decay/write strengths: g = -A * softplus(a + bias), beta in (0,1)
    g = -np.exp(rng.uniform(0, 1.5, (b, s, h))).astype(np.float32) * \
        np.log1p(np.exp(rng.standard_normal((b, s, h)))).astype(np.float32) * 0.1
    beta = (1.0 / (1.0 + np.exp(-rng.standard_normal((b, s, h))))).astype(np.float32)
    return q, k, v, g, beta


@pytest.mark.parametrize("s,chunk", [(96, 32), (64, 64), (50, 16)])
def test_parity_vs_hf_torch_chunk(s, chunk):
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule,
    )

    b, h, dk, dv = 2, 3, 16, 24
    q, k, v, g, beta = _case(0, b, s, h, dk, dv)
    with torch.no_grad():
        want, want_state = torch_chunk_gated_delta_rule(
            *(torch.tensor(x) for x in (q, k, v, g, beta)),
            chunk_size=chunk, output_final_state=True,
            use_qk_l2norm_in_kernel=True,
        )
    got, got_state = chunk_gated_delta_rule(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)), chunk_size=chunk)
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_state), want_state.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_parity_vs_hf_torch_recurrent():
    torch = pytest.importorskip("torch")
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule,
    )

    b, h, dk, dv = 2, 3, 16, 24
    q, k, v, g, beta = _case(1, b, 1, h, dk, dv)
    state = np.random.default_rng(2).standard_normal((b, h, dk, dv)).astype(np.float32)
    with torch.no_grad():
        want, want_state = torch_recurrent_gated_delta_rule(
            *(torch.tensor(x) for x in (q, k, v, g, beta)),
            initial_state=torch.tensor(state), output_final_state=True,
            use_qk_l2norm_in_kernel=True,
        )
    got, got_state = recurrent_gated_delta_rule(
        jnp.asarray(q[:, 0]), jnp.asarray(k[:, 0]), jnp.asarray(v[:, 0]),
        jnp.asarray(g[:, 0]), jnp.asarray(beta[:, 0]), jnp.asarray(state))
    np.testing.assert_allclose(np.asarray(got), want[:, 0].numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_state), want_state.numpy(),
                               rtol=2e-4, atol=2e-4)


def test_chunk_matches_recurrent_rollout():
    b, s, h, dk, dv = 1, 40, 2, 8, 12
    q, k, v, g, beta = _case(3, b, s, h, dk, dv)
    out_c, state_c = chunk_gated_delta_rule(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)), chunk_size=16)
    state = jnp.zeros((b, h, dk, dv), jnp.float32)
    outs = []
    for t in range(s):
        o, state = recurrent_gated_delta_rule(
            jnp.asarray(q[:, t]), jnp.asarray(k[:, t]), jnp.asarray(v[:, t]),
            jnp.asarray(g[:, t]), jnp.asarray(beta[:, t]), state)
        outs.append(np.asarray(o))
    np.testing.assert_allclose(np.asarray(out_c), np.stack(outs, axis=1),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(state_c), np.asarray(state),
                               rtol=5e-4, atol=5e-4)


def test_packed_segments_match_separate():
    """Packing two sequences with segment_ids must equal running them
    separately (the NEG log-decay reset device; see ops/mamba.py)."""
    b, h, dk, dv = 1, 2, 8, 12
    s1, s2 = 23, 17
    q, k, v, g, beta = _case(4, b, s1 + s2, h, dk, dv)
    seg = np.concatenate([np.full(s1, 1), np.full(s2, 2)])[None, :]
    out_packed, _ = chunk_gated_delta_rule(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)), chunk_size=16,
        segment_ids=jnp.asarray(seg, jnp.int32))

    def run(a, b_):
        out, _ = chunk_gated_delta_rule(
            *(jnp.asarray(x[:, a:b_]) for x in (q, k, v, g, beta)), chunk_size=16)
        return np.asarray(out)

    np.testing.assert_allclose(np.asarray(out_packed[:, :s1]), run(0, s1),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_packed[:, s1:]), run(s1, s1 + s2),
                               rtol=1e-4, atol=1e-4)


def test_bf16_mxu_precision_close_to_f32():
    """mxu_precision="bfloat16" (full-rate MXU dots, f32 accumulation) stays
    within bf16-roundoff tolerance of the highest-precision path."""
    b, s, h, dk, dv = 2, 96, 3, 32, 32
    q, k, v, g, beta = _case(6, b, s, h, dk, dv)
    hi, _ = chunk_gated_delta_rule(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)), chunk_size=32)
    lo, _ = chunk_gated_delta_rule(
        *(jnp.asarray(x) for x in (q, k, v, g, beta)), chunk_size=32,
        mxu_precision="bfloat16")
    err = np.max(np.abs(np.asarray(hi) - np.asarray(lo)))
    scale = np.max(np.abs(np.asarray(hi))) + 1e-6
    assert err / scale < 0.05, (err, scale)
