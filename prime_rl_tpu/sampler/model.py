"""Sampler-side model functions: prefill and decode against the paged KV
cache. Same weight pytree as the learner (models/qwen3.py) — weight sync is
a pytree transfer, no key conversion.

TPU design notes:
- Prefill runs the training flash-attention kernel over the (bucketed) prompt
  and scatters K/V into the slot's pages — one fused jitted program per
  bucket size.
- Decode is one jitted program for ALL slots: [S] new tokens, paged
  Pallas attention on TPU (XLA gather fallback on CPU for tests), KV scatter
  via one flat index per slot.
- The layer loop is UNROLLED over per-layer weight dicts and KV buffers
  (``unstack_params``): in-place cache updates, no stacked-pool rewrites.
- Optional int8 weight-only quantization (``quantize_params``) halves the
  weight bandwidth that bounds decode.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.models.qwen3 import get_lm_head
from prime_rl_tpu.ops.attention import attention
from prime_rl_tpu.ops.layers import apply_rope, rms_norm, rope_frequencies, swiglu


def _mm(x: jax.Array, w) -> jax.Array:
    """Matmul against a raw weight or an int8 weight-only-quantized record
    ``{"q8": int8 [in, out], "scale": f32 [out]}`` — the dequant fuses into
    the dot's HBM reads, halving (vs bf16) the weight bandwidth that
    dominates decode."""
    if isinstance(w, dict):
        return jnp.dot(x, w["q8"].astype(x.dtype)) * w["scale"].astype(x.dtype)
    return jnp.dot(x, w)


def _lora_delta(x, lora: dict | None, name: str, idx):
    """Batched multi-LoRA delta (vLLM punica analogue): per-request adapter
    rows gathered from the device bank. ``idx`` is a scalar (prefill: one
    slot) or [S] (decode); bank slot 0 is the zero adapter (= no LoRA).
    x: [B, T, D] -> [B, T, out] or None."""
    if lora is None or f"{name}_a" not in lora or idx is None:
        return None
    a, b_ = lora[f"{name}_a"], lora[f"{name}_b"]  # [NA, in, r], [NA, r, out]
    scale = lora["scale"]
    if idx.ndim == 0:
        delta = (x @ a[idx].astype(x.dtype)) @ b_[idx].astype(x.dtype)
    else:
        ax = a[idx].astype(x.dtype)  # [S, in, r]
        bx = b_[idx].astype(x.dtype)  # [S, r, out]
        delta = jnp.einsum("std,sdr->str", x, ax)
        delta = jnp.einsum("str,sro->sto", delta, bx)
    return delta * scale


def _mm_l(x, w, lora, name, idx):
    out = _mm(x, w)
    d = _lora_delta(x, lora, name, idx)
    return out if d is None else out + d


def _qkv(x, lp, spec, positions, inv_freq, rope_scaling: float = 1.0, adapter_idx=None):
    """Shared q/k/v projection (+ optional biases + multi-LoRA) + qk-norm +
    rope. x: [B, T, D]."""
    b, t, _ = x.shape
    lora = lp.get("lora")
    qf = _mm_l(x, lp["q"], lora, "q", adapter_idx)
    kf = _mm_l(x, lp["k"], lora, "k", adapter_idx)
    if spec.qk_norm and spec.qk_norm_scope == "layer":
        # MiniMax-M2 "per_layer": one norm over the flat head dims
        qf = rms_norm(qf, lp["q_norm"], spec.rms_eps)
        kf = rms_norm(kf, lp["k_norm"], spec.rms_eps)
    q = qf.reshape(b, t, spec.num_heads, spec.head_dim)
    k = kf.reshape(b, t, spec.num_kv_heads, spec.head_dim)
    v = _mm_l(x, lp["v"], lora, "v", adapter_idx).reshape(b, t, spec.num_kv_heads, spec.head_dim)
    if lp.get("q_bias") is not None:
        q = q + lp["q_bias"].astype(q.dtype).reshape(1, 1, spec.num_heads, spec.head_dim)
        k = k + lp["k_bias"].astype(k.dtype).reshape(1, 1, spec.num_kv_heads, spec.head_dim)
        v = v + lp["v_bias"].astype(v.dtype).reshape(1, 1, spec.num_kv_heads, spec.head_dim)
    if spec.qk_norm and spec.qk_norm_scope != "layer":
        q = rms_norm(q, lp["q_norm"], spec.rms_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_eps)
    q = apply_rope(q, positions, inv_freq, rope_scaling)
    k = apply_rope(k, positions, inv_freq, rope_scaling)
    return q, k, v


def _mlp(x, lp, spec, adapter_idx=None, collect_routing: bool = False):
    """Dense SwiGLU or MoE sparse MLP — decided PER LAYER ("router" in the
    layer dict), so glm4_moe's first-k dense layers just work. x: [B, T, D].
    ``collect_routing``: also return the per-token expert ids [B*T, K]
    (router-replay recording; None for dense layers)."""
    if "router" in lp:
        from prime_rl_tpu.ops.moe import moe_mlp

        b, t, d = x.shape
        out, _routing = moe_mlp(
            x.reshape(b * t, d), lp["router"],
            lp["expert_gate"], lp["expert_up"], lp["expert_down"],
            spec.num_experts_per_tok, spec.norm_topk_prob,
            router_b=lp.get("router_bias"),
            b_gate=lp.get("expert_gate_bias"), b_up=lp.get("expert_up_bias"),
            b_down=lp.get("expert_down_bias"),
            softmax_topk=spec.router_softmax_topk,
            activation_alpha=spec.swiglu_alpha, activation_limit=spec.swiglu_limit,
            sigmoid_noaux=spec.router_sigmoid,
            correction_bias=lp.get("router_correction_bias"),
            n_group=spec.n_group, topk_group=spec.topk_group,
            routed_scaling=spec.routed_scaling_factor,
            allow_ep=False,  # serving trace must not ride the trainer's
            # ambient EP mesh in a colocated process (ADVICE r4 #2)
        )
        out = out.reshape(b, t, d)
        if "shared_gate" in lp:
            shared = _mm(swiglu(_mm(x, lp["shared_gate"]), _mm(x, lp["shared_up"])),
                         lp["shared_down"])
            if "shared_expert_gate_w" in lp:  # qwen3_next scalar sigmoid gate
                shared = jax.nn.sigmoid(_mm(x, lp["shared_expert_gate_w"])) * shared
            out = out + shared
        if spec.sandwich_norm and "post_mlp_norm" in lp:
            out = rms_norm(out, lp["post_mlp_norm"], spec.rms_eps)
        return (out, _routing.expert_ids) if collect_routing else out
    lora = lp.get("lora")
    h = swiglu(_mm_l(x, lp["gate"], lora, "gate", adapter_idx),
               _mm_l(x, lp["up"], lora, "up", adapter_idx))
    out = _mm_l(h, lp["down"], lora, "down", adapter_idx)
    if spec.sandwich_norm and "post_mlp_norm" in lp:
        out = rms_norm(out, lp["post_mlp_norm"], spec.rms_eps)
    return (out, None) if collect_routing else out


def _obias(lp: dict, dtype):
    b = lp.get("o_bias")
    return 0.0 if b is None else b.astype(dtype)


def _cast_layer(lp: dict, dtype) -> dict:
    return {
        k: (v if isinstance(v, dict) else (v.astype(dtype) if v.ndim >= 2 else v))
        for k, v in lp.items()
    }


_QUANT_TARGETS = (
    "q", "k", "v", "o", "gate", "up", "down",
    # MLA latent projections (kv_b stays raw: the absorbed-attention einsum
    # reshapes it per head)
    "q_a", "q_b", "kv_a",
    # GDN / Mamba mixer projections
    "in_q", "in_k", "in_v", "in_z", "in_proj", "out_proj",
    # attention-output gates / shared experts
    "attn_gate", "shared_gate", "shared_up", "shared_down",
)


def quantize_params(params: Params, spec: ModelSpec) -> Params:
    """int8 weight-only quantization (per-output-channel symmetric) of the
    serving params — the bandwidth-halving analogue of the reference's FP8
    serving path (reference: models/layers/fp8_linear.py role). Norms, the
    router and MoE experts stay bf16; the LM head quantizes too. Expects the
    serving (unstacked) layout."""

    def quant(w: jax.Array) -> dict:
        wf = w.astype(jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0), 1e-8) / 127.0
        q8 = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
        return {"q8": q8, "scale": scale}

    out = dict(params)
    out["layers"] = [
        {k: (quant(v) if k in _QUANT_TARGETS and not isinstance(v, dict) else v)
         for k, v in lp.items()}
        for lp in params["layers"]
    ]
    if "lm_head" in params:
        out["lm_head"] = quant(params["lm_head"])
    return out


# ---------------------------------------------------------------------------
# Prefill
# ---------------------------------------------------------------------------

def _rope(spec: ModelSpec):
    from prime_rl_tpu.models.qwen3 import rope_setup

    return rope_setup(spec)


def _freqs_for(spec: ModelSpec, inv_freq, window: int):
    """Per-layer rope frequencies: laguna sliding layers run their own theta
    (reference configuration_laguna.py:124-127); everyone else shares."""
    if window and spec.rope_theta_local:
        from prime_rl_tpu.ops.layers import rope_frequencies

        rot_dim = int(spec.head_dim * spec.partial_rotary_factor)
        return rope_frequencies(rot_dim, spec.rope_theta_local)
    return inv_freq


def _gated_o(o: jax.Array, x: jax.Array, lp: dict, spec: ModelSpec) -> jax.Array:
    """Attention-output gating (afmoe sigmoid / laguna per-head softplus;
    training analogue: models/qwen3.apply_attn_gate). o: [..., NH, HD]; x:
    the normed block input with the SAME leading dims as o."""
    if not spec.attn_gate or "attn_gate" not in lp:
        return o
    g = _mm(x, lp["attn_gate"])
    if spec.attn_gate == "sigmoid":
        return o * jax.nn.sigmoid(g).reshape(o.shape)
    g = jax.nn.softplus(g.astype(jnp.float32)).astype(o.dtype)
    return o * g[..., None]


def _post_attn(proj: jax.Array, lp: dict, spec: ModelSpec) -> jax.Array:
    if spec.sandwich_norm and "post_attn_norm" in lp:
        return rms_norm(proj, lp["post_attn_norm"], spec.rms_eps)
    return proj


def _gdn_prefill_mixer(h, lp, spec: ModelSpec, seg, length, compute_dtype):
    """GatedDeltaNet serving prefill over one padded sequence [1, L, D].
    Returns (h, conv_row [conv_dim, K], state_row [Hv, Dk, Dv]) — the rolling
    conv window at ``length`` and the fast-weight state (training math:
    models/qwen3_next.gdn_mixer; decode continues via _gdn_decode_mixer)."""
    from prime_rl_tpu.ops.gated_delta import chunk_gated_delta_rule
    from prime_rl_tpu.ops.mamba import causal_conv1d

    b, l, d = h.shape
    hk, hv = spec.gdn_k_heads, spec.gdn_v_heads
    dk, dv = spec.gdn_k_dim, spec.gdn_v_dim
    kd, vd = spec.gdn_key_dim, spec.gdn_value_dim
    kk = spec.gdn_conv_kernel
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
    raw = jnp.concatenate(
        [_mm(x, lp["in_q"]), _mm(x, lp["in_k"]), _mm(x, lp["in_v"])], axis=-1)
    qkv = jax.nn.silu(causal_conv1d(raw, lp["conv_w"], None, seg))
    q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
    q = q.reshape(b, l, hk, dk)
    k = k.reshape(b, l, hk, dk)
    v = v.reshape(b, l, hv, dv)
    beta = jax.nn.sigmoid(_mm(x, lp["in_b"]))
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        _mm(x, lp["in_a"]).astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32))
    r = hv // hk
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    core, state = chunk_gated_delta_rule(q, k, v, g, beta, segment_ids=seg)
    z = _mm(x, lp["in_z"]).reshape(b, l, hv, dv)
    core = rms_norm(core.astype(compute_dtype), lp["gdn_norm"], spec.rms_eps)
    core = core * jax.nn.silu(z.astype(jnp.float32)).astype(core.dtype)
    h = h + _mm(core.reshape(b, l, vd), lp["out_proj"])
    # rolling conv window: raw inputs at positions [length-K, length)
    padded = jnp.pad(raw[0], ((kk, 0), (0, 0)))  # [K+L, conv_dim]
    win = jax.lax.dynamic_slice(padded, (length, 0), (kk, padded.shape[1]))
    return h, jnp.swapaxes(win, 0, 1).astype(compute_dtype), state[0]


def _gdn_decode_mixer(h, lp, spec: ModelSpec, conv_st, rec_st, compute_dtype):
    """GatedDeltaNet decode step for all S slots. h: [S, 1, D];
    conv_st [S, conv_dim, K] rolling raw inputs; rec_st [S, Hv, Dk, Dv]."""
    from prime_rl_tpu.ops.gated_delta import recurrent_gated_delta_rule

    s = h.shape[0]
    hk, hv = spec.gdn_k_heads, spec.gdn_v_heads
    dk, dv = spec.gdn_k_dim, spec.gdn_v_dim
    kd, vd = spec.gdn_key_dim, spec.gdn_value_dim
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)[:, 0]  # [S, D]
    raw_t = jnp.concatenate(
        [_mm(x, lp["in_q"]), _mm(x, lp["in_k"]), _mm(x, lp["in_v"])], axis=-1)
    conv_st = jnp.concatenate(
        [conv_st[..., 1:], raw_t.astype(conv_st.dtype)[..., None]], axis=-1)
    qkv = jax.nn.silu(jnp.sum(conv_st.astype(jnp.float32) *
                              lp["conv_w"].astype(jnp.float32)[None], axis=-1))
    qkv = qkv.astype(compute_dtype)
    q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
    q = q.reshape(s, hk, dk)
    k = k.reshape(s, hk, dk)
    v = v.reshape(s, hv, dv)
    beta = jax.nn.sigmoid(_mm(x, lp["in_b"]))
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        _mm(x, lp["in_a"]).astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32))
    r = hv // hk
    if r > 1:
        q = jnp.repeat(q, r, axis=1)
        k = jnp.repeat(k, r, axis=1)
    core, rec_st = recurrent_gated_delta_rule(q, k, v, g, beta, rec_st)
    z = _mm(x, lp["in_z"]).reshape(s, hv, dv)
    core = rms_norm(core.astype(compute_dtype), lp["gdn_norm"], spec.rms_eps)
    core = core * jax.nn.silu(z.astype(jnp.float32)).astype(core.dtype)
    h = h + _mm(core.reshape(s, vd), lp["out_proj"])[:, None]
    return h, conv_st, rec_st


def _mamba_prefill_mixer(h, lp, spec: ModelSpec, seg, length, compute_dtype):
    """Mamba-2 serving prefill over one padded sequence [1, L, D]. Returns
    (h, conv_row [conv_dim, K], ssm_state_row [H, P, N]) — training math:
    ops/mamba.mamba2_mixer, with dt zeroed at pad so the carried state is
    exact at ``length``."""
    from prime_rl_tpu.ops.mamba import causal_conv1d, gated_rms_norm, ssd_chunked

    b, l, d = h.shape
    nh, p = spec.mamba_num_heads, spec.mamba_head_dim
    gn = spec.mamba_n_groups * spec.mamba_state_size
    inter = nh * p
    kk = spec.mamba_conv_kernel
    x = rms_norm(h, lp["norm"], spec.rms_eps)
    proj = _mm(x, lp["in_proj"])
    if lp.get("in_proj_bias") is not None:
        proj = proj + lp["in_proj_bias"]
    gate = proj[..., :inter]
    raw = proj[..., inter: inter + inter + 2 * gn]  # conv input (x|B|C)
    dt = jax.nn.softplus(proj[..., inter + inter + 2 * gn:].astype(jnp.float32)
                         + lp["dt_bias"].astype(jnp.float32))
    dt = dt * (seg != 0)[..., None]  # pad: no write, no decay
    xbc = jax.nn.silu(causal_conv1d(raw, lp["conv_w"], lp.get("conv_b"), seg))
    xs = xbc[..., :inter].reshape(b, l, nh, p)
    b_in = xbc[..., inter: inter + gn].reshape(b, l, spec.mamba_n_groups, -1)
    c_in = xbc[..., inter + gn:].reshape(b, l, spec.mamba_n_groups, -1)
    y, state = ssd_chunked(
        xs, dt, lp["A_log"], b_in, c_in, lp["D"],
        chunk_size=spec.mamba_chunk_size, segment_ids=seg,
        return_final_state=True)
    y = y.reshape(b, l, inter).astype(compute_dtype)
    y = gated_rms_norm(y, gate, lp["ssm_norm"])
    h = h + _mm(y, lp["out_proj"])
    padded = jnp.pad(raw[0], ((kk, 0), (0, 0)))
    win = jax.lax.dynamic_slice(padded, (length, 0), (kk, padded.shape[1]))
    return h, jnp.swapaxes(win, 0, 1).astype(compute_dtype), state[0]


def _gdn_chunk_mixer(h, lp, spec: ModelSpec, seg, valid, conv_row, state_row,
                     compute_dtype):
    """GatedDeltaNet chunk of an incremental serving prefill. h [1, C, D];
    ``conv_row [conv_dim, K]`` holds the raw conv inputs at global positions
    [off-K, off); ``state_row [Hv, Dk, Dv]`` f32 is the fast-weight state at
    ``off``. Returns (h, conv_row', state_row') advanced to off+valid.

    Exact continuation: the depthwise conv reads the carried raw window
    (zeros at a fresh start contribute nothing, same as the masked fresh
    conv) and the delta-rule scan starts from the carried state with the
    position-0 reset suppressed (prev_seg_tail=1) — a zero state with a
    suppressed reset is identical to a reset, so one code path serves both
    fresh and continued chunks."""
    from prime_rl_tpu.ops.gated_delta import chunk_gated_delta_rule
    from prime_rl_tpu.ops.mamba import causal_conv1d

    b, c, d = h.shape
    hk, hv = spec.gdn_k_heads, spec.gdn_v_heads
    dk, dv = spec.gdn_k_dim, spec.gdn_v_dim
    kd, vd = spec.gdn_key_dim, spec.gdn_value_dim
    kk = spec.gdn_conv_kernel
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
    raw = jnp.concatenate(
        [_mm(x, lp["in_q"]), _mm(x, lp["in_k"]), _mm(x, lp["in_v"])], axis=-1)
    prev = jnp.swapaxes(conv_row, 0, 1)[None, 1:]  # [1, K-1, conv_dim]
    raw_ext = jnp.concatenate([prev.astype(raw.dtype), raw], axis=1)
    seg_ext = jnp.concatenate([jnp.ones((b, kk - 1), seg.dtype), seg], axis=1)
    qkv = jax.nn.silu(
        causal_conv1d(raw_ext, lp["conv_w"], None, seg_ext))[:, kk - 1:]
    q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
    q = q.reshape(b, c, hk, dk)
    k = k.reshape(b, c, hk, dk)
    v = v.reshape(b, c, hv, dv)
    beta = jax.nn.sigmoid(_mm(x, lp["in_b"]))
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        _mm(x, lp["in_a"]).astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32))
    r = hv // hk
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    core, state = chunk_gated_delta_rule(
        q, k, v, g, beta, segment_ids=seg,
        initial_state=state_row[None].astype(jnp.float32),
        prev_seg_tail=jnp.ones((b,), seg.dtype))
    z = _mm(x, lp["in_z"]).reshape(b, c, hv, dv)
    core = rms_norm(core.astype(compute_dtype), lp["gdn_norm"], spec.rms_eps)
    core = core * jax.nn.silu(z.astype(jnp.float32)).astype(core.dtype)
    h = h + _mm(core.reshape(b, c, vd), lp["out_proj"])
    # new rolling window: raw_ext row (valid-1) is global position off+valid-K
    win = jax.lax.dynamic_slice(
        raw_ext[0], (valid - 1, 0), (kk, raw_ext.shape[2]))
    return h, jnp.swapaxes(win, 0, 1).astype(conv_row.dtype), state[0]


def _mamba_chunk_mixer(h, lp, spec: ModelSpec, seg, valid, conv_row, state_row,
                       compute_dtype):
    """Mamba-2 chunk of an incremental serving prefill (see _gdn_chunk_mixer
    for the continuation contract). state_row [H, P, N] f32 at ``off``."""
    from prime_rl_tpu.ops.mamba import causal_conv1d, gated_rms_norm, ssd_chunked

    b, c, d = h.shape
    nh, p = spec.mamba_num_heads, spec.mamba_head_dim
    gn = spec.mamba_n_groups * spec.mamba_state_size
    inter = nh * p
    kk = spec.mamba_conv_kernel
    x = rms_norm(h, lp["norm"], spec.rms_eps)
    proj = _mm(x, lp["in_proj"])
    if lp.get("in_proj_bias") is not None:
        proj = proj + lp["in_proj_bias"]
    gate = proj[..., :inter]
    raw = proj[..., inter: inter + inter + 2 * gn]
    dt = jax.nn.softplus(proj[..., inter + inter + 2 * gn:].astype(jnp.float32)
                         + lp["dt_bias"].astype(jnp.float32))
    dt = dt * (seg != 0)[..., None]
    prev = jnp.swapaxes(conv_row, 0, 1)[None, 1:]
    raw_ext = jnp.concatenate([prev.astype(raw.dtype), raw], axis=1)
    seg_ext = jnp.concatenate([jnp.ones((b, kk - 1), seg.dtype), seg], axis=1)
    xbc = jax.nn.silu(
        causal_conv1d(raw_ext, lp["conv_w"], lp.get("conv_b"), seg_ext))[:, kk - 1:]
    xs = xbc[..., :inter].reshape(b, c, nh, p)
    b_in = xbc[..., inter: inter + gn].reshape(b, c, spec.mamba_n_groups, -1)
    c_in = xbc[..., inter + gn:].reshape(b, c, spec.mamba_n_groups, -1)
    y, state = ssd_chunked(
        xs, dt, lp["A_log"], b_in, c_in, lp["D"],
        chunk_size=spec.mamba_chunk_size, segment_ids=seg,
        initial_state=state_row[None].astype(jnp.float32),
        return_final_state=True, prev_seg_tail=jnp.ones((b,), seg.dtype))
    y = y.reshape(b, c, inter).astype(compute_dtype)
    y = gated_rms_norm(y, gate, lp["ssm_norm"])
    h = h + _mm(y, lp["out_proj"])
    win = jax.lax.dynamic_slice(
        raw_ext[0], (valid - 1, 0), (kk, raw_ext.shape[2]))
    return h, jnp.swapaxes(win, 0, 1).astype(conv_row.dtype), state[0]


def _mamba_decode_mixer(h, lp, spec: ModelSpec, conv_st, ssm_st, compute_dtype):
    """Mamba-2 decode step for all S slots (HF Mamba2Mixer cached-step math):
    h [S, 1, D]; conv_st [S, conv_dim, K]; ssm_st [S, H, P, N] f32."""
    from prime_rl_tpu.ops.mamba import gated_rms_norm

    s = h.shape[0]
    nh, p = spec.mamba_num_heads, spec.mamba_head_dim
    g, n = spec.mamba_n_groups, spec.mamba_state_size
    gn = g * n
    inter = nh * p
    x = rms_norm(h, lp["norm"], spec.rms_eps)[:, 0]  # [S, D]
    proj = _mm(x, lp["in_proj"])
    if lp.get("in_proj_bias") is not None:
        proj = proj + lp["in_proj_bias"]
    gate = proj[:, :inter]
    raw_t = proj[:, inter: inter + inter + 2 * gn]
    dt = jax.nn.softplus(proj[:, inter + inter + 2 * gn:].astype(jnp.float32)
                         + lp["dt_bias"].astype(jnp.float32))  # [S, H]
    conv_st = jnp.concatenate(
        [conv_st[..., 1:], raw_t.astype(conv_st.dtype)[..., None]], axis=-1)
    xbc = jax.nn.silu(jnp.sum(conv_st.astype(jnp.float32) *
                              lp["conv_w"].astype(jnp.float32)[None], axis=-1)
                      + (lp["conv_b"].astype(jnp.float32)
                         if lp.get("conv_b") is not None else 0.0))
    xs = xbc[:, :inter].reshape(s, nh, p).astype(jnp.float32)
    b_in = jnp.repeat(xbc[:, inter:inter + gn].reshape(s, g, n), nh // g, axis=1)
    c_in = jnp.repeat(xbc[:, inter + gn:].reshape(s, g, n), nh // g, axis=1)
    decay = jnp.exp(-jnp.exp(lp["A_log"].astype(jnp.float32)) * dt)  # [S, H]
    xd = xs * dt[..., None]  # [S, H, P]
    ssm_st = ssm_st * decay[..., None, None] + \
        xd[..., :, None] * b_in.astype(jnp.float32)[..., None, :]
    y = jnp.einsum("shpn,shn->shp", ssm_st, c_in.astype(jnp.float32))
    y = y + lp["D"].astype(jnp.float32)[None, :, None] * xs
    y = y.reshape(s, inter).astype(compute_dtype)
    y = gated_rms_norm(y, gate, lp["ssm_norm"])
    h = h + _mm(y, lp["out_proj"])[:, None]
    return h, conv_st, ssm_st


def _bare_attn(h, lp, spec: ModelSpec, x=None):
    """Nemotron-style bare attention q/k/v (no rope, no qk-norm, "norm" key).
    Returns (x_normed, q, k, v) with head reshapes."""
    b, t, _ = h.shape
    x = rms_norm(h, lp["norm"], spec.rms_eps)
    q = _mm(x, lp["q"]).reshape(b, t, spec.num_heads, spec.head_dim)
    k = _mm(x, lp["k"]).reshape(b, t, spec.num_kv_heads, spec.head_dim)
    v = _mm(x, lp["v"]).reshape(b, t, spec.num_kv_heads, spec.head_dim)
    return x, q, k, v


def _tokenwise_block(h, lp, spec: ModelSpec, collect_routing: bool = False):
    """Cache-free nemotron layers: "-" relu^2 MLP or "E" LatentMoE (same
    math as models/nemotron_h._mlp_block/_moe_block). Works for any leading
    shape. Returns (h, routed_ids|None)."""
    from prime_rl_tpu.ops.moe import moe_mlp

    def relu2(t):
        return jnp.square(jax.nn.relu(t))

    x = rms_norm(h, lp["norm"], spec.rms_eps)
    if "router" not in lp:
        return h + _mm(relu2(_mm(x, lp["up"])), lp["down"]), None
    lead = x.shape[:-1]
    d = x.shape[-1]
    flat = x.reshape(-1, d)
    lat = _mm(flat, lp["fc1_latent"]) if "fc1_latent" in lp else flat
    out, routing = moe_mlp(
        flat, lp["router"], None, lp["expert_up"], lp["expert_down"],
        spec.num_experts_per_tok, spec.norm_topk_prob,
        x_experts=lat, sigmoid_noaux=spec.router_sigmoid,
        correction_bias=lp.get("router_correction_bias"),
        n_group=spec.n_group, topk_group=spec.topk_group,
        routed_scaling=spec.routed_scaling_factor,
        allow_ep=False,  # see _moe_block: serving never uses the ambient EP mesh
    )
    if "fc2_latent" in lp:
        out = _mm(out, lp["fc2_latent"])
    out = out.reshape(*lead, d)
    out = out + _mm(relu2(_mm(x, lp["shared_up"])), lp["shared_down"])
    return h + out, (routing.expert_ids if collect_routing else None)


def _mla_prefill_block(h, lp, spec: ModelSpec, seg, positions, inv_freq,
                       compute_dtype):
    """MLA serving prefill over one padded sequence [1, L, D]: the training
    attention block verbatim (DSA indexer included, so sparse selection is
    exact), plus the latent kv rows — and for DSA the indexer-key rows — to
    page into the cache."""
    from prime_rl_tpu.models.mla_moe import (
        mla_absorbed_qkv,
        mla_attention,
        mla_indexer_qk,
    )

    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
    q_lat, _, latent, _ = mla_absorbed_qkv(x, lp, spec, positions, inv_freq)
    idx_rows = None
    if spec.index_topk > 0:
        _, _, idx_rows = mla_indexer_qk(x, lp, spec, positions, inv_freq, q_lat)
    h = mla_attention(h, lp, spec, seg, positions, inv_freq)
    return h, latent, idx_rows  # [1, L, kvl+rope], [1, L, di]|None


def _mla_decode_block(h, lp, spec: ModelSpec, k_l, v_l, lengths, page_table,
                      positions, inv_freq, flat_idx, compute_dtype):
    """MLA decode step for all S slots against the latent cache.

    deepseek_v3: dense attention over the slot's history (exact). DSA
    (index_topk > 0): the EXACT sparse selection — indexer keys are paged in
    the V pool, the new token's indexer query scores the history, and
    attention is masked to the same lax.top_k selection the training
    indexer computes (identical tie-breaking).
    h: [S, 1, D]; k_l [1, NP, PS, kvl+rope]; v_l [1, NP, PS, di]|None."""
    from prime_rl_tpu.models.mla_moe import (
        _qk_head_dim,
        mla_absorbed_qkv,
        mla_indexer_qk,
    )

    s = h.shape[0]
    kvl, vh = spec.kv_lora_rank, spec.v_head_dim
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
    q_lat, q_abs, latent_t, w_kv_b = mla_absorbed_qkv(x, lp, spec, positions, inv_freq)
    q_abs = q_abs[:, 0]          # [S, H, kvl+rope]
    latent_t = latent_t[:, 0]    # [S, kvl+rope]
    k_l = _write_tokens(k_l, latent_t[None].astype(k_l.dtype), flat_idx)
    np_, ps = k_l.shape[1], k_l.shape[2]
    flat = k_l[0].reshape(np_ * ps, -1)
    idx = (page_table[:, :, None] * ps +
           jnp.arange(ps, dtype=jnp.int32)[None, None, :]).reshape(s, -1)
    hist = jnp.take(flat, idx, axis=0)  # [S, T, kvl+rope]
    scale = _qk_head_dim(spec) ** -0.5
    sc = jnp.einsum("shd,std->sht", q_abs.astype(jnp.bfloat16),
                    hist.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * scale
    pos_k = jnp.arange(idx.shape[1], dtype=jnp.int32)
    mask = (pos_k[None, :] < lengths[:, None])  # [S, T]

    if spec.index_topk > 0 and v_l is not None:
        q_idx, w_idx, k_idx_t = mla_indexer_qk(x, lp, spec, positions, inv_freq, q_lat)
        v_l = _write_tokens(v_l, k_idx_t[:, 0][None].astype(v_l.dtype), flat_idx)
        iflat = v_l[0].reshape(np_ * ps, -1)
        ihist = jnp.take(iflat, idx, axis=0)  # [S, T, di]
        logits = jnp.einsum(
            "shd,std->sht", q_idx[:, 0].astype(jnp.bfloat16),
            ihist.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        logits = jnp.sum(w_idx[:, 0, :, None].astype(jnp.float32)
                         * jnp.maximum(logits, 0.0), axis=1)  # [S, T]
        logits = jnp.where(mask, logits, -1e30)
        # the same lax.top_k the training indexer runs — identical
        # tie-breaking (relu-zeroed scores tie often, a threshold form
        # over-selects them)
        k_eff = min(spec.index_topk, logits.shape[1])
        val, sel = jax.lax.top_k(logits, k_eff)
        sel_mask = jnp.zeros(logits.shape, bool).at[
            jnp.arange(s)[:, None], sel].set(val > -1e29)
        mask = mask & sel_mask

    sc = jnp.where(mask[:, None, :], sc, -1e30)
    p = jax.nn.softmax(sc, axis=-1)
    out_lat = jnp.einsum("sht,std->shd", p.astype(hist.dtype), hist[..., :kvl],
                         preferred_element_type=jnp.float32)  # [S, H, kvl]
    v_out = jnp.einsum("shk,khv->shv", out_lat.astype(compute_dtype),
                       w_kv_b[..., spec.qk_nope_head_dim:])
    h = h + _mm(v_out.reshape(s, 1, spec.num_heads * vh), lp["o"])
    return h, k_l, v_l


def unstack_params(params: Params, spec: ModelSpec) -> Params:
    """Training layout (stacked [NL, ...] layers) -> serving layout (a list of
    per-layer dicts). The serving forward unrolls the layer loop in Python so
    each layer's KV buffer is read/written IN PLACE — a scan over stacked
    caches would copy the whole pool every decode step. glm4_moe's first-k
    dense layers (``dense_layers``) prepend in order; qwen3_next interleaves
    its ``lin_layers`` / ``attn_layers`` stacks by the gdn_pattern."""
    if spec.gdn_pattern:
        layers = []
        li = ai = 0
        for ch in spec.gdn_pattern:
            if ch == "L":
                layers.append({k: v[li] for k, v in params["lin_layers"].items()})
                li += 1
            else:
                layers.append({k: v[ai] for k, v in params["attn_layers"].items()})
                ai += 1
        out = {k: v for k, v in params.items()
               if k not in ("lin_layers", "attn_layers")}
        out["layers"] = layers
        return out
    if spec.layer_pattern:
        # nemotron_h: interleave the four type-stacks by the pattern string
        stack_of = {"M": "mamba_layers", "*": "attn_layers",
                    "-": "mlp_layers", "E": "moe_layers"}
        idx = {v: 0 for v in stack_of.values()}
        layers = []
        for ch in spec.layer_pattern:
            name = stack_of[ch]
            i = idx[name]
            idx[name] += 1
            layers.append({k: v[i] for k, v in params[name].items()})
        out = {k: v for k, v in params.items() if k not in stack_of.values()}
        out["layers"] = layers
        return out
    dense = params.get("dense_layers")
    k_dense = 0 if dense is None else next(iter(dense.values())).shape[0]
    layers = [
        {k: v[l] for k, v in dense.items()} for l in range(k_dense)
    ] if dense is not None else []
    n_moe = spec.num_layers - k_dense
    layers += [
        {k: v[l] for k, v in params["layers"].items()} for l in range(n_moe)
    ]
    out = {k: v for k, v in params.items() if k not in ("layers", "dense_layers")}
    out["layers"] = layers
    return out


def prefill(
    params: Params,  # serving layout (unstack_params)
    spec: ModelSpec,
    k_pool: list[jax.Array],  # NL x [NKV, NP, PS, HD]
    v_pool: list[jax.Array],
    input_ids: jax.Array,  # [1, Lpad] int32 (bucketed)
    length: jax.Array,  # int32 scalar: true prompt length
    pages: jax.Array,  # [Lpad // page_size] int32: this slot's pages
    *,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    want_prompt_logprobs: bool = False,
    adapter_idx: jax.Array | None = None,  # scalar int32: LoRA bank row (0 = none)
    mm: dict | None = None,
):
    """Returns (k_pool, v_pool, last_hidden [D], prompt_logprobs [Lpad]|None).

    ``prompt_logprobs[i] = logp(token_i | tokens_<i)`` (position 0 is the
    uniform pad) — the scoring surface for OPD/prefill-scoring
    (reference: utils/client.py:599 prefill_logprobs).

    ``mm`` (VLM serving prefill, reference: vLLM multimodal prefill role):
    precomputed vision embeddings + mRoPE positions, all device arrays —
      vis_embed [R, D] merged image embeddings,
      ds_feats [n_ds, R, D] DeepStack feature maps,
      img_slot [1, Lpad] row index per vision-token position,
      positions [1, Lpad, rot//2] per-frequency mRoPE positions.
    """
    _, lpad = input_ids.shape
    page_size = next((b.shape[2] for b in k_pool if b is not None), 1)
    n_pages = lpad // page_size
    inv_freq, rope_scaling = _rope(spec)
    positions = jnp.broadcast_to(jnp.arange(lpad, dtype=jnp.int32), (1, lpad))
    segment_ids = (positions < length).astype(jnp.int32)

    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)

    img_mask = None
    img_slot = None
    if mm is not None:
        # slot >= 0 (host-assigned) gates injection — not token id; see
        # models/qwen3_vl.forward
        img_slot = jnp.maximum(mm["img_slot"], 0)
        img_mask = (mm["img_slot"] >= 0)[..., None]
        gathered = jnp.take(mm["vis_embed"].astype(compute_dtype), img_slot, axis=0)
        h = jnp.where(img_mask, gathered, h)
        positions = mm["positions"]  # [1, Lpad, rot//2] per-frequency

    from prime_rl_tpu.models.qwen3 import layer_windows_list
    from prime_rl_tpu.sampler.cache import layer_kinds

    windows = layer_windows_list(spec)
    kinds = layer_kinds(spec)
    n_ds = mm["ds_feats"].shape[0] if mm is not None else 0

    def _ds(li, hh):
        # DeepStack: add the li-th visual feature map at image slots after
        # layer li, whatever the layer kind (HF Qwen3VLTextModel
        # _deepstack_process; training analogue in models/qwen3_vl.forward)
        if li >= n_ds:
            return hh
        inj = jnp.take(mm["ds_feats"][li].astype(compute_dtype), img_slot, axis=0)
        return jnp.where(img_mask, hh + inj, hh)

    k_out, v_out, r_rows = [], [], []
    for li, (lp, k_l, v_l, win, kind) in enumerate(
            zip(params["layers"], k_pool, v_pool, windows, kinds)):
        lp = _cast_layer(lp, compute_dtype)
        if kind == "L":
            # recurrent GatedDeltaNet layer: no KV pages; emit the slot's
            # conv window + fast-weight state for the decode pool
            h, conv_row, state_row = _gdn_prefill_mixer(
                h, lp, spec, segment_ids, length, compute_dtype)
            h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx)
            h = _ds(li, h)
            k_out.append(k_l)
            v_out.append(v_l)
            r_rows.append((conv_row, state_row))
            continue
        if kind == "M":
            h, conv_row, state_row = _mamba_prefill_mixer(
                h, lp, spec, segment_ids, length, compute_dtype)
            h = _ds(li, h)
            k_out.append(k_l)
            v_out.append(v_l)
            r_rows.append((conv_row, state_row))
            continue
        if kind in ("-", "E"):
            h, _ = _tokenwise_block(h, lp, spec)
            h = _ds(li, h)
            k_out.append(k_l)
            v_out.append(v_l)
            r_rows.append(None)
            continue
        r_rows.append(None)
        if kind == "*":
            # nemotron bare attention: no rope, no MLP pairing
            x, q, k, v = _bare_attn(h, lp, spec)
            o = attention(q, k, v, segment_ids, causal=True, impl=attn_impl)
            h = h + _mm(o.reshape(1, lpad, spec.q_dim), lp["o"])
            h = _ds(li, h)
            k_w = k[0].transpose(1, 0, 2).reshape(spec.num_kv_heads, n_pages, page_size, spec.head_dim)
            v_w = v[0].transpose(1, 0, 2).reshape(spec.num_kv_heads, n_pages, page_size, spec.head_dim)
            k_out.append(_write_pages(k_l, k_w.astype(k_l.dtype), pages))
            v_out.append(_write_pages(v_l, v_w.astype(v_l.dtype), pages))
            continue
        if spec.kv_lora_rank > 0:
            # MLA: training attention block + latent rows into the cache
            # (DSA also pages the indexer keys into the V pool)
            mla_freqs = rope_frequencies(spec.qk_rope_head_dim, spec.rope_theta)
            h, latent, idx_rows = _mla_prefill_block(
                h, lp, spec, segment_ids, positions, mla_freqs, compute_dtype)
            h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx)
            lat_w = latent[0].reshape(1, n_pages, page_size, -1)
            k_out.append(_write_pages(k_l, lat_w.astype(k_l.dtype), pages))
            if idx_rows is not None:
                idx_w = idx_rows[0].reshape(1, n_pages, page_size, -1)
                v_l = _write_pages(v_l, idx_w.astype(v_l.dtype), pages)
            v_out.append(v_l)
            continue
        x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
        q, k, v = _qkv(x, lp, spec, positions, _freqs_for(spec, inv_freq, win),
                       rope_scaling, adapter_idx)
        o = attention(q, k, v, segment_ids, causal=True, impl=attn_impl,
                      window=win, sinks=lp.get("sink"))
        o = _gated_o(o, x, lp, spec)
        proj = _mm_l(o.reshape(1, lpad, spec.q_dim), lp["o"], lp.get("lora"), "o",
                     adapter_idx) + _obias(lp, h.dtype)
        h = h + _post_attn(proj, lp, spec)
        h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx)
        # scatter K/V into this slot's pages. dynamic_update_slice per page
        # (NOT .at[].set with an index array) — XLA lowers dus-in-loop as an
        # in-place update on the donated pool; advanced-index scatter copies
        # the whole buffer.
        k_w = k[0].transpose(1, 0, 2).reshape(spec.num_kv_heads, n_pages, page_size, spec.head_dim)
        v_w = v[0].transpose(1, 0, 2).reshape(spec.num_kv_heads, n_pages, page_size, spec.head_dim)
        k_out.append(_write_pages(k_l, k_w.astype(k_l.dtype), pages))
        v_out.append(_write_pages(v_l, v_w.astype(v_l.dtype), pages))
        h = _ds(li, h)
    k_pool, v_pool = k_out, v_out
    h = rms_norm(h, params["final_norm"], spec.rms_eps)

    last_hidden = h[0, jnp.maximum(length - 1, 0)]
    prompt_logprobs = None
    if want_prompt_logprobs:
        from prime_rl_tpu.ops.lm_head import chunked_logprob_entropy

        lm_head = dense_lm_head(params, spec, compute_dtype)
        labels = jnp.concatenate([input_ids[:, 1:], jnp.zeros((1, 1), jnp.int32)], axis=1)
        lp_next, _ = chunked_logprob_entropy(h, lm_head, labels, None, chunk_size=1024,
                                             softcap=spec.final_logit_softcap)
        prompt_logprobs = jnp.concatenate(
            [jnp.full((1, 1), -jnp.log(spec.vocab_size), jnp.float32), lp_next[:, :-1]], axis=1
        )[0]
    return k_pool, v_pool, last_hidden, prompt_logprobs, r_rows


def prefill_batch(
    params: Params,
    spec: ModelSpec,
    k_pool: list[jax.Array],
    v_pool: list[jax.Array],
    input_ids: jax.Array,  # [B, Lpad] int32 (bucketed)
    lengths: jax.Array,  # [B] int32 true prompt lengths
    pages: jax.Array,  # [B, Lpad // page_size] int32 per-row page rows
    *,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    adapter_idx: jax.Array | None = None,  # scalar: one adapter per batch
):
    """Batched prefill for homogeneous-"A" models (standard attention+MLP/MoE
    stacks — qwen3/llama/gpt-oss class): B prompts through ONE program.

    Per-request prefill programs are dispatch-bound on remote runtimes
    (~75 ms fixed cost each through the tunnel); an admission burst of R
    requests serializes R of them. Batching amortizes the fixed cost B-fold
    (the reference gets this from vLLM's batched prefill scheduler). Rows are
    independent: per-row segment masking, per-row page writes; dummy rows
    (length 0, pages all-null) are legal padding.

    Returns (k_pool, v_pool, last_hidden [B, D], r_rows (all None)).
    """
    b, lpad = input_ids.shape
    page_size = next((p.shape[2] for p in k_pool if p is not None), 1)
    n_pages = lpad // page_size
    inv_freq, rope_scaling = _rope(spec)
    positions = jnp.broadcast_to(jnp.arange(lpad, dtype=jnp.int32), (b, lpad))
    segment_ids = (positions < lengths[:, None]).astype(jnp.int32)

    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)

    from prime_rl_tpu.models.qwen3 import layer_windows_list

    windows = layer_windows_list(spec)
    k_out, v_out = [], []
    for lp, k_l, v_l, win in zip(params["layers"], k_pool, v_pool, windows):
        lp = _cast_layer(lp, compute_dtype)
        x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
        q, k, v = _qkv(x, lp, spec, positions, _freqs_for(spec, inv_freq, win),
                       rope_scaling, adapter_idx)
        o = attention(q, k, v, segment_ids, causal=True, impl=attn_impl,
                      window=win, sinks=lp.get("sink"))
        o = _gated_o(o, x, lp, spec)
        proj = _mm_l(o.reshape(b, lpad, spec.q_dim), lp["o"], lp.get("lora"), "o",
                     adapter_idx) + _obias(lp, h.dtype)
        h = h + _post_attn(proj, lp, spec)
        h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx)
        # per-row page writes: dus-in-loop over B static rows stays in place
        # on the donated pools (same rationale as the single-row prefill)
        k_w = k.transpose(0, 2, 1, 3).reshape(b, spec.num_kv_heads, n_pages, page_size, spec.head_dim)
        v_w = v.transpose(0, 2, 1, 3).reshape(b, spec.num_kv_heads, n_pages, page_size, spec.head_dim)
        for r in range(b):
            k_l = _write_pages(k_l, k_w[r].astype(k_l.dtype), pages[r])
            v_l = _write_pages(v_l, v_w[r].astype(v_l.dtype), pages[r])
        k_out.append(k_l)
        v_out.append(v_l)
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    last_hidden = jnp.take_along_axis(
        h, jnp.maximum(lengths - 1, 0)[:, None, None], axis=1)[:, 0]  # [B, D]
    return k_out, v_out, last_hidden


def _chunk_attention_xla(q, k_l, v_l, q_pos, page_row, valid_hi, window=0, sinks=None):
    """Chunk queries against the slot's full paged history (already written,
    including this chunk). q: [C, NH, HD]; page_row: [P] this slot's pages;
    q_pos: [C] global positions; valid_hi: highest valid global pos + 1.
    Causal over global positions (pos_k <= pos_q)."""
    c, nh, hd = q.shape
    nkv, _, ps, _ = k_l.shape
    p = page_row.shape[0]
    group = nh // nkv
    k_g = jnp.take(k_l, page_row, axis=1).reshape(nkv, p * ps, hd)
    v_g = jnp.take(v_l, page_row, axis=1).reshape(nkv, p * ps, hd)
    qf = q.reshape(c, nkv, group, hd).astype(jnp.float32)
    scores = jnp.einsum("ckgd,ktd->ckgt", qf, k_g.astype(jnp.float32)) * (hd ** -0.5)
    pos_k = jnp.arange(p * ps)[None, :]  # flat index == position (contiguous map)
    mask = (pos_k <= q_pos[:, None]) & (pos_k < valid_hi)
    if window and window > 0:
        mask = mask & (pos_k > (q_pos[:, None] - window))
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    if sinks is not None:
        sf = sinks.astype(jnp.float32).reshape(nkv, group)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sf)
        pexp = jnp.exp(scores - m)
        probs = pexp / (jnp.sum(pexp, axis=-1, keepdims=True) + jnp.exp(sf - m))
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("ckgt,ktd->ckgd", probs, v_g.astype(jnp.float32))
    return out.reshape(c, nh, hd)


def prefill_chunk(
    params: Params,
    spec: ModelSpec,
    k_pool: list[jax.Array],
    v_pool: list[jax.Array],
    input_ids: jax.Array,  # [1, C] int32: this chunk's tokens (C page-multiple)
    offset: jax.Array,  # i32 scalar: global position of the chunk start (page-aligned)
    valid: jax.Array,  # i32 scalar: true tokens in this chunk (<= C)
    pages_chunk: jax.Array,  # [C // page_size] int32: pages receiving this chunk's KV
    page_row: jax.Array,  # [P] int32: the slot's FULL page-table row
    *,
    compute_dtype=jnp.bfloat16,
    adapter_idx: jax.Array | None = None,
    r_rows: list | None = None,  # hybrid: per-layer (conv_row, state_row) | None
):
    """One chunk of an incremental prefill: computes K/V for positions
    [offset, offset+C), writes them into the slot's pages, and attends over
    the whole cached history INCLUDING the shared prefix-cache pages.

    Powers both chunked prefill of long prompts and prefix-cache hits (the
    cached prefix is simply never recomputed — vLLM semantics per SURVEY
    §2.4; reference relies on vLLM's chunked prefill + prefix caching).
    Returns (k_pool, v_pool, last_hidden [D]) at local position valid-1.

    Hybrid (GDN/Mamba) models: pass ``r_rows`` — per-layer (conv_row,
    state_row) at global position ``offset`` (zeros for a fresh start) —
    and the return gains a 4th element, the advanced r_rows. Recurrent
    layers continue exactly from the carried state (the lever vLLM lacks:
    its hybrid models get no chunked prefill or prefix caching at all);
    attention layers chunk over paged history as usual.
    """
    _, c = input_ids.shape
    page_size = next((b.shape[2] for b in k_pool if b is not None), 1)
    n_pages = c // page_size
    inv_freq, rope_scaling = _rope(spec)
    positions = offset + jnp.arange(c, dtype=jnp.int32)[None, :]  # [1, C]
    q_pos = positions[0]
    valid_hi = offset + valid
    seg = (jnp.arange(c, dtype=jnp.int32)[None, :] < valid).astype(jnp.int32)

    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)

    from prime_rl_tpu.models.qwen3 import layer_windows_list
    from prime_rl_tpu.sampler.cache import layer_kinds

    windows = layer_windows_list(spec)
    kinds = layer_kinds(spec) if r_rows is not None else ["A"] * spec.num_layers
    k_out, v_out, r_out = [], [], []
    for li, (lp, k_l, v_l, win, kind) in enumerate(
            zip(params["layers"], k_pool, v_pool, windows, kinds)):
        lp = _cast_layer(lp, compute_dtype)
        if kind == "L":
            h, conv_row, state_row = _gdn_chunk_mixer(
                h, lp, spec, seg, valid, r_rows[li][0], r_rows[li][1],
                compute_dtype)
            h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec,
                         adapter_idx)
            k_out.append(k_l)
            v_out.append(v_l)
            r_out.append((conv_row, state_row))
            continue
        if kind == "M":
            h, conv_row, state_row = _mamba_chunk_mixer(
                h, lp, spec, seg, valid, r_rows[li][0], r_rows[li][1],
                compute_dtype)
            k_out.append(k_l)
            v_out.append(v_l)
            r_out.append((conv_row, state_row))
            continue
        if kind in ("-", "E"):
            h, _ = _tokenwise_block(h, lp, spec)
            k_out.append(k_l)
            v_out.append(v_l)
            r_out.append(None)
            continue
        r_out.append(None)
        if kind == "*":
            # nemotron bare attention chunk: no rope, paged history
            x, q, k, v = _bare_attn(h, lp, spec)
            k_w = k[0].transpose(1, 0, 2).reshape(
                spec.num_kv_heads, n_pages, page_size, spec.head_dim)
            v_w = v[0].transpose(1, 0, 2).reshape(
                spec.num_kv_heads, n_pages, page_size, spec.head_dim)
            k_l = _write_pages(k_l, k_w.astype(k_l.dtype), pages_chunk)
            v_l = _write_pages(v_l, v_w.astype(v_l.dtype), pages_chunk)
            o = _chunk_attention_xla(
                q[0].astype(compute_dtype), k_l, v_l, q_pos, page_row, valid_hi)
            h = h + _mm(o.reshape(1, c, spec.q_dim).astype(compute_dtype),
                        lp["o"])
            k_out.append(k_l)
            v_out.append(v_l)
            continue
        if spec.kv_lora_rank > 0:
            # MLA chunk: latent rows paged, absorbed query attends the full
            # latent history (exact — same math as the training block). DSA
            # additionally pages the indexer keys and masks each chunk query
            # to its own lax.top_k selection over the history (exact sparse
            # chunked prefill — prefix caching therefore stays on for DSA).
            from prime_rl_tpu.models.mla_moe import (
                _qk_head_dim,
                mla_absorbed_qkv,
                mla_indexer_qk,
            )

            mla_freqs = rope_frequencies(spec.qk_rope_head_dim, spec.rope_theta)
            x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
            q_lat, q_abs, latent, w_kv_b = mla_absorbed_qkv(x, lp, spec, positions, mla_freqs)
            lat_w = latent[0].reshape(1, n_pages, page_size, -1)
            k_l = _write_pages(k_l, lat_w.astype(k_l.dtype), pages_chunk)
            flat = k_l[0]
            p = page_row.shape[0]
            hist = jnp.take(flat, page_row, axis=0).reshape(p * page_size, -1)
            sc = jnp.einsum("chd,td->cht", q_abs[0].astype(jnp.bfloat16),
                            hist.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32) * (_qk_head_dim(spec) ** -0.5)
            pos_k = jnp.arange(p * page_size)[None, :]
            mask = (pos_k <= q_pos[:, None]) & (pos_k < valid_hi)
            if spec.index_topk > 0 and v_l is not None:
                q_idx, w_idx, k_idx = mla_indexer_qk(x, lp, spec, positions,
                                                     mla_freqs, q_lat)
                idx_w = k_idx[0].reshape(1, n_pages, page_size, -1)
                v_l = _write_pages(v_l, idx_w.astype(v_l.dtype), pages_chunk)
                ihist = jnp.take(v_l[0], page_row, axis=0).reshape(p * page_size, -1)
                lg = jnp.einsum("chd,td->cht", q_idx[0].astype(jnp.bfloat16),
                                ihist.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                lg = jnp.sum(w_idx[0][:, :, None].astype(jnp.float32)
                             * jnp.maximum(lg, 0.0), axis=1)  # [C, T]
                lg = jnp.where(mask, lg, -1e30)
                k_eff = min(spec.index_topk, lg.shape[1])
                val, sel = jax.lax.top_k(lg, k_eff)
                sel_mask = jnp.zeros(lg.shape, bool).at[
                    jnp.arange(lg.shape[0])[:, None], sel].set(val > -1e29)
                mask = mask & sel_mask
            sc = jnp.where(mask[:, None, :], sc, -1e30)
            probs = jax.nn.softmax(sc, axis=-1)
            out_lat = jnp.einsum("cht,td->chd", probs.astype(hist.dtype),
                                 hist[:, :spec.kv_lora_rank],
                                 preferred_element_type=jnp.float32)
            v_out_ = jnp.einsum("chk,khv->chv", out_lat.astype(compute_dtype),
                                w_kv_b[..., spec.qk_nope_head_dim:])
            h = h + _mm(v_out_.reshape(1, c, spec.num_heads * spec.v_head_dim), lp["o"])
            h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx)
            k_out.append(k_l)
            v_out.append(v_l)
            continue
        x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
        q, k, v = _qkv(x, lp, spec, positions, _freqs_for(spec, inv_freq, win),
                       rope_scaling, adapter_idx)
        k_w = k[0].transpose(1, 0, 2).reshape(spec.num_kv_heads, n_pages, page_size, spec.head_dim)
        v_w = v[0].transpose(1, 0, 2).reshape(spec.num_kv_heads, n_pages, page_size, spec.head_dim)
        k_l = _write_pages(k_l, k_w.astype(k_l.dtype), pages_chunk)
        v_l = _write_pages(v_l, v_w.astype(v_l.dtype), pages_chunk)
        o = _chunk_attention_xla(
            q[0].astype(compute_dtype), k_l, v_l, q_pos, page_row, valid_hi,
            window=win, sinks=lp.get("sink"),
        )
        o = _gated_o(o, x[0], lp, spec)
        proj = _mm_l(o.reshape(1, c, spec.q_dim).astype(compute_dtype), lp["o"],
                     lp.get("lora"), "o", adapter_idx) + _obias(lp, h.dtype)
        h = h + _post_attn(proj, lp, spec)
        h = h + _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx)
        k_out.append(k_l)
        v_out.append(v_l)
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    last_hidden = h[0, jnp.maximum(valid - 1, 0)]
    if r_rows is not None:
        return k_out, v_out, last_hidden, r_out
    return k_out, v_out, last_hidden


def _write_pages(pool: jax.Array, new_pages: jax.Array, pages: jax.Array) -> jax.Array:
    """In-place page writes: pool [NKV, NP, PS, HD], new_pages [NKV, n, PS, HD]
    placed at page indices ``pages [n]``."""
    nkv, _, ps, hd = pool.shape
    n = new_pages.shape[1]

    def body(i, buf):
        page = jax.lax.dynamic_slice(new_pages, (0, i, 0, 0), (nkv, 1, ps, hd))
        return jax.lax.dynamic_update_slice(buf, page, (0, pages[i], 0, 0))

    return jax.lax.fori_loop(0, n, body, pool)


def _write_tokens(pool: jax.Array, new_kv: jax.Array, flat_idx: jax.Array) -> jax.Array:
    """In-place single-token writes: pool [NKV, NP, PS, HD] viewed flat as
    [NKV, NP*PS, HD]; new_kv [NKV, S, HD] at token offsets ``flat_idx [S]``."""
    nkv, np_, ps, hd = pool.shape
    s = new_kv.shape[1]
    flat = pool.reshape(nkv, np_ * ps, hd)

    def body(i, buf):
        tok = jax.lax.dynamic_slice(new_kv, (0, i, 0), (nkv, 1, hd))
        return jax.lax.dynamic_update_slice(buf, tok, (0, flat_idx[i], 0))

    return jax.lax.fori_loop(0, s, body, flat).reshape(nkv, np_, ps, hd)


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _decode_attention_xla(q, k_l, v_l, lengths, page_table, window=0, sinks=None):
    """Reference/fallback decode attention: gather each slot's pages and do
    masked attention. q: [S, NH, HD]; k_l/v_l: [NKV, NP, PS, HD];
    page_table: [S, P]. Used on CPU, for windowed/sink layers, and as the
    parity oracle for kernels."""
    s, nh, hd = q.shape
    nkv, _, ps, _ = k_l.shape
    p = page_table.shape[1]
    group = nh // nkv
    # [S, NKV, P, PS, HD] -> [S, NKV, P*PS, HD]
    k_g = jnp.take(k_l, page_table, axis=1).transpose(1, 0, 2, 3, 4).reshape(s, nkv, p * ps, hd)
    v_g = jnp.take(v_l, page_table, axis=1).transpose(1, 0, 2, 3, 4).reshape(s, nkv, p * ps, hd)
    qf = q.reshape(s, nkv, group, hd).astype(jnp.float32)
    scores = jnp.einsum("skgd,sktd->skgt", qf, k_g.astype(jnp.float32)) * (hd ** -0.5)
    pos = jnp.arange(p * ps)[None, :]
    mask = pos < lengths[:, None]  # [S, T]
    if window and window > 0:
        # page_table maps positions contiguously per slot (pre-allocated), so
        # flat index == token position within the slot
        mask = mask & (pos >= (lengths - window)[:, None])
    scores = jnp.where(mask[:, None, None, :], scores, -1e30)
    if sinks is not None:
        sf = sinks.astype(jnp.float32).reshape(nkv, group)[None, :, :, None]
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True), sf)
        pexp = jnp.exp(scores - m)
        denom = jnp.sum(pexp, axis=-1, keepdims=True) + jnp.exp(sf - m)
        probs = pexp / denom
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("skgt,sktd->skgd", probs, v_g.astype(jnp.float32))
    return out.reshape(s, nh, hd)


def _decode_attention(q, k_l, v_l, lengths, page_table, impl: str, window=0, sinks=None):
    if impl == "pallas" and q.shape[-1] % 128 == 0 and k_l.shape[2] % 8 == 0:
        # first-party fused kernel in score-only mode: a zero-length dummy
        # "new token" would change the softmax, so route through the XLA
        # oracle only when the kernel's constraints don't hold
        from jax.experimental.pallas.ops.tpu.paged_attention import paged_attention

        if not window and sinks is None:
            pages_per_block = min(8, page_table.shape[1])
            # the kernel applies no softmax scale — pre-scale q
            q_scaled = (q.astype(jnp.float32) * (q.shape[-1] ** -0.5)).astype(q.dtype)
            return paged_attention(
                q_scaled, k_l, v_l, lengths, page_table,
                pages_per_compute_block=pages_per_block,
            )
    return _decode_attention_xla(q, k_l, v_l, lengths, page_table, window, sinks)


def _decode_attn_fused_local(q_t, k_t, v_t, k_l, v_l, lengths, page_table,
                             sinks_arr, impl: str, window: int, has_sinks: bool):
    """Single-shard body of the fused decode attention (head-local)."""
    sinks = sinks_arr if has_sinks else None
    ps = k_l.shape[2]
    if impl == "pallas" and q_t.shape[-1] % 128 == 0 and ps % 8 == 0:
        from prime_rl_tpu.ops.decode_attention import decode_paged_attention

        return decode_paged_attention(
            q_t, k_t.astype(k_l.dtype), v_t.astype(v_l.dtype), k_l, v_l,
            lengths, page_table, window=window or 0, sinks=sinks)
    page_idx = jnp.take_along_axis(page_table, (lengths // ps)[:, None], axis=1)[:, 0]
    flat_idx = page_idx * ps + lengths % ps
    k_l = _write_tokens(k_l, k_t.transpose(1, 0, 2).astype(k_l.dtype), flat_idx)
    v_l = _write_tokens(v_l, v_t.transpose(1, 0, 2).astype(v_l.dtype), flat_idx)
    o = _decode_attention(q_t, k_l, v_l, lengths + 1, page_table, impl,
                          window=window, sinks=sinks)
    return o, k_l, v_l


def _decode_attn_fused(q_t, k_t, v_t, k_l, v_l, lengths, page_table, impl: str,
                       window=0, sinks=None, mesh=None):
    """Fused append + attention for one decode step.

    ``q_t/k_t/v_t`` are the new token's projections [S, NH|NKV, HD];
    ``lengths`` EXCLUDE the new token. Returns (o [S, NH, HD], k_l, v_l)
    with the token's K/V appended to the pools. On TPU this is one Pallas
    kernel (ops/decode_attention.py — covers windows and sinks in-kernel);
    elsewhere it falls back to scatter + gathered XLA attention.

    With a ``mesh`` whose ``tensor`` degree divides the head counts, runs
    under shard_map with heads and KV pools sharded — attention is
    embarrassingly parallel over kv heads, so each shard computes its heads
    fully locally (TP serving; the reference's vLLM tensor_parallel_size)."""
    import functools as _ft

    from jax.sharding import PartitionSpec as _P

    sinks_arr = (jnp.zeros((q_t.shape[1],), jnp.float32) if sinks is None
                 else jnp.asarray(sinks, jnp.float32))
    fn = _ft.partial(_decode_attn_fused_local, impl=impl,
                     window=int(window or 0), has_sinks=sinks is not None)
    tp = mesh.shape.get("tensor", 1) if mesh is not None else 1
    if tp > 1 and q_t.shape[1] % tp == 0 and k_t.shape[1] % tp == 0:
        h = _P(None, "tensor", None)
        pool = _P("tensor", None, None, None)
        return jax.shard_map(
            fn, mesh=mesh,
            in_specs=(h, h, h, pool, pool, _P(None), _P(None, None), _P("tensor")),
            out_specs=(h, pool, pool),
            check_vma=False,
        )(q_t, k_t, v_t, k_l, v_l, lengths, page_table, sinks_arr)
    return fn(q_t, k_t, v_t, k_l, v_l, lengths, page_table, sinks_arr)


def decode(
    params: Params,
    spec: ModelSpec,
    k_pool: list[jax.Array],  # NL x [NKV, NP, PS, HD]
    v_pool: list[jax.Array],
    tokens: jax.Array,  # [S] int32: the newest token of each slot
    lengths: jax.Array,  # [S] int32: tokens in cache BEFORE this one
    page_table: jax.Array,  # [S, P] int32
    *,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    adapter_idx: jax.Array | None = None,  # [S] int32 per-slot LoRA bank rows
    pos_delta: jax.Array | None = None,  # [S] int32 rope-position offset (mRoPE)
    collect_routing: bool = False,  # also return routed experts [S, NL, K]
    r_conv: list | None = None,   # per-layer [S, conv_dim, K] (GDN layers)
    r_state: list | None = None,  # per-layer [S, Hv, Dk, Dv]
    mesh=None,  # TP serving: shard_map attention over the "tensor" axis
):
    """One decode step for all S slots: writes the new token's K/V, attends
    over lengths+1 tokens, returns (k_pool, v_pool, logits [S, V]).

    ``pos_delta`` shifts the ROPE position only (cache indexing still runs on
    token counts): for a VLM prompt, mRoPE compresses each image block to a
    grid, so post-prompt text positions run at ``token_index + delta`` with a
    per-request constant delta (HF get_rope_index decode semantics). Text
    requests carry delta 0.

    The layer loop is unrolled in Python over per-layer cache buffers so XLA
    lowers the token scatters as IN-PLACE updates on the donated pool —
    scanning stacked caches would rewrite the whole pool every step."""
    if attn_impl == "auto":
        attn_impl = "pallas" if jax.default_backend() not in ("cpu",) else "xla"
    s = tokens.shape[0]
    page_size = next((b.shape[2] for b in k_pool if b is not None), 1)
    inv_freq, rope_scaling = _rope(spec)
    positions = lengths[:, None]  # [S, 1]: 0-based position of the new token
    if pos_delta is not None:
        positions = positions + pos_delta[:, None]

    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, tokens[:, None], axis=0)  # [S, 1, D]

    page_idx = jnp.take_along_axis(page_table, (lengths // page_size)[:, None], axis=1)[:, 0]
    flat_idx = page_idx * page_size + lengths % page_size  # [S]
    attn_lengths = lengths + 1

    from prime_rl_tpu.models.qwen3 import layer_windows_list
    from prime_rl_tpu.sampler.cache import layer_kinds

    windows = layer_windows_list(spec)
    kinds = layer_kinds(spec)
    if r_conv is None:
        r_conv = [None] * len(kinds)
        r_state = [None] * len(kinds)
    k_out, v_out = [], []
    rc_out, rs_out = [], []
    routed = []
    for lp, k_l, v_l, win, kind, rc_l, rs_l in zip(
            params["layers"], k_pool, v_pool, windows, kinds, r_conv, r_state):
        lp = _cast_layer(lp, compute_dtype)
        if kind in ("L", "M"):
            mixer = _gdn_decode_mixer if kind == "L" else _mamba_decode_mixer
            h, rc_l, rs_l = mixer(h, lp, spec, rc_l, rs_l, compute_dtype)
            if kind == "L":
                mlp_out = _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec,
                               adapter_idx, collect_routing=collect_routing)
                if collect_routing:
                    mlp_out, ids = mlp_out
                    if ids is not None:
                        routed.append(ids)
                h = h + mlp_out
            k_out.append(k_l)
            v_out.append(v_l)
            rc_out.append(rc_l)
            rs_out.append(rs_l)
            continue
        rc_out.append(rc_l)
        rs_out.append(rs_l)
        if spec.kv_lora_rank > 0:
            mla_freqs = rope_frequencies(spec.qk_rope_head_dim, spec.rope_theta)
            h, k_l, v_l = _mla_decode_block(h, lp, spec, k_l, v_l, attn_lengths,
                                            page_table, positions, mla_freqs,
                                            flat_idx, compute_dtype)
            mlp_out = _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec,
                           adapter_idx, collect_routing=collect_routing)
            if collect_routing:
                mlp_out, ids = mlp_out
                if ids is not None:
                    routed.append(ids)
            h = h + mlp_out
            k_out.append(k_l)
            v_out.append(v_l)
            continue
        if kind in ("-", "E"):
            h, ids = _tokenwise_block(h, lp, spec, collect_routing=collect_routing)
            if collect_routing and ids is not None:
                routed.append(ids)
            k_out.append(k_l)
            v_out.append(v_l)
            continue
        if kind == "*":
            x, q, k, v = _bare_attn(h, lp, spec)
            o, k_l, v_l = _decode_attn_fused(
                q[:, 0].astype(compute_dtype), k[:, 0], v[:, 0], k_l, v_l,
                lengths, page_table, attn_impl, mesh=mesh)
            h = h + _mm(o.reshape(s, 1, spec.q_dim).astype(compute_dtype), lp["o"])
            k_out.append(k_l)
            v_out.append(v_l)
            continue
        freqs = _freqs_for(spec, inv_freq, win)
        fused_qkv = False
        if attn_impl == "pallas" and adapter_idx is None and mesh is None:
            from prime_rl_tpu.ops.decode_qkv import decode_qkv_prep, fits_vmem

            fused_qkv = (
                spec.qk_norm_scope != "layer"
                and not (spec.attn_gate and "attn_gate" in lp)
                and "lora" not in lp
                # int8 weight-only layers store q/k/v as {"q8","scale"} dicts
                # (quantize_params); the Pallas kernel wants plain arrays, so
                # those layers take the XLA _qkv path whose _mm dequantizes.
                and not isinstance(lp["q"], dict)
                and fits_vmem(spec.hidden_size, spec.num_heads,
                              spec.num_kv_heads, spec.head_dim)
            )
        if fused_qkv:
            # one Pallas launch for norm + qkv + bias + qk-norm + rope: the
            # ~12 small fusions this chain lowers to otherwise dominate the
            # decode step at serving batch sizes (ops/decode_qkv.py)
            q3, k3, v3 = decode_qkv_prep(
                h[:, 0], lp["attn_norm"], lp["q"], lp["k"], lp["v"],
                positions[:, 0], freqs,
                num_heads=spec.num_heads, num_kv_heads=spec.num_kv_heads,
                head_dim=spec.head_dim, qk_norm=bool(spec.qk_norm),
                q_norm_w=lp.get("q_norm"), k_norm_w=lp.get("k_norm"),
                q_bias=lp.get("q_bias"), k_bias=lp.get("k_bias"),
                v_bias=lp.get("v_bias"),
                scaling=rope_scaling, eps=spec.rms_eps,
            )
            x0 = None
        else:
            x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
            q, k, v = _qkv(x, lp, spec, positions, freqs,
                           rope_scaling, adapter_idx)
            q3, k3, v3 = q[:, 0].astype(compute_dtype), k[:, 0], v[:, 0]
            x0 = x[:, 0]
        # fused append + attention (windows/sinks handled in-kernel on TPU)
        o, k_l, v_l = _decode_attn_fused(
            q3.astype(compute_dtype), k3, v3, k_l, v_l,
            lengths, page_table, attn_impl, window=win, sinks=lp.get("sink"),
            mesh=mesh,
        )  # o: [S, NH, HD]
        if x0 is not None:
            o = _gated_o(o, x0, lp, spec)
        proj = _mm_l(o.reshape(s, 1, spec.q_dim).astype(compute_dtype), lp["o"],
                     lp.get("lora"), "o", adapter_idx) + _obias(lp, h.dtype)
        h = h + _post_attn(proj, lp, spec)
        mlp_out = _mlp(rms_norm(h, lp["mlp_norm"], spec.rms_eps), lp, spec, adapter_idx,
                       collect_routing=collect_routing)
        if collect_routing:
            mlp_out, ids = mlp_out
            if ids is not None:
                routed.append(ids)  # [S, K]
        h = h + mlp_out
        k_out.append(k_l)
        v_out.append(v_l)
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    logits = logits_from_hidden(params, spec, h[:, 0], compute_dtype)  # [S, V]
    if collect_routing:
        routed_arr = (jnp.stack(routed, axis=1) if routed
                      else jnp.zeros((s, 0, 0), jnp.int32))  # [S, NL_moe, K]
        return k_out, v_out, logits, routed_arr, rc_out, rs_out
    return k_out, v_out, logits, rc_out, rs_out


def logits_from_hidden(params: Params, spec: ModelSpec, hidden: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    w = params.get("lm_head") if not spec.tie_embeddings else None
    if isinstance(w, dict):  # int8 weight-only head
        logits = jnp.dot(hidden.astype(compute_dtype), w["q8"].astype(compute_dtype),
                         preferred_element_type=jnp.float32) * w["scale"]
    else:
        lm_head = get_lm_head(params, spec).astype(compute_dtype)
        logits = jnp.dot(hidden.astype(compute_dtype), lm_head,
                         preferred_element_type=jnp.float32)
    if spec.final_logit_softcap > 0:
        logits = spec.final_logit_softcap * jnp.tanh(logits / spec.final_logit_softcap)
    return logits


def dense_lm_head(params: Params, spec: ModelSpec, dtype) -> jax.Array:
    """Materialized [D, V] head (dequantized if needed) for the chunked
    prompt-logprob path."""
    w = params.get("lm_head") if not spec.tie_embeddings else None
    if isinstance(w, dict):
        return (w["q8"].astype(jnp.float32) * w["scale"]).astype(dtype)
    return get_lm_head(params, spec).astype(dtype)
