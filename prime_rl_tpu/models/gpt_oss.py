"""gpt-oss family (gpt-oss-20b/120b): MoE transformer with alternating
128-token sliding windows, learned attention sinks, clamped-GLU experts with
biases, top-k-softmax routing, attention biases, and YaRN RoPE to 131k.

Behavior parity target: reference trainer/models/gpt_oss/ (406 LoC torch
wrapping HF GptOss*); architecture per the public gpt-oss release. Same
functional-pytree design as models/qwen3.py — attention reuses
qwen3._attn_block (biases/sinks/window are spec axes), experts ride the
sorted ragged-GEMM MoE op (ops/moe.py) with gpt-oss's clamped activation,
and the alternating window pattern scans in period-2 super-blocks so each
layer's window is a compile-time constant for the banded flash kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.models.qwen3 import layer_windows_list, rope_setup
from prime_rl_tpu.ops.layers import rms_norm
from prime_rl_tpu.ops.moe import moe_mlp


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    from prime_rl_tpu.models.qwen3_moe import spec_dense_view

    base = qwen3.init_params(spec_dense_view(spec), key, dtype=dtype)
    nl, d = spec.num_layers, spec.hidden_size
    e, m = spec.num_experts, spec.moe_intermediate_size
    ks = jax.random.split(jax.random.fold_in(key, 11), 4)
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    layers = dict(base["layers"])
    for f in ("gate", "up", "down"):
        layers.pop(f, None)
    layers["router"] = w(ks[0], nl, d, e)
    layers["router_bias"] = jnp.zeros((nl, e), dtype)
    layers["expert_gate"] = w(ks[1], nl, e, d, m)
    layers["expert_up"] = w(ks[2], nl, e, d, m)
    layers["expert_down"] = w(ks[3], nl, e, m, d)
    layers["expert_gate_bias"] = jnp.zeros((nl, e, m), dtype)
    layers["expert_up_bias"] = jnp.zeros((nl, e, m), dtype)
    layers["expert_down_bias"] = jnp.zeros((nl, e, d), dtype)
    base["layers"] = layers
    return base


def moe_block(h: jax.Array, lp: dict, spec: ModelSpec, compute_dtype,
              forced=None, ll=None, lora_scale: float = 1.0):
    b, l, d = h.shape
    cast = {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2 and "router" not in k
                and not k.endswith("_bias") else v)
            for k, v in lp.items()}
    x = rms_norm(h, cast["mlp_norm"], spec.rms_eps)
    out, routing = moe_mlp(
        x.reshape(b * l, d),
        lp["router"],  # router math stays f32
        cast["expert_gate"], cast["expert_up"], cast["expert_down"],
        spec.num_experts_per_tok, spec.norm_topk_prob,
        router_b=lp.get("router_bias"),
        b_gate=lp.get("expert_gate_bias"), b_up=lp.get("expert_up_bias"),
        b_down=lp.get("expert_down_bias"),
        softmax_topk=spec.router_softmax_topk,
        activation_alpha=spec.swiglu_alpha, activation_limit=spec.swiglu_limit,
        forced_experts=forced, lora=ll, lora_scale=lora_scale,
    )
    return h + out.reshape(b, l, d), routing.load_balance_loss


def forward(
    params: Params,
    spec: ModelSpec,
    input_ids: jax.Array,
    segment_ids: jax.Array,
    position_ids: jax.Array,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    block_q: int = 512,
    block_kv: int = 512,
    remat: str = "full",
    mesh=None,
    lora=None,
    lora_scale: float = 1.0,
    cp_style: str = "ulysses",
    collect_aux: bool = False,
    routed_experts: jax.Array | None = None,  # [B, L, NL, K] replay (-1 = own)
):
    inv_freq, rope_scaling = rope_setup(spec)
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)
    b, l, _ = h.shape
    win_list = layer_windows_list(spec)

    def _block_impl(carry, lp, window: int, forced=None, ll=None):
        h, aux = carry
        cast = {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2 else v)
                for k, v in lp.items()}
        h = qwen3._attn_block(h, cast, spec, segment_ids, position_ids, inv_freq,
                              attn_impl, block_q, block_kv, mesh, ll, lora_scale,
                              cp_style, window, rope_scaling)
        h, lb = moe_block(h, lp, spec, compute_dtype, forced=forced, ll=ll,
                          lora_scale=lora_scale)
        return h, aux + lb

    def wrap(fn):
        if remat == "full":
            return jax.checkpoint(fn, prevent_cse=False)
        if remat in ("save_attn", "offload_attn"):
            policy = (
                jax.checkpoint_policies.save_only_these_names("attn_out", "attn_lse")
                if remat == "save_attn" else
                jax.checkpoint_policies.save_and_offload_only_these_names(
                    names_which_can_be_saved=[],
                    names_which_can_be_offloaded=["attn_out", "attn_lse"],
                    offload_src="device", offload_dst="pinned_host",
                )
            )
            return jax.checkpoint(fn, policy=policy, prevent_cse=False)
        if remat == "selective":
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                prevent_cse=False,
            )
        return fn

    nl = spec.num_layers
    period = next(
        p for p in range(1, nl + 1)
        if nl % p == 0 and all(win_list[i] == win_list[i % p] for i in range(nl))
    )
    blocks = [
        wrap(lambda c, lp, forced, ll, _w=w: _block_impl(c, lp, _w, forced, ll))
        for w in win_list[:period]
    ]

    def regroup(leaf):
        return leaf.reshape((nl // period, period) + leaf.shape[1:])

    layers_g = jax.tree.map(regroup, params["layers"])
    ll_g = (jax.tree.map(regroup, lora["layers"]) if lora is not None else None)
    forced_g = None
    if routed_experts is not None:
        # [B, L, NL, K] -> scan-major [NL, B*L, K] -> super-block groups
        forced_g = regroup(jnp.transpose(routed_experts, (2, 0, 1, 3)).reshape(
            nl, b * l, spec.num_experts_per_tok))

    def super_block(carry, xs):
        lp_g, forced, ll = xs
        for i in range(period):
            carry = blocks[i](
                carry, jax.tree.map(lambda x: x[i], lp_g),
                None if forced is None else forced[i],
                None if ll is None else jax.tree.map(lambda x: x[i], ll),
            )
        return carry, None

    (h, aux), _ = jax.lax.scan(super_block, (h, jnp.float32(0.0)),
                               (layers_g, forced_g, ll_g))
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect_aux else h


get_lm_head = qwen3.get_lm_head


# ---------------------------------------------------------------------------
# HF interchange (reference: gpt_oss/converting_gpt_oss.py role). HF stores
# experts FUSED and INTERLEAVED: gate_up_proj [E, D, 2M] with gate = ::2 and
# up = 1::2 (used as x @ W, so no transpose), biases likewise.
# ---------------------------------------------------------------------------

_ATTN_KEYS = [
    ("attn_norm", "input_layernorm.weight", False),
    ("q", "self_attn.q_proj.weight", True),
    ("k", "self_attn.k_proj.weight", True),
    ("v", "self_attn.v_proj.weight", True),
    ("o", "self_attn.o_proj.weight", True),
    ("q_bias", "self_attn.q_proj.bias", False),
    ("k_bias", "self_attn.k_proj.bias", False),
    ("v_bias", "self_attn.v_proj.bias", False),
    ("o_bias", "self_attn.o_proj.bias", False),
    ("sink", "self_attn.sinks", False),
    ("mlp_norm", "post_attention_layernorm.weight", False),
    ("router", "mlp.router.weight", True),
    ("router_bias", "mlp.router.bias", False),
]


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    def get(key, tr):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    nl = spec.num_layers
    layers: dict[str, np.ndarray] = {}
    for field, suffix, tr in _ATTN_KEYS:
        layers[field] = np.stack([get(f"model.layers.{i}.{suffix}", tr) for i in range(nl)])
    gu = np.stack([get(f"model.layers.{i}.mlp.experts.gate_up_proj", False) for i in range(nl)])
    gub = np.stack([get(f"model.layers.{i}.mlp.experts.gate_up_proj_bias", False) for i in range(nl)])
    layers["expert_gate"] = gu[..., ::2]
    layers["expert_up"] = gu[..., 1::2]
    layers["expert_gate_bias"] = gub[..., ::2]
    layers["expert_up_bias"] = gub[..., 1::2]
    layers["expert_down"] = np.stack(
        [get(f"model.layers.{i}.mlp.experts.down_proj", False) for i in range(nl)])
    layers["expert_down_bias"] = np.stack(
        [get(f"model.layers.{i}.mlp.experts.down_proj_bias", False) for i in range(nl)])
    params: Params = {
        "embed": get("model.embed_tokens.weight", False),
        "layers": layers,
        "final_norm": get("model.norm.weight", False),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = get("lm_head.weight", True)
    return jax.tree.map(jnp.asarray, params)


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict:
    state: dict[str, np.ndarray] = {}
    state["model.embed_tokens.weight"] = np.asarray(params["embed"])
    state["model.norm.weight"] = np.asarray(params["final_norm"])
    layers = params["layers"]
    nl, e, m = spec.num_layers, spec.num_experts, spec.moe_intermediate_size
    for field, suffix, tr in _ATTN_KEYS:
        stacked = np.asarray(layers[field])
        for i in range(nl):
            state[f"model.layers.{i}.{suffix}"] = stacked[i].T if tr else stacked[i]
    gate = np.asarray(layers["expert_gate"])
    up = np.asarray(layers["expert_up"])
    gu = np.empty((nl, e, spec.hidden_size, 2 * m), gate.dtype)
    gu[..., ::2], gu[..., 1::2] = gate, up
    gb = np.asarray(layers["expert_gate_bias"])
    ub = np.asarray(layers["expert_up_bias"])
    gub = np.empty((nl, e, 2 * m), gb.dtype)
    gub[..., ::2], gub[..., 1::2] = gb, ub
    down = np.asarray(layers["expert_down"])
    db = np.asarray(layers["expert_down_bias"])
    for i in range(nl):
        state[f"model.layers.{i}.mlp.experts.gate_up_proj"] = gu[i]
        state[f"model.layers.{i}.mlp.experts.gate_up_proj_bias"] = gub[i]
        state[f"model.layers.{i}.mlp.experts.down_proj"] = down[i]
        state[f"model.layers.{i}.mlp.experts.down_proj_bias"] = db[i]
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return state


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("gpt_oss", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
