"""Qwen3-MoE family (Qwen3-30B-A3B class): Qwen3 attention blocks + token-
choice top-k sparse MLP via sorted ragged grouped-GEMM (ops/moe.py).

Behavior parity target: reference trainer/models/qwen3_moe/ (591 LoC torch);
architecture per the public Qwen3-MoE configs. Same functional-pytree /
stacked-layer-scan design as models/qwen3.py; expert weights carry an extra
leading [E] axis sharded over the ``expert`` mesh axis (models/base.py
PARAM_SPECS)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.ops.layers import rms_norm, rope_frequencies
from prime_rl_tpu.ops.moe import moe_mlp


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    """Dense init via qwen3 (attn/embed/norm reuse) + expert tensors."""
    base = qwen3.init_params(
        spec_dense_view(spec), key, dtype=dtype
    )
    nl, d, e, m = spec.num_layers, spec.hidden_size, spec.num_experts, spec.moe_intermediate_size
    ks = jax.random.split(jax.random.fold_in(key, 7), 4)
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    layers = dict(base["layers"])
    for f in ("gate", "up", "down"):
        layers.pop(f, None)  # dense MLP replaced by experts
    layers["router"] = w(ks[0], nl, d, e)
    layers["expert_gate"] = w(ks[1], nl, e, d, m)
    layers["expert_up"] = w(ks[2], nl, e, d, m)
    layers["expert_down"] = w(ks[3], nl, e, m, d)
    base["layers"] = layers
    return base


def spec_dense_view(spec: ModelSpec) -> ModelSpec:
    """A dense-shaped twin used to reuse qwen3's attn/embed init."""
    from dataclasses import replace

    return replace(spec, num_experts=0, num_experts_per_tok=0, moe_intermediate_size=0)


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
    routed_experts: jax.Array | None = None,  # [B, L, NL, K] int32 replay (-1 = own)
):
    """Token ids -> final normed hidden states [B, L, D]. With
    ``collect_aux``: (hidden, load-balance aux loss summed over layers) —
    the training hookup for the switch-style balance term
    (reference: models/layers/moe.py load_balance_coeff).

    ``routed_experts`` replays the sampler's per-token expert selection
    layer-by-layer (reference: modeling forward routed_experts router
    replay); rows of -1 (context tokens) keep the trainer's own routing."""
    inv_freq = rope_frequencies(spec.head_dim, spec.rope_theta)
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)
    b, l, d = h.shape

    def block(carry, lp, forced=None, ll=None):
        h, aux = carry
        cast = {k: (v.astype(compute_dtype) if v.ndim >= 2 and k != "router" else v)
                for k, v in lp.items()}
        h = qwen3._attn_block(h, cast, spec, segment_ids, position_ids, inv_freq,
                              attn_impl, block_q, block_kv, mesh, ll, lora_scale, cp_style)
        x = rms_norm(h, cast["mlp_norm"], spec.rms_eps)
        out, routing = moe_mlp(
            x.reshape(b * l, d),
            lp["router"],  # router stays f32
            cast["expert_gate"], cast["expert_up"], cast["expert_down"],
            spec.num_experts_per_tok, spec.norm_topk_prob,
            forced_experts=forced,
            lora=ll, lora_scale=lora_scale,
        )
        return h + out.reshape(b, l, d), aux + routing.load_balance_loss

    if remat == "full":
        block = jax.checkpoint(block, prevent_cse=False)
    elif remat == "selective":
        block = jax.checkpoint(
            block, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            prevent_cse=False,
        )

    ll_stack = lora["layers"] if lora is not None else None
    if routed_experts is None:
        if ll_stack is None:
            (h, aux), _ = jax.lax.scan(lambda c, lp: (block(c, lp), None),
                                       (h, jnp.float32(0.0)), params["layers"])
        else:
            (h, aux), _ = jax.lax.scan(
                lambda c, xs: (block(c, xs[0], ll=xs[1]), None),
                (h, jnp.float32(0.0)), (params["layers"], ll_stack))
    else:
        # [B, L, NL, K] -> scan-major [NL, B*L, K]
        forced = jnp.transpose(routed_experts, (2, 0, 1, 3)).reshape(
            spec.num_layers, b * l, spec.num_experts_per_tok)
        if ll_stack is None:
            (h, aux), _ = jax.lax.scan(lambda c, xs: (block(c, xs[0], xs[1]), None),
                                       (h, jnp.float32(0.0)), (params["layers"], forced))
        else:
            (h, aux), _ = jax.lax.scan(
                lambda c, xs: (block(c, xs[0], xs[1], xs[2]), None),
                (h, jnp.float32(0.0)), (params["layers"], forced, ll_stack))
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect_aux else h


get_lm_head = qwen3.get_lm_head


# ---------------------------------------------------------------------------
# HF interchange (reference: models/qwen3_moe/converting_qwen3_moe.py role).
# HF layout: model.layers.{i}.mlp.gate.weight [E? no: router], experts.{e}.*
# ---------------------------------------------------------------------------

def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    def get(key, tr):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    m = qwen3.hf_key_map(spec)
    for f in ("gate", "up", "down"):
        m.pop(f)
    layers: dict[str, np.ndarray] = {}
    for field, (suffix, tr) in m.items():
        layers[field] = np.stack([get(f"model.layers.{i}.{suffix}", tr) for i in range(spec.num_layers)])
    nl, e = spec.num_layers, spec.num_experts
    layers["router"] = np.stack([get(f"model.layers.{i}.mlp.gate.weight", True) for i in range(nl)])
    for ours, theirs in (("expert_gate", "gate_proj"), ("expert_up", "up_proj"), ("expert_down", "down_proj")):
        layers[ours] = np.stack([
            np.stack([get(f"model.layers.{i}.mlp.experts.{j}.{theirs}.weight", True) for j in range(e)])
            for i in range(nl)
        ])
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
    m = qwen3.hf_key_map(spec)
    for f in ("gate", "up", "down"):
        m.pop(f)
    for field, (suffix, tr) in m.items():
        stacked = np.asarray(params["layers"][field])
        for i in range(spec.num_layers):
            state[f"model.layers.{i}.{suffix}"] = stacked[i].T if tr else stacked[i]
    router = np.asarray(params["layers"]["router"])
    for i in range(spec.num_layers):
        state[f"model.layers.{i}.mlp.gate.weight"] = router[i].T
    for ours, theirs in (("expert_gate", "gate_proj"), ("expert_up", "up_proj"), ("expert_down", "down_proj")):
        stacked = np.asarray(params["layers"][ours])
        for i in range(spec.num_layers):
            for j in range(spec.num_experts):
                state[f"model.layers.{i}.mlp.experts.{j}.{theirs}.weight"] = stacked[i, j].T
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return state


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("qwen3_moe", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
