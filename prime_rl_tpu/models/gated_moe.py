"""MiniMax-M2 / AFMoE / Laguna families — gated-attention MoE transformers.

All three share the glm4_moe functional block (sigmoid-scored routing with a
selection-only correction bias, optional shared experts, dense-first layers)
plus the round-2 spec axes:

- minimax_m2 (reference: trainer/models/minimax_m2/ — 475 LoC torch):
  per-LAYER q/k RMSNorm (full flattened width), partial rotary (rotary_dim
  64 of 128), sigmoid routing + e_score_correction_bias, every layer MoE.
- afmoe (reference: trainer/models/afmoe/ — 670 LoC): sliding windows with a
  full layer every n, sigmoid attention-output gate, sandwich norms
  (post-attn/post-MLP norms before the residual add), shared experts,
  dense-first layers.
- laguna (reference: trainer/models/laguna/ — 682 LoC): per-head softplus
  attention gate, per-layer-type rope theta (full 500k / sliding 10k),
  absolute-size shared expert, dense-first mlp_layer_types.

Init and forward delegate to glm4_moe (which reads the spec axes); this
module owns the per-family HF state-dict layouts (reference:
converting_minimax_m2.py / converting_afmoe.py / converting_laguna.py key
maps) and registers the families.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np

from prime_rl_tpu.models import Family, glm4_moe, qwen3, register_family
from prime_rl_tpu.models.base import ModelSpec, Params


def init_params(spec: ModelSpec, key: jax.Array, dtype=None):
    import jax.numpy as jnp

    params = glm4_moe.init_params(spec, key, dtype=dtype or jnp.float32)
    if spec.family == "afmoe":
        # afmoe's router has no HF correction-bias tensor; keep selection
        # unbiased (the zeros buffer would be dead weight in checkpoints)
        params["layers"].pop("router_correction_bias", None)
    return params


@dataclass(frozen=True)
class _Keys:
    """Per-family HF key layout (reference converting_*.py chains)."""
    router: str                    # router weight, stored [E, D] (transposed)
    bias: str | None               # e_score_correction_bias, [E]
    experts: str                   # per-expert prefix
    expert_projs: tuple            # (gate, up, down) suffixes under experts.{e}.
    shared: str | None             # shared-expert prefix
    mlp_norm: str                  # our "mlp_norm" (pre-MLP norm) HF name
    attn_gate: str | None = None
    post_attn_norm: str | None = None
    post_mlp_norm: str | None = None


_TABLES = {
    # reference converting_minimax_m2.py: block_sparse_moe.{gate,experts.{e}.w1/w2/w3}
    # (w1=gate [m,d], w2=down [d,m], w3=up [m,d] — all nn.Linear, transposed)
    "minimax_m2": _Keys(
        router="block_sparse_moe.gate.weight",
        bias="block_sparse_moe.e_score_correction_bias",
        experts="block_sparse_moe.experts",
        expert_projs=("w1.weight", "w3.weight", "w2.weight"),
        shared=None,
        mlp_norm="post_attention_layernorm.weight",
    ),
    # reference converting_afmoe.py: mlp.{router.gate,experts.{e}.*_proj,
    # shared_experts.*}; sandwich norms pre_mlp/post_mlp_layernorm
    "afmoe": _Keys(
        router="mlp.router.gate.weight",
        bias=None,
        experts="mlp.experts",
        expert_projs=("gate_proj.weight", "up_proj.weight", "down_proj.weight"),
        shared="mlp.shared_experts",
        mlp_norm="pre_mlp_layernorm.weight",
        attn_gate="self_attn.gate_proj.weight",
        post_attn_norm="post_attention_layernorm.weight",
        post_mlp_norm="post_mlp_layernorm.weight",
    ),
    # reference converting_laguna.py: mlp.gate.weight router,
    # mlp.experts.e_score_correction_bias, singular mlp.shared_expert.*
    "laguna": _Keys(
        router="mlp.gate.weight",
        bias="mlp.experts.e_score_correction_bias",
        experts="mlp.experts",
        expert_projs=("gate_proj.weight", "up_proj.weight", "down_proj.weight"),
        shared="mlp.shared_expert",
        mlp_norm="post_attention_layernorm.weight",
        attn_gate="self_attn.g_proj.weight",
    ),
}


def _attn_keys(spec: ModelSpec, t: _Keys):
    keys = [
        ("attn_norm", "input_layernorm.weight", False),
        ("q", "self_attn.q_proj.weight", True),
        ("k", "self_attn.k_proj.weight", True),
        ("v", "self_attn.v_proj.weight", True),
        ("o", "self_attn.o_proj.weight", True),
        ("mlp_norm", t.mlp_norm, False),
    ]
    if spec.qk_norm:
        keys += [("q_norm", "self_attn.q_norm.weight", False),
                 ("k_norm", "self_attn.k_norm.weight", False)]
    if t.attn_gate:
        keys.append(("attn_gate", t.attn_gate, True))
    if t.post_attn_norm:
        keys.append(("post_attn_norm", t.post_attn_norm, False))
    if t.post_mlp_norm:
        keys.append(("post_mlp_norm", t.post_mlp_norm, False))
    if spec.attn_bias:
        keys += [("q_bias", "self_attn.q_proj.bias", False),
                 ("k_bias", "self_attn.k_proj.bias", False),
                 ("v_bias", "self_attn.v_proj.bias", False)]
    return keys


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    t = _TABLES[spec.family]

    def get(key, tr):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    k_dense, nl, e = spec.first_k_dense_replace, spec.num_layers, spec.num_experts
    akeys = _attn_keys(spec, t)

    def layer_attn(i):
        return {f: get(f"model.layers.{i}.{suf}", tr) for f, suf, tr in akeys}

    dense_layers: dict[str, list] = {}
    for i in range(k_dense):
        lp = layer_attn(i)
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            lp[ours] = get(f"model.layers.{i}.mlp.{theirs}.weight", True)
        for k, v in lp.items():
            dense_layers.setdefault(k, []).append(v)

    moe_layers: dict[str, list] = {}
    for i in range(k_dense, nl):
        lp = layer_attn(i)
        lp["router"] = get(f"model.layers.{i}.{t.router}", True)
        if t.bias:
            lp["router_correction_bias"] = get(f"model.layers.{i}.{t.bias}", False)
        for ours, suf in zip(("expert_gate", "expert_up", "expert_down"), t.expert_projs):
            lp[ours] = np.stack([
                get(f"model.layers.{i}.{t.experts}.{j}.{suf}", True) for j in range(e)
            ])
        if t.shared and (spec.n_shared_experts or spec.shared_expert_size):
            for ours, theirs in (("shared_gate", "gate_proj"), ("shared_up", "up_proj"),
                                 ("shared_down", "down_proj")):
                lp[ours] = get(f"model.layers.{i}.{t.shared}.{theirs}.weight", True)
        for k, v in lp.items():
            moe_layers.setdefault(k, []).append(v)

    params: Params = {
        "embed": get("model.embed_tokens.weight", False),
        "layers": {k: np.stack(v) for k, v in moe_layers.items()},
        "final_norm": get("model.norm.weight", False),
    }
    if k_dense:
        params["dense_layers"] = {k: np.stack(v) for k, v in dense_layers.items()}
    if not spec.tie_embeddings:
        params["lm_head"] = get("lm_head.weight", True)
    import jax.numpy as jnp  # noqa: F401
    return jax.tree.map(jax.numpy.asarray, params)


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict:
    t = _TABLES[spec.family]
    state: dict[str, np.ndarray] = {}
    state["model.embed_tokens.weight"] = np.asarray(params["embed"])
    state["model.norm.weight"] = np.asarray(params["final_norm"])
    k_dense = spec.first_k_dense_replace
    akeys = _attn_keys(spec, t)

    def put_attn(i, lp):
        for f, suf, tr in akeys:
            arr = np.asarray(lp[f])
            state[f"model.layers.{i}.{suf}"] = arr.T if tr else arr

    for i in range(k_dense):
        lp = jax.tree.map(lambda x: x[i], params["dense_layers"])
        put_attn(i, lp)
        for ours, theirs in (("gate", "gate_proj"), ("up", "up_proj"), ("down", "down_proj")):
            state[f"model.layers.{i}.mlp.{theirs}.weight"] = np.asarray(lp[ours]).T
    for li in range(spec.num_layers - k_dense):
        i = k_dense + li
        lp = jax.tree.map(lambda x: x[li], params["layers"])
        put_attn(i, lp)
        state[f"model.layers.{i}.{t.router}"] = np.asarray(lp["router"]).T
        if t.bias:
            state[f"model.layers.{i}.{t.bias}"] = np.asarray(lp["router_correction_bias"])
        for ours, suf in zip(("expert_gate", "expert_up", "expert_down"), t.expert_projs):
            stacked = np.asarray(lp[ours])
            for j in range(spec.num_experts):
                state[f"model.layers.{i}.{t.experts}.{j}.{suf}"] = stacked[j].T
        if t.shared and "shared_gate" in lp:
            for ours, theirs in (("shared_gate", "gate_proj"), ("shared_up", "up_proj"),
                                 ("shared_down", "down_proj")):
                state[f"model.layers.{i}.{t.shared}.{theirs}.weight"] = np.asarray(lp[ours]).T
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return state


for _fam in ("minimax_m2", "afmoe", "laguna"):
    register_family(_fam, Family(
        init_params, glm4_moe.forward, params_from_hf_state_dict,
        params_to_hf_state_dict, qwen3.get_lm_head,
    ))
