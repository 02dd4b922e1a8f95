"""LoRA adapters as functional pytrees.

Re-design of the reference's module-swap LoRA (reference: trainer/lora.py:
1-306, models/layers/lora/ MultiLoRALinear): adapters are a SEPARATE pytree
``{"layers": {"q_a": [nl, in, r], "q_b": [nl, r, out], ...}}`` threaded
through the same scanned forward — the base stays frozen (never donated,
never touched by the optimizer) and the train state holds only adapter
params, so optimizer memory is O(rank).

Serving: ``merge_lora`` folds B·A into the base for HF snapshots (the
filesystem weight-broadcast path the reference requires for LoRA), and
``adapter_state_dict`` exports a standalone PEFT-style adapter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from prime_rl_tpu.configs.shared import LoRAConfig
from prime_rl_tpu.models.base import ModelSpec, Params

# target -> (in_dim_attr, out_dim_attr) resolved against the spec
_TARGET_DIMS = {
    "q": ("hidden_size", "q_dim"),
    "k": ("hidden_size", "kv_dim"),
    "v": ("hidden_size", "kv_dim"),
    "o": ("q_dim", "hidden_size"),
    "gate": ("hidden_size", "intermediate_size"),
    "up": ("hidden_size", "intermediate_size"),
    "down": ("intermediate_size", "hidden_size"),
}

# per-expert adapter targets (MoE families, LoRAConfig.experts=True): stacks
# carry an extra leading [E] axis and apply via two extra ragged_dots in
# ops/moe.moe_mlp (reference analogue: PEFT targeting grouped expert weights)
_MOE_TARGETS = ("moe_gate", "moe_up", "moe_down")

# accept the reference's HF-style regex-ish names too (q_proj -> q)
_ALIASES = {f"{t}_proj": t for t in _TARGET_DIMS}
_ALIASES.update({"q_b_proj": "q_b", "kv_a_proj_with_mqa": "kv_a",
                 "kv_b_proj": "kv_b", "o_proj": "o",
                 "expert_gate": "moe_gate", "expert_up": "moe_up",
                 "expert_down": "moe_down"})


def target_dims(t: str, spec: ModelSpec) -> tuple[int, int]:
    """(in, out) dims of target ``t`` on this spec. MLA families (kv_lora_
    rank > 0) have their own projection shapes (reference MLA module names:
    q_b_proj / kv_a_proj_with_mqa / kv_b_proj). moe_* targets are per-expert
    (the stack adds a leading [E] axis); latent MoE (nemotron) computes
    experts at ``moe_latent_size``."""
    if t in _MOE_TARGETS:
        d = getattr(spec, "moe_latent_size", 0) or spec.hidden_size
        m = spec.moe_intermediate_size
        return (m, d) if t == "moe_down" else (d, m)
    if spec.kv_lora_rank > 0:
        mla = {
            "q": (spec.hidden_size, spec.num_heads * spec.head_dim),
            "q_b": (spec.q_lora_rank, spec.num_heads * spec.head_dim),
            "kv_a": (spec.hidden_size, spec.kv_lora_rank + spec.qk_rope_head_dim),
            "kv_b": (spec.kv_lora_rank,
                     spec.num_heads * (spec.qk_nope_head_dim + spec.v_head_dim)),
            "o": (spec.num_heads * spec.v_head_dim, spec.hidden_size),
        }
        if t in mla:
            return mla[t]
    a, b = _TARGET_DIMS[t]
    return getattr(spec, a), getattr(spec, b)


def resolve_targets(cfg: LoRAConfig, spec: ModelSpec) -> list[str]:
    out = []
    experts_on = bool(getattr(cfg, "experts", False))
    for name in cfg.target_modules:
        t = _ALIASES.get(name, name)
        if spec.kv_lora_rank > 0:
            # MLA: generic attention names map onto the latent projections
            t = {"q": ("q_b" if spec.q_lora_rank else "q"),
                 "k": "kv_b", "v": "kv_b"}.get(t, t)
        if (t not in _TARGET_DIMS and t not in ("q_b", "kv_a", "kv_b")
                and t not in _MOE_TARGETS):
            raise ValueError(f"unknown LoRA target {name!r}")
        if spec.is_moe and t in ("gate", "up", "down"):
            # generic MLP names on a MoE spec: per-expert adapters when
            # opted in (lora.experts=true), otherwise skipped as before
            if not experts_on:
                continue
            t = f"moe_{t}"
        if t in _MOE_TARGETS:
            if not spec.is_moe:
                continue
            if t == "moe_gate" and getattr(spec, "moe_latent_size", 0):
                continue  # nemotron LatentMoE experts are non-gated (relu^2)
        if t not in out:
            out.append(t)
    return out


def lora_scale(cfg: LoRAConfig) -> float:
    return cfg.alpha / cfg.rank


def init_lora(spec: ModelSpec, cfg: LoRAConfig, key: jax.Array, dtype=jnp.float32) -> Params:
    """A ~ N(0, 0.02), B = 0 (identity at init). moe_* targets add a leading
    per-expert axis: A [nl, E, in, r], B [nl, E, r, out]."""
    layers: dict[str, jax.Array] = {}
    nl, r = spec.num_layers, cfg.rank
    for i, t in enumerate(resolve_targets(cfg, spec)):
        d_in, d_out = target_dims(t, spec)
        k = jax.random.fold_in(key, i)
        lead = (nl, spec.num_experts) if t in _MOE_TARGETS else (nl,)
        layers[f"{t}_a"] = (jax.random.normal(k, (*lead, d_in, r)) * 0.02).astype(dtype)
        layers[f"{t}_b"] = jnp.zeros((*lead, r, d_out), dtype)
    return {"layers": layers}


def lora_param_pspec(path: str) -> P:
    """Sharding: A input-dim over fsdp, B output-dim over tensor; the tiny
    rank dim stays replicated. Per-expert stacks shard the expert axis."""
    if "moe_" in path:
        if path.endswith("_a"):
            return P(None, "expert", "fsdp", None)
        if path.endswith("_b"):
            return P(None, "expert", None, "tensor")
    if path.endswith("_a"):
        return P(None, "fsdp", None)
    if path.endswith("_b"):
        return P(None, None, "tensor")
    raise KeyError(path)


def apply_lora_proj(x: jax.Array, w, lora_layer: dict | None,
                    name: str, scale: float) -> jax.Array:
    """y = x·W (+ scale · (x·A)·B). Adapter math runs in the compute dtype.
    ``w`` may be an int8 weight-only record {"q8", "scale"} (serving)."""
    if isinstance(w, dict):
        y = jnp.dot(x, w["q8"].astype(x.dtype)) * w["scale"].astype(x.dtype)
    else:
        y = jnp.dot(x, w)
    if lora_layer is not None and f"{name}_a" in lora_layer:
        a = lora_layer[f"{name}_a"].astype(x.dtype)
        b = lora_layer[f"{name}_b"].astype(x.dtype)
        y = y + scale * jnp.dot(jnp.dot(x, a), b)
    return y


def merge_lora(base: Params, lora: Params, cfg: LoRAConfig,
               spec: ModelSpec | None = None) -> Params:
    """base + scale·A·B folded in (host or device) for serving snapshots.

    Layout-aware: glm4/mla-style split stacks (``dense_layers`` +
    ``layers``) take the matching slice of the [nl, ...] adapter stacks;
    qwen3_next's ``attn_layers`` take the attention-layer rows (needs
    ``spec`` for the pattern)."""
    scale = lora_scale(cfg)
    targets = sorted({k[:-2] for k in lora["layers"] if k.endswith("_a")})
    moe_keys = {"moe_gate": "expert_gate", "moe_up": "expert_up",
                "moe_down": "expert_down"}

    def merge_stack(stack: dict, sl) -> dict:
        merged = dict(stack)
        for t in targets:
            key = moe_keys.get(t, t)
            if key not in stack:
                continue
            a = lora["layers"][f"{t}_a"][sl].astype(jnp.float32)
            b = lora["layers"][f"{t}_b"][sl].astype(jnp.float32)
            if a.ndim == 4:  # per-expert stacks [l, E, in, r] x [l, E, r, out]
                delta = jnp.einsum("leir,lero->leio", a, b) * scale
            else:
                delta = jnp.einsum("lir,lro->lio", a, b) * scale
            merged[key] = (stack[key].astype(jnp.float32) + delta).astype(stack[key].dtype)
        return merged

    out = dict(base)
    if "attn_layers" in base:  # hybrid layouts: adapters index full depth
        if spec is None or not (spec.gdn_pattern or spec.layer_pattern):
            raise ValueError("merge_lora on a hybrid layout needs the spec")
        pat = spec.gdn_pattern or spec.layer_pattern
        stack_chars = ({"A": "attn_layers", "L": "lin_layers"}
                       if spec.gdn_pattern else
                       {"*": "attn_layers", "E": "moe_layers"})
        for char, name in stack_chars.items():
            if name not in base:
                continue
            idx = np.nonzero([c == char for c in pat])[0]
            if len(idx):
                out[name] = merge_stack(base[name], jnp.asarray(idx))
        return out
    if "dense_layers" in base:
        k = next(iter(base["dense_layers"].values())).shape[0]
        out["dense_layers"] = merge_stack(base["dense_layers"], slice(0, k))
        out["layers"] = merge_stack(base["layers"], slice(k, None))
        return out
    out["layers"] = merge_stack(base["layers"], slice(None))
    return out


def adapter_from_state_dict(state: dict, spec: ModelSpec) -> dict[str, np.ndarray]:
    """Inverse of ``adapter_state_dict``: PEFT-style flat dict -> stacked
    per-target layers pytree {"q_a": [NL, in, r], "q_b": [NL, r, out], ...}
    (the serving bank's load format)."""
    hf_names = {"q": ("self_attn", "q_proj"), "k": ("self_attn", "k_proj"),
                "v": ("self_attn", "v_proj"), "o": ("self_attn", "o_proj"),
                "gate": ("mlp", "gate_proj"), "up": ("mlp", "up_proj"),
                "down": ("mlp", "down_proj"),
                # MLA latent projections (HF DeepseekV3 module names)
                "q_b": ("self_attn", "q_b_proj"),
                "kv_a": ("self_attn", "kv_a_proj_with_mqa"),
                "kv_b": ("self_attn", "kv_b_proj")}
    layers: dict[str, np.ndarray] = {}
    for t, (mod, hf) in hf_names.items():
        key0 = f"base_model.model.model.layers.0.{mod}.{hf}.lora_A.weight"
        if key0 not in state:
            continue
        a = np.stack([
            np.asarray(state[f"base_model.model.model.layers.{i}.{mod}.{hf}.lora_A.weight"]).T
            for i in range(spec.num_layers)
        ])  # [NL, in, r]
        b = np.stack([
            np.asarray(state[f"base_model.model.model.layers.{i}.{mod}.{hf}.lora_B.weight"]).T
            for i in range(spec.num_layers)
        ])  # [NL, r, out]
        layers[f"{t}_a"] = a
        layers[f"{t}_b"] = b
    # per-expert adapters: mlp.experts.{e}.{gate|up|down}_proj
    for t, hf in (("moe_gate", "gate_proj"), ("moe_up", "up_proj"),
                  ("moe_down", "down_proj")):
        key0 = f"base_model.model.model.layers.0.mlp.experts.0.{hf}.lora_A.weight"
        if key0 not in state:
            continue
        def stack_ab(which):
            return np.stack([
                np.stack([
                    np.asarray(state[
                        f"base_model.model.model.layers.{i}.mlp.experts.{e}.{hf}.{which}.weight"
                    ]).T
                    for e in range(spec.num_experts)
                ]) for i in range(spec.num_layers)
            ])  # [NL, E, ..., ...]
        layers[f"{t}_a"] = stack_ab("lora_A")
        layers[f"{t}_b"] = stack_ab("lora_B")
    if not layers:
        raise ValueError("no LoRA tensors found in adapter state dict")
    return layers


def adapter_state_dict(lora: Params, spec: ModelSpec, cfg: LoRAConfig) -> dict[str, np.ndarray]:
    """PEFT-style flat dict (per-layer, HF naming) for standalone adapter
    snapshots (reference: ckpt.py LoRA adapter export)."""
    hf_names = {"q": "q_proj", "k": "k_proj", "v": "v_proj", "o": "o_proj",
                "gate": "gate_proj", "up": "up_proj", "down": "down_proj",
                "q_b": "q_b_proj", "kv_a": "kv_a_proj_with_mqa",
                "kv_b": "kv_b_proj"}
    mod_prefix = {"q": "self_attn", "k": "self_attn", "v": "self_attn", "o": "self_attn",
                  "gate": "mlp", "up": "mlp", "down": "mlp",
                  "q_b": "self_attn", "kv_a": "self_attn", "kv_b": "self_attn"}
    state: dict[str, np.ndarray] = {}
    for t, hf in hf_names.items():
        a = lora["layers"].get(f"{t}_a")
        if a is None:
            continue
        a, b = np.asarray(a), np.asarray(lora["layers"][f"{t}_b"])
        for i in range(spec.num_layers):
            prefix = f"base_model.model.model.layers.{i}.{mod_prefix[t]}.{hf}"
            state[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(a[i].T)  # [r, in]
            state[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(b[i].T)  # [out, r]
    for t, hf in (("moe_gate", "gate_proj"), ("moe_up", "up_proj"),
                  ("moe_down", "down_proj")):
        a = lora["layers"].get(f"{t}_a")
        if a is None:
            continue
        a, b = np.asarray(a), np.asarray(lora["layers"][f"{t}_b"])  # [NL, E, .., ..]
        for i in range(spec.num_layers):
            for e in range(spec.num_experts):
                prefix = f"base_model.model.model.layers.{i}.mlp.experts.{e}.{hf}"
                state[f"{prefix}.lora_A.weight"] = np.ascontiguousarray(a[i, e].T)
                state[f"{prefix}.lora_B.weight"] = np.ascontiguousarray(b[i, e].T)
    return state
