"""MoE ops: token-choice top-k routing + sorted ragged grouped-GEMM expert
compute.

TPU-native replacement for the reference's GroupedExperts/TokenChoiceTopKRouter
stack (reference: models/layers/moe.py:1-1244 — grouped_mm / DeepEP paths):
instead of torch grouped_mm or a capacity-based one-hot einsum, tokens are
sorted by expert id and pushed through ``jax.lax.ragged_dot`` (the XLA
grouped/ragged GEMM that tiles directly onto the MXU), then combined with
their routing weights on the way back. Static shapes throughout: the sort is
over T*topk elements, group_sizes is [E].

Router runs in float32 (reference keeps router/lm_head fp32 for stability).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RouterOutput(NamedTuple):
    expert_ids: jax.Array  # [T, K] int32
    weights: jax.Array  # [T, K] f32 combine weights
    load_balance_loss: jax.Array  # scalar aux (monitoring; optionally trained)
    router_entropy: jax.Array  # scalar monitoring stat


# Ambient expert-parallel mesh (set by parallel.mesh.build_mesh when the mesh
# has expert > 1): moe_mlp routes the supported subset of calls through the
# explicit shard_map all-to-all path (ops/moe_ep.py). Rationale: the GSPMD
# sort/take dispatch's BACKWARD transposes to a scatter-add whose sharding
# the partitioner cannot propagate across an expert axis — it replicates the
# activation cotangent ("Involuntary full rematerialization", VERDICT r3
# Weak #2). shard_map's explicit collectives sidestep the propagation
# entirely (reference analogue: distributed/expert_parallel.py DeepEP path).
_EP_MESH = None
_EP_TOKEN_AXES: tuple[str, ...] = ("expert",)


def set_ep_mesh(mesh, token_axes: tuple[str, ...] = ("expert",)) -> None:
    global _EP_MESH, _EP_TOKEN_AXES
    _EP_MESH = mesh
    _EP_TOKEN_AXES = token_axes


def _ep_supported(x, x_experts, w_gate, b_gate, b_up, b_down, lora,
                  forced_experts, activation_alpha, router_w, top_k) -> bool:
    """The shard_map a2a path covers the silu-gated no-bias family (qwen3-moe
    class). Everything else (gpt-oss biases/clamped-GLU, LatentMoE split
    routing, LoRA experts, router replay) stays on the GSPMD path."""
    if (x_experts is not None and x_experts is not x):
        return False
    if w_gate is None or activation_alpha > 0 or lora is not None:
        return False
    if b_gate is not None or b_up is not None or b_down is not None:
        return False
    if forced_experts is not None:
        return False
    mesh = _EP_MESH
    e = router_w.shape[1]
    if e % mesh.shape["expert"] != 0:
        return False
    shard_n = 1
    for a in _EP_TOKEN_AXES:
        shard_n *= mesh.shape[a]
    return x.shape[0] % shard_n == 0


def route_topk(
    x: jax.Array,  # [T, D] (any dtype; router math in f32)
    router_w: jax.Array,  # [D, E]
    top_k: int,
    norm_topk_prob: bool = True,
    router_b: jax.Array | None = None,  # [E]
    softmax_topk: bool = False,  # gpt-oss: softmax over the top-k LOGITS
    sigmoid_noaux: bool = False,  # glm/deepseek-v3: sigmoid + correction bias
    correction_bias: jax.Array | None = None,  # [E] selection-only bias
    n_group: int = 1,
    topk_group: int = 1,
    routed_scaling: float = 1.0,
    forced_experts: jax.Array | None = None,  # [T, K] int32; row of -1 = own routing
) -> RouterOutput:
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))  # [T, E]
    if router_b is not None:
        logits = logits + router_b.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    if sigmoid_noaux:
        # glm4_moe / DeepSeek-V3 noaux-tc routing (reference:
        # glm_moe_dsa router): sigmoid scores; SELECTION adds a correction
        # bias and (optionally) restricts to the best expert groups; combine
        # WEIGHTS come from the raw sigmoid scores, normalized, x scaling
        scores = jax.nn.sigmoid(logits)
        probs = scores / jnp.maximum(scores.sum(-1, keepdims=True), 1e-9)  # stats only
        choice = scores + (correction_bias.astype(jnp.float32)
                           if correction_bias is not None else 0.0)
        e = router_w.shape[1]
        if n_group > 1:
            t = choice.shape[0]
            grouped = choice.reshape(t, n_group, e // n_group)
            group_scores = jax.lax.top_k(grouped, min(2, e // n_group))[0].sum(-1)
            _, keep_groups = jax.lax.top_k(group_scores, topk_group)  # [T, G']
            group_mask = jnp.zeros((t, n_group), bool).at[
                jnp.arange(t)[:, None], keep_groups].set(True)
            choice = jnp.where(
                jnp.repeat(group_mask, e // n_group, axis=1), choice, -jnp.inf)
        _, expert_ids = jax.lax.top_k(choice, top_k)  # [T, K]
        weights = jnp.take_along_axis(scores, expert_ids, axis=-1)
        if norm_topk_prob:
            weights = weights / (jnp.sum(weights, axis=-1, keepdims=True) + 1e-20)
        weights = weights * routed_scaling
    elif softmax_topk:
        # gpt-oss routing (reference: gpt_oss GptOssTopKRouter): top-k on the
        # raw logits, softmax over just those k values
        top_vals, expert_ids = jax.lax.top_k(logits, top_k)  # [T, K]
        weights = jax.nn.softmax(top_vals, axis=-1)
    else:
        weights, expert_ids = jax.lax.top_k(probs, top_k)  # [T, K]
        if norm_topk_prob:
            weights = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    if forced_experts is not None:
        # router replay (reference: models/layers/moe.py routed_experts):
        # the SELECTION comes from the sampler's recorded routing; combine
        # weights are recomputed from THIS router's scores at those experts.
        # Tokens with no recording (first slot < 0, e.g. prompt context)
        # keep their own routing.
        valid = forced_experts[:, :1] >= 0  # [T, 1]
        f_ids = jnp.maximum(forced_experts, 0)
        if sigmoid_noaux:
            f_w = jnp.take_along_axis(scores, f_ids, axis=-1)
            if norm_topk_prob:
                f_w = f_w / (jnp.sum(f_w, axis=-1, keepdims=True) + 1e-20)
            f_w = f_w * routed_scaling
        elif softmax_topk:
            f_w = jax.nn.softmax(jnp.take_along_axis(logits, f_ids, axis=-1), axis=-1)
        else:
            f_w = jnp.take_along_axis(probs, f_ids, axis=-1)
            if norm_topk_prob:
                f_w = f_w / jnp.maximum(jnp.sum(f_w, axis=-1, keepdims=True), 1e-9)
        expert_ids = jnp.where(valid, f_ids, expert_ids).astype(jnp.int32)
        weights = jnp.where(valid, f_w, weights)
    e = router_w.shape[1]
    # Switch-style load-balance aux: E * sum_e f_e * p_e
    counts = jnp.zeros((e,), jnp.float32).at[expert_ids.reshape(-1)].add(1.0)
    frac_tokens = counts / jnp.maximum(jnp.sum(counts), 1.0)
    frac_probs = jnp.mean(probs, axis=0)
    lb = e * jnp.sum(frac_tokens * frac_probs)
    entropy = -jnp.mean(jnp.sum(probs * jnp.log(probs + 1e-9), axis=-1))
    return RouterOutput(expert_ids.astype(jnp.int32), weights, lb, entropy)


def moe_mlp(
    x: jax.Array,  # [T, D]
    router_w: jax.Array,  # [D, E]
    w_gate: jax.Array | None,  # [E, D, M]; None => non-gated relu2 experts
    w_up: jax.Array,  # [E, D, M]
    w_down: jax.Array,  # [E, M, D]
    top_k: int,
    norm_topk_prob: bool = True,
    *,
    router_b: jax.Array | None = None,  # [E]
    b_gate: jax.Array | None = None,  # [E, M] per-expert biases (gpt-oss)
    b_up: jax.Array | None = None,  # [E, M]
    b_down: jax.Array | None = None,  # [E, D]
    softmax_topk: bool = False,
    activation_alpha: float = 0.0,  # >0: gpt-oss clamped-GLU
    activation_limit: float = 0.0,
    sigmoid_noaux: bool = False,
    correction_bias: jax.Array | None = None,
    n_group: int = 1,
    topk_group: int = 1,
    routed_scaling: float = 1.0,
    x_experts: jax.Array | None = None,  # [T, D'] expert input when it differs
    # from the routing input (NemotronH LatentMoE: route at model dim,
    # compute at latent dim)
    forced_experts: jax.Array | None = None,  # [T, K] router replay (-1 row = own)
    lora: dict | None = None,  # per-expert adapters {"moe_up_a": [E, D, r],
    # "moe_up_b": [E, r, M], ...} (models/lora moe_* targets) — each present
    # pair adds two ragged_dots on the same sorted groups
    lora_scale: float = 1.0,
    allow_ep: bool = True,  # False: never take the ambient shard_map EP path.
    # The serving engine passes False — in a colocated process the trainer's
    # build_mesh registers a process-global EP mesh, and a serving-side trace
    # (own jit, unsharded or TP-sharded params) must not be rerouted through
    # shard_map over the TRAINER's mesh (ADVICE r4 #2).
) -> tuple[jax.Array, RouterOutput]:
    """Returns (output [T, D], router stats). Sorted ragged dispatch:

      1. route: top-k experts per token
      2. sort the T*K (token, expert) pairs by expert id
      3. ragged grouped GEMMs over contiguous expert groups (MXU)
      4. unsort + weighted combine
    """
    if allow_ep and _EP_MESH is not None and _ep_supported(
            x, x_experts, w_gate, b_gate, b_up, b_down, lora, forced_experts,
            activation_alpha, router_w, top_k):
        from prime_rl_tpu.ops.moe_ep import moe_mlp_ep

        out, routing, _dropped = moe_mlp_ep(
            x, router_w, w_gate, w_up, w_down, top_k, norm_topk_prob,
            mesh=_EP_MESH,
            capacity_factor=float(_EP_MESH.shape["expert"]),  # exact: no drops
            token_axes=_EP_TOKEN_AXES,
            router_b=router_b, softmax_topk=softmax_topk,
            sigmoid_noaux=sigmoid_noaux, correction_bias=correction_bias,
            n_group=n_group, topk_group=topk_group,
            routed_scaling=routed_scaling,
        )
        return out, routing
    if x_experts is None:
        x_experts = x
    t, d = x_experts.shape
    e = router_w.shape[1]
    routing = route_topk(x, router_w, top_k, norm_topk_prob,
                         router_b=router_b, softmax_topk=softmax_topk,
                         sigmoid_noaux=sigmoid_noaux, correction_bias=correction_bias,
                         n_group=n_group, topk_group=topk_group,
                         routed_scaling=routed_scaling,
                         forced_experts=forced_experts)

    flat_experts = routing.expert_ids.reshape(-1)  # [T*K]
    order = jnp.argsort(flat_experts)  # stable ascending by expert
    token_idx = order // top_k  # source token of each sorted slot
    group_sizes = jnp.zeros((e,), jnp.int32).at[flat_experts].add(1)

    sorted_experts = jnp.take(flat_experts, order)  # expert id of each sorted slot
    xs = jnp.take(x_experts, token_idx, axis=0)  # [T*K, D] sorted by expert

    def _lora_delta(inp, name):
        """Per-expert LoRA delta via two extra ragged_dots on the SAME sorted
        groups (the grouped-GEMM analogue of x·A·B)."""
        if lora is None or f"{name}_a" not in lora:
            return None
        a = lora[f"{name}_a"].astype(inp.dtype)
        b = lora[f"{name}_b"].astype(inp.dtype)
        mid = jax.lax.ragged_dot(inp, a, group_sizes, preferred_element_type=jnp.float32)
        return lora_scale * jax.lax.ragged_dot(
            mid.astype(inp.dtype), b, group_sizes, preferred_element_type=jnp.float32)

    up = jax.lax.ragged_dot(xs, w_up, group_sizes, preferred_element_type=jnp.float32)
    d_up = _lora_delta(xs, "moe_up")
    if d_up is not None:
        up = up + d_up
    if b_up is not None:
        up = up + jnp.take(b_up.astype(jnp.float32), sorted_experts, axis=0)
    if w_gate is None:
        # NemotronH LatentMoE experts: non-gated relu^2 (reference:
        # models/layers/moe.py NonGatedGroupedExperts)
        h = jnp.square(jax.nn.relu(up)).astype(x.dtype)
    else:
        gate = jax.lax.ragged_dot(xs, w_gate, group_sizes, preferred_element_type=jnp.float32)
        d_gate = _lora_delta(xs, "moe_gate")
        if d_gate is not None:
            gate = gate + d_gate
        if b_gate is not None:
            gate = gate + jnp.take(b_gate.astype(jnp.float32), sorted_experts, axis=0)
        if activation_alpha > 0:
            from prime_rl_tpu.ops.layers import clamped_glu

            h = clamped_glu(gate, up, activation_alpha, activation_limit).astype(x.dtype)
        else:
            h = (jax.nn.silu(gate) * up).astype(x.dtype)  # [T*K, M]
    out_sorted = jax.lax.ragged_dot(h, w_down, group_sizes, preferred_element_type=jnp.float32)
    d_down = _lora_delta(h, "moe_down")
    if d_down is not None:
        out_sorted = out_sorted + d_down
    if b_down is not None:
        out_sorted = out_sorted + jnp.take(b_down.astype(jnp.float32), sorted_experts, axis=0)

    w_flat = jnp.take(routing.weights.reshape(-1), order)  # combine weight per sorted slot
    contrib = out_sorted * w_flat[:, None]  # [T*K, D] f32
    out = jnp.zeros((t, d), jnp.float32).at[token_idx].add(contrib)
    return out.astype(x.dtype), routing
