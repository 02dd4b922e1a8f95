"""GLM-4.5 MoE family (glm4_moe): GQA attention with partial rotary +
optional qk-norm, DeepSeek-V3-style noaux-tc routing (sigmoid scores,
selection-only correction bias, group-limited top-k, routed scaling),
always-on shared experts, and dense MLPs for the first k layers.

Behavior parity target: reference trainer/models/glm_moe_dsa/ (1,031 LoC
torch — the GLM-4.5/5 MoE block; its DSA sparse-attention kernel is a
separate op) and the public HF Glm4Moe implementation. Same functional-
pytree design as the other families: the dense-first layers live under
``dense_layers`` (python-unrolled, k is 1-3), the MoE layers under
``layers`` (scanned), and routed experts ride the sorted ragged-GEMM MoE op.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.models.qwen3 import rope_setup
from prime_rl_tpu.ops.layers import rms_norm, swiglu
from prime_rl_tpu.ops.moe import moe_mlp


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    from dataclasses import replace

    from prime_rl_tpu.models.qwen3_moe import spec_dense_view

    k_dense = spec.first_k_dense_replace
    n_moe = spec.num_layers - k_dense
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    # attn/embed/norms via the dense init, then split layer stacks
    base = qwen3.init_params(spec_dense_view(spec), key, dtype=dtype)
    all_layers = base["layers"]

    def take(stack, sl):
        return jax.tree.map(lambda x: x[sl], stack)

    dense_layers = take(all_layers, slice(0, k_dense))
    moe_layers = dict(take(all_layers, slice(k_dense, spec.num_layers)))
    for f in ("gate", "up", "down"):
        moe_layers.pop(f, None)

    d, e, m = spec.hidden_size, spec.num_experts, spec.moe_intermediate_size
    ks = jax.random.split(jax.random.fold_in(key, 13), 7)
    moe_layers["router"] = w(ks[0], n_moe, d, e)
    moe_layers["router_correction_bias"] = jnp.zeros((n_moe, e), jnp.float32)
    moe_layers["expert_gate"] = w(ks[1], n_moe, e, d, m)
    moe_layers["expert_up"] = w(ks[2], n_moe, e, d, m)
    moe_layers["expert_down"] = w(ks[3], n_moe, e, m, d)
    ms = spec.shared_expert_size or m * spec.n_shared_experts
    if ms:
        moe_layers["shared_gate"] = w(ks[4], n_moe, d, ms)
        moe_layers["shared_up"] = w(ks[5], n_moe, d, ms)
        moe_layers["shared_down"] = w(ks[6], n_moe, ms, d)

    base["layers"] = moe_layers
    if k_dense:
        base["dense_layers"] = dense_layers
    return base


def glm_moe_block(h: jax.Array, lp: dict, spec: ModelSpec, compute_dtype,
                  lora_scale: float = 1.0):
    """Routed experts + shared experts, post-attention. Returns (h, aux).
    A reserved ``_forced`` entry ([B*L, K] int32, -1 = own routing) replays
    the sampler's expert selection (router-replay; reference
    routed_experts forward contract). A reserved ``_lora`` sub-dict carries
    adapters — moe_* targets apply per expert inside moe_mlp."""
    b, l, d = h.shape
    cast = {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2 and "router" not in k
                and not k.startswith("_") else v)
            for k, v in lp.items()}
    x = rms_norm(h, cast["mlp_norm"], spec.rms_eps)
    out, routing = moe_mlp(
        x.reshape(b * l, d),
        lp["router"],  # router math stays f32
        cast["expert_gate"], cast["expert_up"], cast["expert_down"],
        spec.num_experts_per_tok, spec.norm_topk_prob,
        sigmoid_noaux=spec.router_sigmoid,
        correction_bias=lp.get("router_correction_bias"),
        n_group=spec.n_group, topk_group=spec.topk_group,
        routed_scaling=spec.routed_scaling_factor,
        forced_experts=lp.get("_forced"),
        lora=lp.get("_lora"), lora_scale=lora_scale,
    )
    out = out.reshape(b, l, d)
    if "shared_gate" in cast:
        out = out + jnp.dot(
            swiglu(jnp.dot(x, cast["shared_gate"]), jnp.dot(x, cast["shared_up"])),
            cast["shared_down"])
    if spec.sandwich_norm:
        out = rms_norm(out, cast["post_mlp_norm"], spec.rms_eps)
    return h + out, routing.load_balance_loss


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
    routed_experts: jax.Array | None = None,  # [B, L, NL_moe, K]; -1 = own
):
    inv_freq, rope_scaling = rope_setup(spec)
    # laguna: sliding layers run their own rope base (reference
    # configuration_laguna.py:124-127 — full 500k / sliding 10k)
    if spec.rope_theta_local:
        from prime_rl_tpu.ops.layers import rope_frequencies

        rot_dim = int(spec.head_dim * spec.partial_rotary_factor)
        inv_freq_local = rope_frequencies(rot_dim, spec.rope_theta_local)
    else:
        inv_freq_local = inv_freq
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)
    win_list = qwen3.layer_windows_list(spec)

    def attn(h, lp, window):
        # LoRA rides a reserved "_lora" sub-dict inside the layer pytree so
        # the scan regrouping applies to it for free (attention projections
        # here; moe_* expert targets apply inside glm_moe_block)
        ll = lp.get("_lora")
        cast = {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2 else v)
                for k, v in lp.items() if not k.startswith("_")}
        freqs = inv_freq_local if window else inv_freq
        return qwen3._attn_block(h, cast, spec, segment_ids, position_ids, freqs,
                                 attn_impl, block_q, block_kv, mesh, ll, lora_scale,
                                 cp_style, window, rope_scaling)

    def dense_block(h, lp, window):
        h = attn(h, lp, window)
        lp = {k: v for k, v in lp.items() if k != "_lora"}
        cast = {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2 else v)
                for k, v in lp.items()}
        x = rms_norm(h, cast["mlp_norm"], spec.rms_eps)
        out = jnp.dot(swiglu(jnp.dot(x, cast["gate"]), jnp.dot(x, cast["up"])),
                      cast["down"])
        if spec.sandwich_norm:
            out = rms_norm(out, cast["post_mlp_norm"], spec.rms_eps)
        return h + out

    def moe_block(carry, lp, window):
        h, aux = carry
        h = attn(h, lp, window)
        h, lb = glm_moe_block(h, lp, spec, compute_dtype, lora_scale=lora_scale)
        return h, aux + lb

    def wrap(fn):
        if remat == "full":
            return jax.checkpoint(fn, prevent_cse=False)
        if remat == "save_attn":
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.save_only_these_names("attn_out", "attn_lse"),
                prevent_cse=False)
        if remat == "selective":
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                prevent_cse=False)
        return fn

    # first-k dense layers: python-unrolled (k is tiny), static windows
    k_dense = spec.first_k_dense_replace
    if lora is not None:
        ll = lora["layers"]
        params = dict(params)
        if k_dense and "dense_layers" in params:
            params["dense_layers"] = dict(
                params["dense_layers"],
                _lora=jax.tree.map(lambda x: x[:k_dense], ll))
        params["layers"] = dict(params["layers"],
                                _lora=jax.tree.map(lambda x: x[k_dense:], ll))
    if routed_experts is not None:
        # router replay: [B, L, NL_moe, K] -> scan-major [NL_moe, B*L, K],
        # riding the layer pytree so the regroup/remainder machinery applies
        b_, l_ = routed_experts.shape[:2]
        forced = jnp.transpose(routed_experts, (2, 0, 1, 3)).reshape(
            routed_experts.shape[2], b_ * l_, spec.num_experts_per_tok)
        params = dict(params)
        params["layers"] = dict(params["layers"], _forced=forced)
    for i in range(k_dense):
        h = wrap(functools.partial(dense_block, window=win_list[i]))(
            h, jax.tree.map(lambda x: x[i], params["dense_layers"]))

    # MoE layers: scanned; window alternation (afmoe/laguna) is periodic, so
    # scan super-blocks of one period with the per-layer window a static
    # python int inside (same trick as qwen3.forward)
    moe_wins = win_list[k_dense:]
    n_moe = len(moe_wins)
    # smallest p such that after python-unrolling the first n_moe % p layers
    # the tail repeats with period p (keeps scan compile O(period) even when
    # the dense-first offset breaks divisibility, e.g. 31 MoE layers, pat 4)
    period, rem = next(
        (p, n_moe % p) for p in range(1, n_moe + 1)
        if all(moe_wins[(n_moe % p) + i] == moe_wins[(n_moe % p) + i % p]
               for i in range(n_moe - (n_moe % p)))
    )
    carry = (h, jnp.float32(0.0))
    for i in range(rem):
        carry = wrap(functools.partial(moe_block, window=moe_wins[i]))(
            carry, jax.tree.map(lambda x: x[i], params["layers"]))
    tail = jax.tree.map(lambda x: x[rem:], params["layers"])
    blocks = [wrap(functools.partial(moe_block, window=wn))
              for wn in moe_wins[rem:rem + period]]
    if period == 1:
        (h, aux), _ = jax.lax.scan(lambda c, lp: (blocks[0](c, lp), None), carry, tail)
    else:
        layers_g = jax.tree.map(
            lambda x: x.reshape(((n_moe - rem) // period, period) + x.shape[1:]), tail)

        def super_block(c, lp_g):
            for i in range(period):
                c = blocks[i](c, jax.tree.map(lambda x: x[i], lp_g))
            return c, None

        (h, aux), _ = jax.lax.scan(super_block, carry, layers_g)
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect_aux else h


get_lm_head = qwen3.get_lm_head


# ---------------------------------------------------------------------------
# HF interchange (reference: glm_moe_dsa/converting_* role). Per-expert
# torch Linears ([out, in] -> transpose), router weight [E, D] -> [D, E],
# e_score_correction_bias buffer, shared_experts.* MLP.
# ---------------------------------------------------------------------------

def _attn_keys(spec: ModelSpec):
    keys = [
        ("attn_norm", "input_layernorm.weight", False),
        ("q", "self_attn.q_proj.weight", True),
        ("k", "self_attn.k_proj.weight", True),
        ("v", "self_attn.v_proj.weight", True),
        ("o", "self_attn.o_proj.weight", True),
        ("mlp_norm", "post_attention_layernorm.weight", False),
    ]
    if spec.qk_norm:
        keys += [("q_norm", "self_attn.q_norm.weight", False),
                 ("k_norm", "self_attn.k_norm.weight", False)]
    if spec.attn_bias:
        keys += [("q_bias", "self_attn.q_proj.bias", False),
                 ("k_bias", "self_attn.k_proj.bias", False),
                 ("v_bias", "self_attn.v_proj.bias", False)]
    return keys


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32,
                              attn_keys=None) -> Params:
    """``attn_keys`` lets MLA-attention families (mla_moe) reuse this
    converter's shared trunk (embed/norm/MoE/dense-MLP) with their own
    attention key table."""
    def get(key, tr):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    k_dense = spec.first_k_dense_replace
    nl, e = spec.num_layers, spec.num_experts
    akeys = attn_keys or _attn_keys(spec)

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
        lp["router"] = get(f"model.layers.{i}.mlp.gate.weight", True)
        lp["router_correction_bias"] = get(
            f"model.layers.{i}.mlp.gate.e_score_correction_bias", False)
        for ours, theirs in (("expert_gate", "gate_proj"), ("expert_up", "up_proj"),
                             ("expert_down", "down_proj")):
            lp[ours] = np.stack([
                get(f"model.layers.{i}.mlp.experts.{j}.{theirs}.weight", True)
                for j in range(e)
            ])
        if spec.n_shared_experts:
            for ours, theirs in (("shared_gate", "gate_proj"), ("shared_up", "up_proj"),
                                 ("shared_down", "down_proj")):
                lp[ours] = get(f"model.layers.{i}.mlp.shared_experts.{theirs}.weight", True)
        for k, v in lp.items():
            moe_layers.setdefault(k, []).append(v)

    params: Params = {
        "embed": get("model.embed_tokens.weight", False),
        "dense_layers": {k: np.stack(v) for k, v in dense_layers.items()},
        "layers": {k: np.stack(v) for k, v in moe_layers.items()},
        "final_norm": get("model.norm.weight", False),
    }
    if k_dense == 0:
        params.pop("dense_layers")
    if not spec.tie_embeddings:
        params["lm_head"] = get("lm_head.weight", True)
    return jax.tree.map(jnp.asarray, params)


def params_to_hf_state_dict(params: Params, spec: ModelSpec, attn_keys=None) -> dict:
    state: dict[str, np.ndarray] = {}
    state["model.embed_tokens.weight"] = np.asarray(params["embed"])
    state["model.norm.weight"] = np.asarray(params["final_norm"])
    k_dense = spec.first_k_dense_replace
    akeys = attn_keys or _attn_keys(spec)

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
        state[f"model.layers.{i}.mlp.gate.weight"] = np.asarray(lp["router"]).T
        state[f"model.layers.{i}.mlp.gate.e_score_correction_bias"] = np.asarray(
            lp["router_correction_bias"])
        for ours, theirs in (("expert_gate", "gate_proj"), ("expert_up", "up_proj"),
                             ("expert_down", "down_proj")):
            stacked = np.asarray(lp[ours])
            for j in range(spec.num_experts):
                state[f"model.layers.{i}.mlp.experts.{j}.{theirs}.weight"] = stacked[j].T
        if spec.n_shared_experts:
            for ours, theirs in (("shared_gate", "gate_proj"), ("shared_up", "up_proj"),
                                 ("shared_down", "down_proj")):
                state[f"model.layers.{i}.mlp.shared_experts.{theirs}.weight"] = (
                    np.asarray(lp[ours]).T)
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return state


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("glm4_moe", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
