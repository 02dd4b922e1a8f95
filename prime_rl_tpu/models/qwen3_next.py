"""Qwen3-Next / Qwen3.5 family (qwen3_next): hybrid GatedDeltaNet linear
attention + gated full attention, MoE with sigmoid-gated shared expert.

Behavior parity target: reference trainer/models/qwen3_5_moe/
modeling_qwen3_5_moe.py (GatedDeltaNet :86-232, gated attention :236-330,
MoE block) and the public HF Qwen3Next implementation (the parity test runs
against transformers' Qwen3NextForCausalLM).

Architecture notes:
- layer pattern (spec.gdn_pattern): L = GatedDeltaNet (causal conv + chunked
  gated delta rule, ops/gated_delta.py), A = full attention whose q_proj also
  produces a per-channel sigmoid gate (spec.attn_gate="sigmoid").
- every layer runs the MoE MLP (softmax-topk routing) plus a shared expert
  scaled by a scalar sigmoid gate (HF Qwen3NextSparseMoeBlock).
- HF norms are ZERO-CENTERED ((1 + w) scaling, Qwen3NextRMSNorm); conversion
  folds the +1 into our standard RMSNorm weights so the forward is unchanged
  (from_hf adds 1, to_hf subtracts 1). The GDN-internal gated norm
  (Qwen3NextRMSNormGated) is plain w and converts as-is.

TPU design: two stacked type-stacks (``lin_layers`` / ``attn_layers``); the
periodic pattern (default LLLA) scans super-blocks of one period, indexing
each stack — O(period) compile like the other scanned families. Aperiodic
patterns fall back to a python unroll (nemotron_h style).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.models.qwen3 import rope_setup
from prime_rl_tpu.ops.gated_delta import chunk_gated_delta_rule
from prime_rl_tpu.ops.layers import rms_norm, swiglu
from prime_rl_tpu.ops.mamba import causal_conv1d
from prime_rl_tpu.ops.moe import moe_mlp


def _pattern(spec: ModelSpec) -> str:
    pat = spec.gdn_pattern
    if len(pat) != spec.num_layers:
        raise ValueError(f"gdn_pattern length {len(pat)} != num_layers {spec.num_layers}")
    return pat


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    pat = _pattern(spec)
    n_lin, n_attn = pat.count("L"), pat.count("A")
    d, e, m = spec.hidden_size, spec.num_experts, spec.moe_intermediate_size
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    ks = iter(jax.random.split(key, 32))

    def moe_fields(n):
        f = {
            "mlp_norm": jnp.ones((n, d), dtype),
            "router": w(next(ks), n, d, e),
            "expert_gate": w(next(ks), n, e, d, m),
            "expert_up": w(next(ks), n, e, d, m),
            "expert_down": w(next(ks), n, e, m, d),
            "shared_gate": w(next(ks), n, d, spec.shared_expert_size),
            "shared_up": w(next(ks), n, d, spec.shared_expert_size),
            "shared_down": w(next(ks), n, spec.shared_expert_size, d),
        }
        if spec.shared_expert_gate:
            f["shared_expert_gate_w"] = w(next(ks), n, d, 1)
        return f

    params: Params = {
        "embed": w(next(ks), spec.vocab_size, d),
        "final_norm": jnp.ones((d,), dtype),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = w(next(ks), d, spec.vocab_size)

    if n_lin:
        kd, vd, hv = spec.gdn_key_dim, spec.gdn_value_dim, spec.gdn_v_heads
        dt = np.exp(np.random.RandomState(0).uniform(
            np.log(0.001), np.log(0.1), size=(n_lin, hv))).astype(np.float32)
        params["lin_layers"] = {
            "attn_norm": jnp.ones((n_lin, d), dtype),
            "in_q": w(next(ks), n_lin, d, kd),
            "in_k": w(next(ks), n_lin, d, kd),
            "in_v": w(next(ks), n_lin, d, vd),
            "in_z": w(next(ks), n_lin, d, vd),
            "in_b": w(next(ks), n_lin, d, hv),
            "in_a": w(next(ks), n_lin, d, hv),
            "conv_w": w(next(ks), n_lin, spec.gdn_conv_dim, spec.gdn_conv_kernel),
            "dt_bias": jnp.asarray(dt + np.log(-np.expm1(-dt))),
            "A_log": jnp.log(jnp.linspace(1.0, 16.0, hv, dtype=jnp.float32))[None, :]
            * jnp.ones((n_lin, 1), jnp.float32),
            "gdn_norm": jnp.ones((n_lin, spec.gdn_v_dim), dtype),
            "out_proj": w(next(ks), n_lin, vd, d),
            **moe_fields(n_lin),
        }
    if n_attn:
        params["attn_layers"] = {
            "attn_norm": jnp.ones((n_attn, d), dtype),
            "q": w(next(ks), n_attn, d, spec.q_dim),
            "attn_gate": w(next(ks), n_attn, d, spec.q_dim),
            "k": w(next(ks), n_attn, d, spec.kv_dim),
            "v": w(next(ks), n_attn, d, spec.kv_dim),
            "o": w(next(ks), n_attn, spec.q_dim, d),
            "q_norm": jnp.ones((n_attn, spec.head_dim), dtype),
            "k_norm": jnp.ones((n_attn, spec.head_dim), dtype),
            **moe_fields(n_attn),
        }
    return params


def gdn_mixer(h, lp, spec: ModelSpec, segment_ids, compute_dtype):
    """GatedDeltaNet block (reference modeling_qwen3_5_moe.py:148-232):
    conv(q|k|v) -> silu -> chunked gated delta rule -> gated RMSNorm -> out."""
    b, s, d = h.shape
    hk, hv = spec.gdn_k_heads, spec.gdn_v_heads
    dk, dv = spec.gdn_k_dim, spec.gdn_v_dim
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)
    qkv = jnp.concatenate(
        [jnp.dot(x, lp["in_q"]), jnp.dot(x, lp["in_k"]), jnp.dot(x, lp["in_v"])],
        axis=-1)
    qkv = jax.nn.silu(causal_conv1d(qkv, lp["conv_w"], None, segment_ids))
    kd, vd = spec.gdn_key_dim, spec.gdn_value_dim
    q, k, v = jnp.split(qkv, [kd, 2 * kd], axis=-1)
    q = q.reshape(b, s, hk, dk)
    k = k.reshape(b, s, hk, dk)
    v = v.reshape(b, s, hv, dv)
    beta = jax.nn.sigmoid(jnp.dot(x, lp["in_b"]))
    a = jnp.dot(x, lp["in_a"]).astype(jnp.float32)
    g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
        a + lp["dt_bias"].astype(jnp.float32))
    r = hv // hk
    if r > 1:
        q = jnp.repeat(q, r, axis=2)
        k = jnp.repeat(k, r, axis=2)
    core, _ = chunk_gated_delta_rule(q, k, v, g, beta, segment_ids=segment_ids)
    # gated RMSNorm (Qwen3NextRMSNormGated: plain w, then * silu(z))
    z = jnp.dot(x, lp["in_z"]).reshape(b, s, hv, dv)
    core = rms_norm(core.astype(compute_dtype), lp["gdn_norm"], spec.rms_eps)
    core = core * jax.nn.silu(z.astype(jnp.float32)).astype(core.dtype)
    out = jnp.dot(core.reshape(b, s, vd), lp["out_proj"])
    return h + out


def moe_block(h, lp, spec: ModelSpec, ll=None, lora_scale: float = 1.0):
    """MoE MLP + sigmoid-gated shared expert (HF Qwen3NextSparseMoeBlock).
    ``_forced`` replays the sampler's routing (router replay); ``ll``
    carries adapters (moe_* expert targets apply inside moe_mlp)."""
    b, s, d = h.shape
    x = rms_norm(h, lp["mlp_norm"], spec.rms_eps)
    out, routing = moe_mlp(
        x.reshape(b * s, d), lp["router"],
        lp["expert_gate"], lp["expert_up"], lp["expert_down"],
        spec.num_experts_per_tok, spec.norm_topk_prob,
        forced_experts=lp.get("_forced"),
        lora=ll, lora_scale=lora_scale,
    )
    out = out.reshape(b, s, d)
    shared = jnp.dot(swiglu(jnp.dot(x, lp["shared_gate"]), jnp.dot(x, lp["shared_up"])),
                     lp["shared_down"])
    if spec.shared_expert_gate:
        shared = jax.nn.sigmoid(jnp.dot(x, lp["shared_expert_gate_w"])) * shared
    return h + out + shared, routing.load_balance_loss


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
    mm: dict | None = None,
    routed_experts: jax.Array | None = None,  # [B, L, NL, K]; -1 = own
):
    """``mm``: VLM inputs (qwen3_next_vl — reference qwen3_5 pairs this
    hybrid trunk with the Qwen3-VL vision tower; same dict contract as
    models/qwen3_vl.forward). GDN layers are position-free, so mRoPE only
    affects the full-attention layers."""
    pat = _pattern(spec)
    inv_freq, rope_scaling = rope_setup(spec)
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)

    img_mask = img_slot = ds_feats = None
    if mm is not None:
        from prime_rl_tpu.models.qwen3_vl import _mrope_positions
        from prime_rl_tpu.models.vision import vision_forward

        merged, ds_feats = vision_forward(
            params["vision"], spec.vision,
            mm["patches"], mm["vis_seg_ids"], mm["vis_pos_idx"],
            mm["vis_pos_w"], mm["vis_rope_coords"], compute_dtype=compute_dtype,
        )
        img_slot = jnp.maximum(mm["img_slot"], 0)
        img_mask = (mm["img_slot"] >= 0)[..., None]
        gathered = jnp.take(merged.astype(compute_dtype), img_slot, axis=0)
        h = jnp.where(img_mask, gathered, h)
        position_ids = _mrope_positions(spec, mm["mm_position_ids"])

    if lora is not None:
        # LoRA: select each stack's adapter rows from the full [nl, ...]
        # stacks (attention projections on "A" layers; moe_* expert targets
        # on every layer); ride a reserved "_lora" sub-dict so the
        # regroup/scan machinery applies unchanged
        import numpy as _np

        params = dict(params)
        for char, stack in (("L", "lin_layers"), ("A", "attn_layers")):
            sidx = jnp.asarray(_np.nonzero([c == char for c in pat])[0])
            if sidx.size and stack in params:
                params[stack] = dict(
                    params[stack],
                    _lora=jax.tree.map(lambda x, i=sidx: x[i], lora["layers"]))
    if routed_experts is not None:
        # router replay: every layer runs the MoE MLP, so the wire carries
        # NL rows; split them per type-stack by layer index
        import numpy as _np

        b_, l_ = routed_experts.shape[:2]
        forced = jnp.transpose(routed_experts, (2, 0, 1, 3)).reshape(
            spec.num_layers, b_ * l_, spec.num_experts_per_tok)
        params = dict(params)
        for char, stack in (("L", "lin_layers"), ("A", "attn_layers")):
            idx = _np.nonzero([c == char for c in pat])[0]
            if len(idx) and stack in params:
                params[stack] = dict(params[stack],
                                     _forced=forced[jnp.asarray(idx)])

    def cast(lp):
        # "_forced" (int replay ids) passes through uncast; "_lora" is
        # extracted separately by attn_block
        return {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2
                    and "router" not in k and not k.startswith("_") else v)
                for k, v in lp.items() if k != "_lora"}

    def lin_block(carry, lp):
        h, aux = carry
        ll = lp.get("_lora")
        lp = cast(lp)
        h = gdn_mixer(h, lp, spec, segment_ids, compute_dtype)
        h, lb = moe_block(h, lp, spec, ll=ll, lora_scale=lora_scale)
        return h, aux + lb

    def attn_block(carry, lp):
        h, aux = carry
        ll = lp.get("_lora")
        lp = cast(lp)
        h = qwen3._attn_block(h, lp, spec, segment_ids, position_ids, inv_freq,
                              attn_impl, block_q, block_kv, mesh, ll, lora_scale,
                              cp_style, 0, rope_scaling)
        h, lb = moe_block(h, lp, spec, ll=ll, lora_scale=lora_scale)
        return h, aux + lb

    def wrap(fn):
        if remat == "full":
            return jax.checkpoint(fn, prevent_cse=False)
        if remat in ("save_attn", "offload_attn"):
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.save_only_these_names("attn_out", "attn_lse"),
                prevent_cse=False)
        if remat == "selective":
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                prevent_cse=False)
        return fn

    lin_b, attn_b = wrap(lin_block), wrap(attn_block)
    nl = spec.num_layers
    carry = (h, jnp.float32(0.0))

    # smallest period that tiles the pattern from position 0
    period = next((p for p in range(1, nl + 1)
                   if nl % p == 0 and pat == pat[:p] * (nl // p)), nl)
    lin_per, attn_per = pat[:period].count("L"), pat[:period].count("A")
    groups = nl // period

    n_ds = ds_feats.shape[0] if ds_feats is not None else 0
    if groups > 1 and n_ds == 0 and (lin_per or attn_per):
        def regroup(stack, per):
            return jax.tree.map(
                lambda x: x.reshape((groups, per) + x.shape[1:]), stack)

        lin_g = regroup(params.get("lin_layers", {}), lin_per) if lin_per else None
        attn_g = regroup(params.get("attn_layers", {}), attn_per) if attn_per else None

        def super_block(c, xs):
            lin_i, attn_i = xs
            li = ai = 0
            for ch in pat[:period]:
                if ch == "L":
                    c = lin_b(c, jax.tree.map(lambda x: x[li], lin_i))
                    li += 1
                else:
                    c = attn_b(c, jax.tree.map(lambda x: x[ai], attn_i))
                    ai += 1
            return c, None

        carry, _ = jax.lax.scan(super_block, carry, (lin_g, attn_g))
    else:
        li = ai = 0
        for i, ch in enumerate(pat):
            if ch == "L":
                carry = lin_b(carry, jax.tree.map(lambda x: x[li], params["lin_layers"]))
                li += 1
            else:
                carry = attn_b(carry, jax.tree.map(lambda x: x[ai], params["attn_layers"]))
                ai += 1
            if i < n_ds:
                # DeepStack: add the i-th visual feature map at image slots
                # (same contract as models/qwen3_vl.forward)
                inj = jnp.take(ds_feats[i].astype(compute_dtype), img_slot, axis=0)
                carry = (jnp.where(img_mask, carry[0] + inj, carry[0]), carry[1])

    h, aux = carry
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect_aux else h


get_lm_head = qwen3.get_lm_head


# ---------------------------------------------------------------------------
# HF interchange (HF Qwen3Next layout; the reference stores SEPARATED
# projections and converts the same interleavings — converting_qwen3_5.py
# role). torch Linear is [out, in] -> transpose; fused/interleaved layouts:
# - in_proj_qkvz rows group per KEY head: [dk q | dk k | r*dv v | r*dv z]
# - in_proj_ba rows group per key head: [r b | r a]   (r = Hv/Hk)
# - attention q_proj rows group per head: [hd query | hd gate]
# - Qwen3NextRMSNorm weights are zero-centered: ours = theirs + 1
# ---------------------------------------------------------------------------

_SHIFTED = ("attn_norm", "mlp_norm", "q_norm", "k_norm")


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    pat = _pattern(spec)
    hk, hv = spec.gdn_k_heads, spec.gdn_v_heads
    dk, dv = spec.gdn_k_dim, spec.gdn_v_dim
    r = hv // hk

    def get(key, tr=False):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    def moe_fields(i):
        lp = {
            "mlp_norm": get(f"model.layers.{i}.post_attention_layernorm.weight") + 1.0,
            "router": get(f"model.layers.{i}.mlp.gate.weight", True),
            "shared_gate": get(f"model.layers.{i}.mlp.shared_expert.gate_proj.weight", True),
            "shared_up": get(f"model.layers.{i}.mlp.shared_expert.up_proj.weight", True),
            "shared_down": get(f"model.layers.{i}.mlp.shared_expert.down_proj.weight", True),
        }
        for ours, theirs in (("expert_gate", "gate_proj"), ("expert_up", "up_proj"),
                             ("expert_down", "down_proj")):
            lp[ours] = np.stack([
                get(f"model.layers.{i}.mlp.experts.{j}.{theirs}.weight", True)
                for j in range(spec.num_experts)
            ])
        if spec.shared_expert_gate:
            lp["shared_expert_gate_w"] = get(
                f"model.layers.{i}.mlp.shared_expert_gate.weight", True)
        return lp

    lin: dict[str, list] = {}
    attn: dict[str, list] = {}
    for i, ch in enumerate(pat):
        p = f"model.layers.{i}"
        if ch == "L":
            qkvz = get(f"{p}.linear_attn.in_proj_qkvz.weight")  # [2kd+2vd, d]
            qkvz = qkvz.reshape(hk, 2 * dk + 2 * r * dv, -1)
            d = qkvz.shape[-1]
            lp = {
                "attn_norm": get(f"{p}.input_layernorm.weight") + 1.0,
                "in_q": qkvz[:, :dk].reshape(hk * dk, d).T,
                "in_k": qkvz[:, dk:2 * dk].reshape(hk * dk, d).T,
                "in_v": qkvz[:, 2 * dk:2 * dk + r * dv].reshape(hv * dv, d).T,
                "in_z": qkvz[:, 2 * dk + r * dv:].reshape(hv * dv, d).T,
                "conv_w": get(f"{p}.linear_attn.conv1d.weight")[:, 0, :],
                "dt_bias": get(f"{p}.linear_attn.dt_bias"),
                "A_log": get(f"{p}.linear_attn.A_log"),
                "gdn_norm": get(f"{p}.linear_attn.norm.weight"),
                "out_proj": get(f"{p}.linear_attn.out_proj.weight", True),
            }
            ba = get(f"{p}.linear_attn.in_proj_ba.weight").reshape(hk, 2 * r, -1)
            lp["in_b"] = ba[:, :r].reshape(hv, d).T
            lp["in_a"] = ba[:, r:].reshape(hv, d).T
            lp.update(moe_fields(i))
            for k_, v_ in lp.items():
                lin.setdefault(k_, []).append(v_)
        else:
            qg = get(f"{p}.self_attn.q_proj.weight")  # [2*q_dim, d]
            qg = qg.reshape(spec.num_heads, 2 * spec.head_dim, -1)
            d = qg.shape[-1]
            lp = {
                "attn_norm": get(f"{p}.input_layernorm.weight") + 1.0,
                "q": qg[:, :spec.head_dim].reshape(spec.q_dim, d).T,
                "attn_gate": qg[:, spec.head_dim:].reshape(spec.q_dim, d).T,
                "k": get(f"{p}.self_attn.k_proj.weight", True),
                "v": get(f"{p}.self_attn.v_proj.weight", True),
                "o": get(f"{p}.self_attn.o_proj.weight", True),
                "q_norm": get(f"{p}.self_attn.q_norm.weight") + 1.0,
                "k_norm": get(f"{p}.self_attn.k_norm.weight") + 1.0,
            }
            lp.update(moe_fields(i))
            for k_, v_ in lp.items():
                attn.setdefault(k_, []).append(v_)

    params: Params = {
        "embed": get("model.embed_tokens.weight"),
        "final_norm": get("model.norm.weight") + 1.0,
    }
    if lin:
        params["lin_layers"] = {k: np.stack(v) for k, v in lin.items()}
    if attn:
        params["attn_layers"] = {k: np.stack(v) for k, v in attn.items()}
    if not spec.tie_embeddings:
        params["lm_head"] = get("lm_head.weight", True)
    return jax.tree.map(jnp.asarray, params)


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict:
    pat = _pattern(spec)
    hk, hv = spec.gdn_k_heads, spec.gdn_v_heads
    dk, dv = spec.gdn_k_dim, spec.gdn_v_dim
    r = hv // hk
    d = spec.hidden_size
    state: dict[str, np.ndarray] = {}
    state["model.embed_tokens.weight"] = np.asarray(params["embed"])
    state["model.norm.weight"] = np.asarray(params["final_norm"]) - 1.0
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T

    def put_moe(i, lp):
        state[f"model.layers.{i}.post_attention_layernorm.weight"] = (
            np.asarray(lp["mlp_norm"]) - 1.0)
        state[f"model.layers.{i}.mlp.gate.weight"] = np.asarray(lp["router"]).T
        for ours, theirs in (("shared_gate", "gate_proj"), ("shared_up", "up_proj"),
                             ("shared_down", "down_proj")):
            state[f"model.layers.{i}.mlp.shared_expert.{theirs}.weight"] = (
                np.asarray(lp[ours]).T)
        for ours, theirs in (("expert_gate", "gate_proj"), ("expert_up", "up_proj"),
                             ("expert_down", "down_proj")):
            stacked = np.asarray(lp[ours])
            for j in range(spec.num_experts):
                state[f"model.layers.{i}.mlp.experts.{j}.{theirs}.weight"] = stacked[j].T
        if spec.shared_expert_gate:
            state[f"model.layers.{i}.mlp.shared_expert_gate.weight"] = (
                np.asarray(lp["shared_expert_gate_w"]).T)

    li = ai = 0
    for i, ch in enumerate(pat):
        p = f"model.layers.{i}"
        if ch == "L":
            lp = jax.tree.map(lambda x: x[li], params["lin_layers"])
            li += 1
            state[f"{p}.input_layernorm.weight"] = np.asarray(lp["attn_norm"]) - 1.0
            q = np.asarray(lp["in_q"]).T.reshape(hk, dk, d)
            k = np.asarray(lp["in_k"]).T.reshape(hk, dk, d)
            v = np.asarray(lp["in_v"]).T.reshape(hk, r * dv, d)
            z = np.asarray(lp["in_z"]).T.reshape(hk, r * dv, d)
            state[f"{p}.linear_attn.in_proj_qkvz.weight"] = np.concatenate(
                [q, k, v, z], axis=1).reshape(-1, d)
            b_ = np.asarray(lp["in_b"]).T.reshape(hk, r, d)
            a_ = np.asarray(lp["in_a"]).T.reshape(hk, r, d)
            state[f"{p}.linear_attn.in_proj_ba.weight"] = np.concatenate(
                [b_, a_], axis=1).reshape(-1, d)
            state[f"{p}.linear_attn.conv1d.weight"] = np.asarray(lp["conv_w"])[:, None, :]
            state[f"{p}.linear_attn.dt_bias"] = np.asarray(lp["dt_bias"])
            state[f"{p}.linear_attn.A_log"] = np.asarray(lp["A_log"])
            state[f"{p}.linear_attn.norm.weight"] = np.asarray(lp["gdn_norm"])
            state[f"{p}.linear_attn.out_proj.weight"] = np.asarray(lp["out_proj"]).T
        else:
            lp = jax.tree.map(lambda x: x[ai], params["attn_layers"])
            ai += 1
            state[f"{p}.input_layernorm.weight"] = np.asarray(lp["attn_norm"]) - 1.0
            q = np.asarray(lp["q"]).T.reshape(spec.num_heads, spec.head_dim, d)
            g = np.asarray(lp["attn_gate"]).T.reshape(spec.num_heads, spec.head_dim, d)
            state[f"{p}.self_attn.q_proj.weight"] = np.concatenate(
                [q, g], axis=1).reshape(-1, d)
            state[f"{p}.self_attn.k_proj.weight"] = np.asarray(lp["k"]).T
            state[f"{p}.self_attn.v_proj.weight"] = np.asarray(lp["v"]).T
            state[f"{p}.self_attn.o_proj.weight"] = np.asarray(lp["o"]).T
            state[f"{p}.self_attn.q_norm.weight"] = np.asarray(lp["q_norm"]) - 1.0
            state[f"{p}.self_attn.k_norm.weight"] = np.asarray(lp["k_norm"]) - 1.0
        put_moe(i, lp)
    return state


# ---------------------------------------------------------------------------
# qwen3_next_vl: the hybrid trunk + Qwen3-VL vision tower (reference
# trainer/models/qwen3_5/ — "hybrid DeltaNet VLM" — composes the same way;
# HF layout convention: text under model.language_model.*, vision under
# model.visual.*, matching qwen3_vl)
# ---------------------------------------------------------------------------

def init_params_vl(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    from prime_rl_tpu.models.vision import init_vision_params

    kt, kv = jax.random.split(key)
    params = init_params(spec, kt, dtype=dtype)
    params["vision"] = init_vision_params(spec.vision, kv, dtype=dtype)
    return params


def params_from_hf_state_dict_vl(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    from prime_rl_tpu.models.qwen3_vl import _retarget_text_keys, _vision_from_hf

    params = params_from_hf_state_dict(_retarget_text_keys(state), spec, dtype=dtype)
    params["vision"] = jax.tree.map(jnp.asarray,
                                    _vision_from_hf(state, spec.vision, dtype))
    return params


def params_to_hf_state_dict_vl(params: Params, spec: ModelSpec) -> dict:
    from prime_rl_tpu.models.qwen3_vl import _vision_to_hf

    text = {k: v for k, v in params.items() if k != "vision"}
    state = params_to_hf_state_dict(text, spec)
    out = {}
    for k, v in state.items():
        if k.startswith("model."):
            out["model.language_model." + k[len("model."):]] = v
        else:
            out[k] = v
    out.update(_vision_to_hf(params["vision"], spec.vision))
    return out


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("qwen3_next", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
register_family("qwen3_next_vl", Family(
    init_params_vl, forward, params_from_hf_state_dict_vl, params_to_hf_state_dict_vl,
    get_lm_head,
))
