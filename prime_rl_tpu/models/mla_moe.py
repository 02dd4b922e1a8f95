"""DeepSeek-V3 / GLM-MoE-DSA families: MLA (multi-head latent) attention
with optional DSA sparse top-k attention, over the noaux-tc MoE stack.

Behavior parity targets: HF ``DeepseekV3ForCausalLM`` (dense-MLA path;
modeling_deepseek_v3.py DeepseekV3Attention) and the reference
``glm_moe_dsa`` family (trainer/models/glm_moe_dsa/modeling_glm_moe_dsa.py,
sparse_mla_attention.py — the GLM-4.6/5 class: MLA + sparse indexer +
first-k-dense noaux-tc MoE). TPU-first design:

- Attention always runs the **absorbed** MLA form: q_nope is folded through
  kv_b's key half so scores are dot products against the [S, kv_lora+rope]
  latent stream — one shared KV per token (MQA over a 576-dim latent), no
  per-head K/V materialization. This is both the sparse kernel's native form
  and the cheapest dense form on the MXU.
- DSA (``index_topk > 0``): the bf16 indexer + chunked-gather sparse
  attention in ops/sparse_mla.py. ``index_topk == 0`` is the plain
  DeepSeek-V3 dense MLA.
- MoE reuses the glm4_moe block (sigmoid noaux-tc routing, group-limited
  top-k, shared experts, first-k dense layers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.models.glm4_moe import glm_moe_block
from prime_rl_tpu.ops.layers import rms_norm, rope_frequencies, swiglu
from prime_rl_tpu.ops.sparse_mla import (
    dense_mla_attention,
    interleaved_rope,
    mla_topk_indices,
    sparse_mla_attention,
)


def _qk_head_dim(spec: ModelSpec) -> int:
    return spec.qk_nope_head_dim + spec.qk_rope_head_dim


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    d, H = spec.hidden_size, spec.num_heads
    qk, rope_d = _qk_head_dim(spec), spec.qk_rope_head_dim
    kvl, ql, vh = spec.kv_lora_rank, spec.q_lora_rank, spec.v_head_dim
    k_dense = spec.first_k_dense_replace
    n_moe = spec.num_layers - k_dense

    def attn_leaves(k, n):
        ks = jax.random.split(k, 12)
        lp = {
            "attn_norm": jnp.ones((n, d), dtype),
            "mlp_norm": jnp.ones((n, d), dtype),
            "kv_a": w(ks[0], n, d, kvl + rope_d),
            "kv_a_norm": jnp.ones((n, kvl), dtype),
            "kv_b": w(ks[1], n, kvl, H * (spec.qk_nope_head_dim + vh)),
            "o": w(ks[2], n, H * vh, d),
        }
        if ql:
            lp["q_a"] = w(ks[3], n, d, ql)
            lp["q_a_norm"] = jnp.ones((n, ql), dtype)
            lp["q_b"] = w(ks[4], n, ql, H * qk)
        else:
            lp["q"] = w(ks[4], n, d, H * qk)
        if spec.index_topk:
            hi, di = spec.index_n_heads, spec.index_head_dim
            lp["idx_wq_b"] = w(ks[5], n, ql, hi * di)
            lp["idx_wk"] = w(ks[6], n, d, di)
            lp["idx_k_norm_w"] = jnp.ones((n, di), dtype)
            lp["idx_k_norm_b"] = jnp.zeros((n, di), dtype)
            lp["idx_w_proj"] = w(ks[7], n, d, hi)
        return lp, ks[8:]

    dense_layers, dks = attn_leaves(jax.random.fold_in(key, 1), k_dense)
    for f, k in zip(("gate", "up", "down"), dks):
        ins, outs = (d, spec.intermediate_size) if f != "down" else (spec.intermediate_size, d)
        dense_layers[f] = w(k, k_dense, ins, outs)

    moe_layers, mks = attn_leaves(jax.random.fold_in(key, 2), n_moe)
    e, m = spec.num_experts, spec.moe_intermediate_size
    ks2 = jax.random.split(jax.random.fold_in(key, 3), 7)
    moe_layers["router"] = w(ks2[0], n_moe, d, e)
    moe_layers["router_correction_bias"] = jnp.zeros((n_moe, e), jnp.float32)
    moe_layers["expert_gate"] = w(ks2[1], n_moe, e, d, m)
    moe_layers["expert_up"] = w(ks2[2], n_moe, e, d, m)
    moe_layers["expert_down"] = w(ks2[3], n_moe, e, m, d)
    if spec.n_shared_experts:
        ms = m * spec.n_shared_experts
        moe_layers["shared_gate"] = w(ks2[4], n_moe, d, ms)
        moe_layers["shared_up"] = w(ks2[5], n_moe, d, ms)
        moe_layers["shared_down"] = w(ks2[6], n_moe, ms, d)

    params: Params = {
        "embed": w(jax.random.fold_in(key, 4), spec.vocab_size, d),
        "layers": moe_layers,
        "final_norm": jnp.ones((d,), dtype),
    }
    if k_dense:
        params["dense_layers"] = dense_layers
    if not spec.tie_embeddings:
        params["lm_head"] = w(jax.random.fold_in(key, 5), d, spec.vocab_size)
    return params


def _rope(x, position_ids, inv_freq, interleave: bool):
    """x: [B, L, H, d] or [B, L, d]; per-row positions [B, L]."""
    if interleave:
        return jax.vmap(lambda xr, pr: interleaved_rope(xr, pr, inv_freq))(x, position_ids)
    # half-split (neox) layout via the shared rope helper
    from prime_rl_tpu.ops.layers import apply_rope

    squeeze = x.ndim == 3
    if squeeze:
        x = x[:, :, None, :]
    out = apply_rope(x, position_ids, inv_freq)
    return out[:, :, 0, :] if squeeze else out


def mla_absorbed_qkv(x, lp, spec: ModelSpec, position_ids, inv_freq,
                     ll=None, lora_scale: float = 1.0):
    """Absorbed MLA projections. x: [B, L, D] (post input-norm). Returns
    (q_lat [B,L,ql]|None, absorbed query [B,L,H,kvl+rope], latent kv
    [B,L,kvl+rope], w_kv_b [kvl,H,nope+vh]). Shared by the training block
    and the serving prefill/decode (the latent kv IS the serving cache row —
    the MLA cache stores kvl+rope floats per token, not per-head K/V)."""
    from prime_rl_tpu.models.lora import apply_lora_proj as _p

    B, L, _ = x.shape
    H, qk = spec.num_heads, _qk_head_dim(spec)
    nope, kvl, vh = spec.qk_nope_head_dim, spec.kv_lora_rank, spec.v_head_dim

    if "q_a" in lp:
        q_lat = rms_norm(_p(x, lp["q_a"], None, "q_a", 1.0),
                         lp["q_a_norm"], spec.rms_eps)
        q = _p(q_lat, lp["q_b"], ll, "q_b", lora_scale).reshape(B, L, H, qk)
    else:
        q_lat = None
        q = _p(x, lp["q"], ll, "q", lora_scale).reshape(B, L, H, qk)
    q_nope, q_rope = q[..., :nope], q[..., nope:]

    ckv = _p(x, lp["kv_a"], ll, "kv_a", lora_scale)  # [B, L, kvl + rope_d]
    c_kv = rms_norm(ckv[..., :kvl], lp["kv_a_norm"], spec.rms_eps)
    k_rope = ckv[..., kvl:]

    q_rope = _rope(q_rope, position_ids, inv_freq, spec.rope_interleave)
    k_rope = _rope(k_rope, position_ids, inv_freq, spec.rope_interleave)

    w_kv_b_flat = lp["kv_b"]
    if ll is not None and "kv_b_a" in ll:
        w_kv_b_flat = w_kv_b_flat + lora_scale * (
            ll["kv_b_a"].astype(w_kv_b_flat.dtype)
            @ ll["kv_b_b"].astype(w_kv_b_flat.dtype))
    w_kv_b = w_kv_b_flat.reshape(kvl, H, nope + vh)
    q_abs = jnp.einsum("blhn,khn->blhk", q_nope, w_kv_b[..., :nope])
    sparse_q = jnp.concatenate([q_abs, q_rope], axis=-1)  # [B, L, H, kvl+rope]
    kv = jnp.concatenate([c_kv, k_rope], axis=-1)         # [B, L, kvl+rope]
    return q_lat, sparse_q, kv, w_kv_b


def mla_indexer_qk(x, lp, spec: ModelSpec, position_ids, inv_freq, q_lat):
    """DSA indexer projections (reference Indexer.compute_sparse_indices
    layout: rope tail at the FRONT of the index head). Returns
    (q_idx [B,L,hi,di], w_idx [B,L,hi], k_idx [B,L,di]) — k_idx is what the
    serving engine pages (the exact sparse selection at decode time)."""
    from prime_rl_tpu.ops.layers import layer_norm

    B, L, _ = x.shape
    hi, di = spec.index_n_heads, spec.index_head_dim
    rope_d = spec.qk_rope_head_dim
    q_idx = (q_lat @ lp["idx_wq_b"]).reshape(B, L, hi, di)
    k_idx = layer_norm(x @ lp["idx_wk"], lp["idx_k_norm_w"], lp["idx_k_norm_b"])
    w_idx = x @ lp["idx_w_proj"]  # [B, L, hi]
    q_pe = _rope(q_idx[..., :rope_d], position_ids, inv_freq, spec.rope_interleave)
    k_pe = _rope(k_idx[..., :rope_d], position_ids, inv_freq, spec.rope_interleave)
    q_idx = jnp.concatenate([q_pe, q_idx[..., rope_d:]], axis=-1)
    k_idx = jnp.concatenate([k_pe, k_idx[..., rope_d:]], axis=-1)
    return q_idx, w_idx, k_idx


def mla_attention(h, lp, spec: ModelSpec, segment_ids, position_ids, inv_freq,
                  ll=None, lora_scale: float = 1.0):
    """Pre-norm MLA attention block with residual (absorbed compute).

    h: [B, L, D]; per-token positions restart per packed segment, and the
    DSA indexer's [ks, ke) varlen bounds derive from them exactly as the
    reference does (modeling_glm_moe_dsa.py ks/ke from position_ids).

    ``ll``: per-layer LoRA dict — targets q_b (or q), kv_a, kv_b, o. The
    kv_b delta is folded into the absorbed weight before the einsum split
    (W + scale·A·B absorbs identically to W)."""
    from prime_rl_tpu.models.lora import apply_lora_proj as _p

    B, L, D = h.shape
    H, qk = spec.num_heads, _qk_head_dim(spec)
    nope, rope_d, kvl, vh = (spec.qk_nope_head_dim, spec.qk_rope_head_dim,
                             spec.kv_lora_rank, spec.v_head_dim)
    x = rms_norm(h, lp["attn_norm"], spec.rms_eps)

    q_lat, sparse_q, kv, w_kv_b = mla_absorbed_qkv(
        x, lp, spec, position_ids, inv_freq, ll=ll, lora_scale=lora_scale)
    scale = qk ** -0.5

    if spec.index_topk:
        q_idx, w_idx, k_idx = mla_indexer_qk(x, lp, spec, position_ids,
                                             inv_freq, q_lat)
        tok = jnp.arange(L, dtype=jnp.int32)[None, :]
        ks = tok - position_ids.astype(jnp.int32)
        ke = tok + 1
        # padding rows (segment 0) select nothing: ke <= ks
        ke = jnp.where(segment_ids > 0, ke, 0)
        indices = jax.vmap(
            lambda qi, ki, wi, a, b: mla_topk_indices(qi, ki, wi, a, b, spec.index_topk)
        )(q_idx, k_idx, w_idx, ks, ke)
        # TPU: fused gathered-flash Pallas kernel (scores never leave VMEM);
        # CPU/tests: the XLA chunked-gather op (pallas interpret is too slow)
        if jax.default_backend() not in ("cpu",):
            from prime_rl_tpu.ops.sparse_mla_pallas import (
                sparse_mla_attention as sparse_attn,
            )
        else:
            sparse_attn = sparse_mla_attention
        out_lat = jax.vmap(
            lambda qq, kk, ii: sparse_attn(qq, kk, ii, scale, kvl)
        )(sparse_q, kv, indices)
    else:
        out_lat = jax.vmap(
            lambda qq, kk, seg: dense_mla_attention(qq, kk, seg, scale, kvl)
        )(sparse_q, kv, segment_ids)

    v_out = jnp.einsum("blhk,khv->blhv", out_lat, w_kv_b[..., nope:])
    return h + _p(v_out.reshape(B, L, H * vh), lp["o"], ll, "o", lora_scale)


def forward(
    params: Params,
    spec: ModelSpec,
    input_ids: jax.Array,
    segment_ids: jax.Array,
    position_ids: jax.Array,
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",  # MLA always uses its own absorbed kernel
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
    inv_freq = rope_frequencies(spec.qk_rope_head_dim, spec.rope_theta)
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)

    # latent-projection LoRA rides a reserved "_lora" sub-dict inside the
    # layer pytrees (targets q_b/q, kv_a, kv_b, o — models/lora.target_dims)
    k_dense = spec.first_k_dense_replace
    if lora is not None:
        ll_all = lora["layers"]
        params = dict(params)
        if k_dense and "dense_layers" in params:
            params["dense_layers"] = dict(
                params["dense_layers"],
                _lora=jax.tree.map(lambda x: x[:k_dense], ll_all))
        params["layers"] = dict(params["layers"],
                                _lora=jax.tree.map(lambda x: x[k_dense:], ll_all))
    if routed_experts is not None:
        # router replay (see glm4_moe.forward): scan-major via the pytree
        b_, l_ = routed_experts.shape[:2]
        forced = jnp.transpose(routed_experts, (2, 0, 1, 3)).reshape(
            routed_experts.shape[2], b_ * l_, spec.num_experts_per_tok)
        params = dict(params)
        params["layers"] = dict(params["layers"], _forced=forced)

    def cast_lp(lp):
        return {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2
                    and "router" not in k else v)
                for k, v in lp.items() if not k.startswith("_")}

    def attn(h, lp):
        return mla_attention(h, cast_lp(lp), spec, segment_ids, position_ids,
                             inv_freq, ll=lp.get("_lora"), lora_scale=lora_scale)

    def dense_block(h, lp):
        h = attn(h, lp)
        cast = cast_lp(lp)
        x = rms_norm(h, cast["mlp_norm"], spec.rms_eps)
        return h + jnp.dot(swiglu(jnp.dot(x, cast["gate"]), jnp.dot(x, cast["up"])),
                           cast["down"])

    def moe_block(carry, lp):
        h, aux = carry
        h = attn(h, lp)
        h, lb = glm_moe_block(h, lp, spec, compute_dtype, lora_scale=lora_scale)
        return h, aux + lb

    def wrap(fn):
        if remat == "full":
            return jax.checkpoint(fn, prevent_cse=False)
        if remat == "selective":
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                prevent_cse=False)
        return fn

    dense_block = wrap(dense_block)
    moe_block = wrap(moe_block)

    for i in range(spec.first_k_dense_replace):
        h = dense_block(h, jax.tree.map(lambda x: x[i], params["dense_layers"]))
    (h, aux), _ = jax.lax.scan(lambda c, lp: (moe_block(c, lp), None),
                               (h, jnp.float32(0.0)), params["layers"])
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect_aux else h


get_lm_head = qwen3.get_lm_head


# ---------------------------------------------------------------------------
# HF interchange. Attention keys follow HF DeepseekV3 / reference GLM-DSA
# naming (q_a_proj/q_b_proj/kv_a_proj_with_mqa/kv_b_proj/o_proj +
# self_attn.indexer.{wq_b,wk,k_norm,weights_proj}); the MoE half shares the
# glm4_moe layout exactly (reference converting_glm_moe_dsa.py: "The MoE
# layout is identical to GLM4-MoE").
# ---------------------------------------------------------------------------

def _attn_keys(spec: ModelSpec):
    keys = [
        ("attn_norm", "input_layernorm.weight", False),
        ("mlp_norm", "post_attention_layernorm.weight", False),
        ("kv_a", "self_attn.kv_a_proj_with_mqa.weight", True),
        ("kv_a_norm", "self_attn.kv_a_layernorm.weight", False),
        ("kv_b", "self_attn.kv_b_proj.weight", True),
        ("o", "self_attn.o_proj.weight", True),
    ]
    if spec.q_lora_rank:
        keys += [("q_a", "self_attn.q_a_proj.weight", True),
                 ("q_a_norm", "self_attn.q_a_layernorm.weight", False),
                 ("q_b", "self_attn.q_b_proj.weight", True)]
    else:
        keys += [("q", "self_attn.q_proj.weight", True)]
    if spec.index_topk:
        keys += [("idx_wq_b", "self_attn.indexer.wq_b.weight", True),
                 ("idx_wk", "self_attn.indexer.wk.weight", True),
                 ("idx_k_norm_w", "self_attn.indexer.k_norm.weight", False),
                 ("idx_k_norm_b", "self_attn.indexer.k_norm.bias", False),
                 ("idx_w_proj", "self_attn.indexer.weights_proj.weight", True)]
    return keys


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    from prime_rl_tpu.models import glm4_moe

    return glm4_moe.params_from_hf_state_dict(state, spec, dtype=dtype,
                                              attn_keys=_attn_keys(spec))


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict:
    from prime_rl_tpu.models import glm4_moe

    return glm4_moe.params_to_hf_state_dict(params, spec, attn_keys=_attn_keys(spec))


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("deepseek_v3", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
register_family("glm_moe_dsa", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
