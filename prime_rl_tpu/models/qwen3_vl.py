"""Qwen3-VL family: ViT vision tower + Qwen3 text decoder with interleaved
mRoPE and DeepStack visual-feature injection. Dense and MoE text variants.

Behavior parity targets: HF ``Qwen3VLForConditionalGeneration`` /
``Qwen3VLMoeForConditionalGeneration`` and the reference's VLM composition
(reference: trainer/models/qwen3_5/modeling_qwen3_5.py Qwen3_5VLMModel,
qwen3_5_moe/mrope.py). TPU-first design:

- The vision tower (models/vision.py) consumes ONE padded patch buffer per
  micro-batch with precomputed host-side metadata — static shapes under jit.
- Merged image embeddings scatter into image-token slots with a gather +
  ``where`` (per-token ``img_slot`` indices, computed host-side) instead of
  ``masked_scatter`` (data-dependent compaction XLA can't tile).
- Interleaved mRoPE reduces to a per-frequency position gather: a static
  [rot//2] selector in {t,h,w} turns [3, B, L] grid positions into
  [B, L, rot//2] per-frequency positions, then standard rotate-half rope
  (ops/layers.apply_rope ndim==3 branch) — no bespoke rope kernel.
- DeepStack: the first ``n_ds`` decoder layers run unrolled with the visual
  features added at image slots; the remaining layers scan as usual.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.models.vision import (
    VisionSpec,
    init_vision_params,
    mrope_dim_select,
    vision_forward,
)
from prime_rl_tpu.ops.layers import rms_norm, rope_frequencies


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    kt, kv = jax.random.split(key)
    if spec.is_moe:
        from prime_rl_tpu.models import qwen3_moe

        params = qwen3_moe.init_params(spec, kt, dtype=dtype)
    else:
        params = qwen3.init_params(spec, kt, dtype=dtype)
    params["vision"] = init_vision_params(spec.vision, kv, dtype=dtype)
    return params


get_lm_head = qwen3.get_lm_head


def _mrope_positions(spec: ModelSpec, mm_position_ids: jax.Array) -> jax.Array:
    """[3, B, L] grid positions -> [B, L, rot//2] per-frequency positions
    (rot respects partial rotary — qwen3_next_vl rotates only the first
    quarter of head_dim)."""
    rot_half = int(spec.head_dim * spec.partial_rotary_factor) // 2
    sel = jnp.asarray(mrope_dim_select(tuple(spec.mrope_section), rot_half))
    return jnp.transpose(mm_position_ids[sel], (1, 2, 0))


def forward(
    params: Params,
    spec: ModelSpec,
    input_ids: jax.Array,      # [B, L]
    segment_ids: jax.Array,    # [B, L]
    position_ids: jax.Array,   # [B, L] text positions (used when mm is None)
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    block_q: int = 512,
    block_kv: int = 512,
    remat: str = "full",
    mesh=None,
    lora: Params | None = None,
    lora_scale: float = 1.0,
    cp_style: str = "ulysses",
    collect_aux: bool = False,
    mm: dict[str, jax.Array] | None = None,
):
    """Final normed hidden states [B, L, D].

    ``mm`` (all arrays; None = text-only forward, plain rope):
      patches [P, patch_dim], vis_seg_ids [P], vis_pos_idx [4, P],
      vis_pos_w [4, P], vis_rope_coords [P, 2],
      img_slot [B, L] (row in the merged buffer per vision token),
      mm_position_ids [3, B, L].
    """
    inv_freq = rope_frequencies(spec.head_dim, spec.rope_theta)
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)
    b, l, d = h.shape

    img_mask = None
    ds_feats = None
    img_slot = None
    if mm is not None:
        merged, ds_feats = vision_forward(
            params["vision"], spec.vision,
            mm["patches"], mm["vis_seg_ids"], mm["vis_pos_idx"],
            mm["vis_pos_w"], mm["vis_rope_coords"],
            compute_dtype=compute_dtype,
        )
        # inject where the host-side prep assigned a slot (slot >= 0), NOT by
        # token id: an image token the policy SAMPLED has no pixels behind it
        # and must stay a plain text token
        img_slot = mm["img_slot"]
        img_mask = (img_slot >= 0)[..., None]
        img_slot = jnp.maximum(img_slot, 0)
        gathered = jnp.take(merged.astype(compute_dtype), img_slot, axis=0)  # [B, L, D]
        h = jnp.where(img_mask, gathered, h)
        rope_pos = _mrope_positions(spec, mm["mm_position_ids"])
    else:
        rope_pos = position_ids

    collect = collect_aux and spec.is_moe

    if spec.is_moe:
        from prime_rl_tpu.ops.moe import moe_mlp

        def block(carry, lp, ll=None):
            hh, aux = carry
            cast = {k: (v.astype(compute_dtype) if v.ndim >= 2 and k != "router" else v)
                    for k, v in lp.items()}
            hh = qwen3._attn_block(hh, cast, spec, segment_ids, rope_pos, inv_freq,
                                   attn_impl, block_q, block_kv, mesh, ll, lora_scale,
                                   cp_style)
            x = rms_norm(hh, cast["mlp_norm"], spec.rms_eps)
            out, routing = moe_mlp(
                x.reshape(b * l, d), lp["router"],
                cast["expert_gate"], cast["expert_up"], cast["expert_down"],
                spec.num_experts_per_tok, spec.norm_topk_prob,
                lora=ll, lora_scale=lora_scale,
            )
            return hh + out.reshape(b, l, d), aux + routing.load_balance_loss
    else:
        def block(carry, lp, ll=None):
            hh, aux = carry
            cast = {k: (v.astype(compute_dtype) if v.ndim >= 2 else v)
                    for k, v in lp.items()}
            hh = qwen3._attn_block(hh, cast, spec, segment_ids, rope_pos, inv_freq,
                                   attn_impl, block_q, block_kv, mesh, ll, lora_scale,
                                   cp_style)
            hh = qwen3._mlp_block(hh, cast, spec, ll, lora_scale)
            return hh, aux

    if remat == "full":
        block = jax.checkpoint(block, prevent_cse=False)
    elif remat == "selective":
        block = jax.checkpoint(
            block, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            prevent_cse=False,
        )

    n_ds = ds_feats.shape[0] if ds_feats is not None else 0
    carry = (h, jnp.float32(0.0))

    # first n_ds layers unrolled: DeepStack adds the k-th visual feature map
    # at image slots after layer k (HF Qwen3VLTextModel._deepstack_process)
    for i in range(n_ds):
        lp_i = jax.tree.map(lambda x: x[i], params["layers"])
        ll_i = jax.tree.map(lambda x: x[i], lora["layers"]) if lora is not None else None
        carry = block(carry, lp_i, ll_i)
        inj = jnp.take(ds_feats[i].astype(compute_dtype), img_slot, axis=0)
        carry = (jnp.where(img_mask, carry[0] + inj, carry[0]), carry[1])

    rest = jax.tree.map(lambda x: x[n_ds:], params["layers"])
    if lora is None:
        carry, _ = jax.lax.scan(lambda c, lp: (block(c, lp), None), carry, rest)
    else:
        lora_rest = jax.tree.map(lambda x: x[n_ds:], lora["layers"])
        carry, _ = jax.lax.scan(lambda c, xs: (block(c, xs[0], xs[1]), None),
                                carry, (rest, lora_rest))
    h, aux = carry
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect else h


# ---------------------------------------------------------------------------
# HF interchange. Text keys live under model.language_model.*, the vision
# tower under model.visual.* (HF Qwen3VLForConditionalGeneration layout).
# ---------------------------------------------------------------------------

_MERGER_MAP = {
    "ln_w": ("norm.weight", False), "ln_b": ("norm.bias", False),
    "fc1_w": ("linear_fc1.weight", True), "fc1_b": ("linear_fc1.bias", False),
    "fc2_w": ("linear_fc2.weight", True), "fc2_b": ("linear_fc2.bias", False),
}

_BLOCK_MAP = {
    "ln1_w": ("norm1.weight", False), "ln1_b": ("norm1.bias", False),
    "ln2_w": ("norm2.weight", False), "ln2_b": ("norm2.bias", False),
    "qkv_w": ("attn.qkv.weight", True), "qkv_b": ("attn.qkv.bias", False),
    "proj_w": ("attn.proj.weight", True), "proj_b": ("attn.proj.bias", False),
    "fc1_w": ("mlp.linear_fc1.weight", True), "fc1_b": ("mlp.linear_fc1.bias", False),
    "fc2_w": ("mlp.linear_fc2.weight", True), "fc2_b": ("mlp.linear_fc2.bias", False),
}


def _vision_from_hf(state: dict, vspec: VisionSpec, dtype=np.float32) -> Params:
    def get(key, tr):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    blocks = {
        f: np.stack([get(f"model.visual.blocks.{i}.{suf}", tr)
                     for i in range(vspec.depth)])
        for f, (suf, tr) in _BLOCK_MAP.items()
    }
    merger = {f: get(f"model.visual.merger.{suf}", tr)
              for f, (suf, tr) in _MERGER_MAP.items()}
    n_ds = len(vspec.deepstack_visual_indexes)
    ds = {
        f: np.stack([get(f"model.visual.deepstack_merger_list.{k}.{suf}", tr)
                     for k in range(n_ds)])
        for f, (suf, tr) in _MERGER_MAP.items()
    } if n_ds else {}
    # Conv3d [D, C, T, p, p] with kernel == stride == patch dims is a matmul
    # on the (C, T, p, p)-flattened patch vector
    patch_w = np.asarray(state["model.visual.patch_embed.proj.weight"], dtype=dtype)
    return {
        "patch_w": patch_w.reshape(vspec.hidden_size, -1).T,
        "patch_b": get("model.visual.patch_embed.proj.bias", False),
        "pos_embed": get("model.visual.pos_embed.weight", False),
        "blocks": blocks, "merger": merger, "ds_mergers": ds,
    }


def _vision_to_hf(vparams: Params, vspec: VisionSpec) -> dict[str, np.ndarray]:
    state: dict[str, np.ndarray] = {}
    pw = np.asarray(vparams["patch_w"]).T  # [D, patch_dim]
    state["model.visual.patch_embed.proj.weight"] = pw.reshape(
        vspec.hidden_size, vspec.in_channels, vspec.temporal_patch_size,
        vspec.patch_size, vspec.patch_size,
    )
    state["model.visual.patch_embed.proj.bias"] = np.asarray(vparams["patch_b"])
    state["model.visual.pos_embed.weight"] = np.asarray(vparams["pos_embed"])
    for f, (suf, tr) in _BLOCK_MAP.items():
        stacked = np.asarray(vparams["blocks"][f])
        for i in range(vspec.depth):
            state[f"model.visual.blocks.{i}.{suf}"] = stacked[i].T if tr else stacked[i]
    for f, (suf, tr) in _MERGER_MAP.items():
        arr = np.asarray(vparams["merger"][f])
        state[f"model.visual.merger.{suf}"] = arr.T if tr else arr
        if vparams["ds_mergers"]:
            ds = np.asarray(vparams["ds_mergers"][f])
            for k in range(len(vspec.deepstack_visual_indexes)):
                state[f"model.visual.deepstack_merger_list.{k}.{suf}"] = (
                    ds[k].T if tr else ds[k]
                )
    return state


def _retarget_text_keys(state: dict) -> dict:
    """View the VLM state dict with text keys moved from
    model.language_model.* to model.* so the qwen3 converters apply."""
    out = {}
    for k, v in state.items():
        if k.startswith("model.language_model."):
            out["model." + k[len("model.language_model."):]] = v
        elif not k.startswith("model.visual."):
            out[k] = v
    return out


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    text_state = _retarget_text_keys(state)
    if spec.is_moe:
        from prime_rl_tpu.models import qwen3_moe

        params = qwen3_moe.params_from_hf_state_dict(text_state, spec, dtype=dtype)
    else:
        params = qwen3.params_from_hf_state_dict(text_state, spec, dtype=dtype)
    params["vision"] = jax.tree.map(jnp.asarray, _vision_from_hf(state, spec.vision, dtype))
    return params


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict:
    text = {k: v for k, v in params.items() if k != "vision"}
    if spec.is_moe:
        from prime_rl_tpu.models import qwen3_moe

        state = qwen3_moe.params_to_hf_state_dict(text, spec)
    else:
        state = qwen3.params_to_hf_state_dict(text, spec)
    out = {}
    for k, v in state.items():
        if k.startswith("model."):
            out["model.language_model." + k[len("model."):]] = v
        else:
            out[k] = v
    out.update(_vision_to_hf(params["vision"], spec.vision))
    return out


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("qwen3_vl", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
register_family("qwen3_vl_moe", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
