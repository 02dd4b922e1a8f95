"""Qwen3-VL-class vision tower: ViT encoder with 2D rotary, interpolated
position embeddings, spatial patch merging and DeepStack feature taps.

Behavior parity target: the HF ``Qwen3VLVisionModel`` the reference composes
into its VLM families (reference: trainer/models/qwen3_5/modeling_qwen3_5.py
Qwen3VLVisionModel usage; qwen3_5_moe/modeling_qwen3_5_moe.py). TPU-first
design decisions:

- **All data-dependent indexing happens on the host** (numpy ``prep_*``
  functions, run in the data pipeline): bilinear position-embedding gather
  indices/weights, 2D rope coordinates, and the merge-block permutation are
  functions of ``grid_thw`` only. The jitted tower receives static-shape
  arrays — no dynamic shapes, no host sync inside the step.
- The Conv3d patch embed is algebraically a **single matmul** on the
  flattened patch dim (kernel == stride): one MXU-friendly [P, C·T·p²]×[·, D]
  GEMM instead of a conv.
- Patches of all images in a micro-batch ride ONE padded [P, ·] buffer with
  per-image segment ids; attention masks cross-image pairs (the cu_seqlens
  analogue) so the tower runs once per micro-batch.
- Blocks are stacked and scanned in segments between DeepStack tap indexes.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.ops.layers import layer_norm, rope_frequencies

Params = dict


@dataclass(frozen=True)
class VisionSpec:
    """Vision-tower dims (HF Qwen3VLVisionConfig contract)."""

    depth: int = 27
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_heads: int = 16
    in_channels: int = 3
    patch_size: int = 16
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    out_hidden_size: int = 3584
    num_position_embeddings: int = 2304  # G*G learned table
    deepstack_visual_indexes: tuple[int, ...] = (8, 16, 24)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size**2

    @property
    def merge_unit(self) -> int:
        return self.spatial_merge_size**2

    @property
    def grid_side(self) -> int:
        return int(self.num_position_embeddings**0.5)


def init_vision_params(vspec: VisionSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    ks = jax.random.split(key, 8)
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    D, I, dep = vspec.hidden_size, vspec.intermediate_size, vspec.depth
    md = D * vspec.merge_unit
    lk = jax.random.split(ks[2], 4)
    blocks = {
        "ln1_w": jnp.ones((dep, D), dtype), "ln1_b": jnp.zeros((dep, D), dtype),
        "ln2_w": jnp.ones((dep, D), dtype), "ln2_b": jnp.zeros((dep, D), dtype),
        "qkv_w": w(lk[0], dep, D, 3 * D), "qkv_b": jnp.zeros((dep, 3 * D), dtype),
        "proj_w": w(lk[1], dep, D, D), "proj_b": jnp.zeros((dep, D), dtype),
        "fc1_w": w(lk[2], dep, D, I), "fc1_b": jnp.zeros((dep, I), dtype),
        "fc2_w": w(lk[3], dep, I, D), "fc2_b": jnp.zeros((dep, D), dtype),
    }

    def merger(k, postshuffle: bool):
        nd = md if postshuffle else D
        k1, k2 = jax.random.split(k)
        return {
            "ln_w": jnp.ones((nd,), dtype), "ln_b": jnp.zeros((nd,), dtype),
            "fc1_w": w(k1, md, md), "fc1_b": jnp.zeros((md,), dtype),
            "fc2_w": w(k2, md, vspec.out_hidden_size),
            "fc2_b": jnp.zeros((vspec.out_hidden_size,), dtype),
        }

    n_ds = len(vspec.deepstack_visual_indexes)
    ds_keys = jax.random.split(ks[4], max(n_ds, 1))
    ds = jax.tree.map(lambda *xs: jnp.stack(xs),
                      *[merger(ds_keys[i], True) for i in range(n_ds)]) if n_ds else {}
    return {
        "patch_w": w(ks[0], vspec.patch_dim, D),
        "patch_b": jnp.zeros((D,), dtype),
        "pos_embed": w(ks[1], vspec.num_position_embeddings, D),
        "blocks": blocks,
        "merger": merger(ks[3], False),
        "ds_mergers": ds,
    }


def _vision_attention(q, k, v, seg_ids, scale):
    """Non-causal block-diagonal attention over one packed patch stream.
    q/k/v: [P, H, hd]; seg_ids: [P] (0 = pad). Patch streams are short
    (thousands), so the full-matrix XLA form is MXU-fine."""
    scores = jnp.einsum("qhd,khd->hqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = (seg_ids[:, None] == seg_ids[None, :]) & (seg_ids > 0)[:, None]
    scores = jnp.where(mask[None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    return jnp.einsum("hqk,khd->qhd", probs, v)


def _vision_block(h, bp, vspec: VisionSpec, seg_ids, cos, sin):
    P = h.shape[0]
    x = layer_norm(h, bp["ln1_w"], bp["ln1_b"])
    qkv = x @ bp["qkv_w"] + bp["qkv_b"].astype(x.dtype)
    q, k, v = jnp.split(qkv.reshape(P, 3 * vspec.num_heads, vspec.head_dim), 3, axis=1)

    def rope(t):
        tf = t.astype(jnp.float32)
        t1, t2 = jnp.split(tf, 2, axis=-1)
        rotated = jnp.concatenate([t1 * cos - t2 * sin, t2 * cos + t1 * sin], axis=-1)
        return rotated.astype(t.dtype)

    o = _vision_attention(rope(q), rope(k), v, seg_ids, vspec.head_dim**-0.5)
    h = h + (o.reshape(P, vspec.hidden_size) @ bp["proj_w"] + bp["proj_b"].astype(h.dtype))
    x = layer_norm(h, bp["ln2_w"], bp["ln2_b"])
    x = jax.nn.gelu(x @ bp["fc1_w"] + bp["fc1_b"].astype(x.dtype), approximate=True)
    return h + (x @ bp["fc2_w"] + bp["fc2_b"].astype(x.dtype))


def _merger(h, mp, vspec: VisionSpec, postshuffle: bool):
    """[P, D] -> [P/m², out]. postshuffle (DeepStack): norm AFTER the m²-merge
    reshape; the final merger norms pre-merge (HF Qwen3VLVisionPatchMerger)."""
    mu = vspec.merge_unit
    if postshuffle:
        x = h.reshape(-1, mu * vspec.hidden_size)
        x = layer_norm(x, mp["ln_w"], mp["ln_b"])
    else:
        x = layer_norm(h, mp["ln_w"], mp["ln_b"]).reshape(-1, mu * vspec.hidden_size)
    x = jax.nn.gelu(x @ mp["fc1_w"] + mp["fc1_b"].astype(x.dtype), approximate=False)
    return x @ mp["fc2_w"] + mp["fc2_b"].astype(x.dtype)


def vision_forward(
    vparams: Params,
    vspec: VisionSpec,
    patches: jax.Array,      # [P, patch_dim] f32 (HF processor layout, merge-block order)
    seg_ids: jax.Array,      # [P] int32, 1-based image index, 0 = pad
    pos_idx: jax.Array,      # [4, P] int32 bilinear gather rows into pos_embed
    pos_w: jax.Array,        # [4, P] f32 bilinear weights
    rope_coords: jax.Array,  # [P, 2] int32 (row, col) full-res coords
    compute_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Returns (merged [P/m², out_hidden], deepstack [n_ds, P/m², out_hidden])."""
    cast = lambda t: t.astype(compute_dtype) if t.ndim >= 1 and jnp.issubdtype(t.dtype, jnp.floating) else t
    P = patches.shape[0]
    h = patches.astype(compute_dtype) @ cast(vparams["patch_w"]) + cast(vparams["patch_b"])
    pos = jnp.einsum(
        "gpd,gp->pd", vparams["pos_embed"].astype(jnp.float32)[pos_idx], pos_w
    )
    h = h + pos.astype(compute_dtype)

    # 2D rope: half the rotary dims carry the row coordinate, half the col
    inv_freq = rope_frequencies(vspec.head_dim // 2, 10000.0)  # [hd//4]
    angles = (rope_coords[..., None].astype(jnp.float32) * inv_freq).reshape(P, -1)  # [P, hd//2]
    cos, sin = jnp.cos(angles)[:, None, :], jnp.sin(angles)[:, None, :]

    blocks = jax.tree.map(cast, vparams["blocks"])
    block = jax.checkpoint(
        functools.partial(_vision_block, vspec=vspec, seg_ids=seg_ids, cos=cos, sin=sin),
        prevent_cse=False,
    )

    # scan between DeepStack taps: segment boundaries are static per spec
    taps = sorted(vspec.deepstack_visual_indexes)
    bounds = [0] + [t + 1 for t in taps] + [vspec.depth]
    ds_feats = []
    for i in range(len(bounds) - 1):
        a, b = bounds[i], bounds[i + 1]
        if b > a:
            seg = jax.tree.map(lambda x: x[a:b], blocks)
            h, _ = jax.lax.scan(lambda c, bp: (block(c, bp), None), h, seg)
        if i < len(taps):
            mp = jax.tree.map(lambda x: cast(x[i]), vparams["ds_mergers"])
            ds_feats.append(_merger(h, mp, vspec, postshuffle=True))

    merged = _merger(h, jax.tree.map(cast, vparams["merger"]), vspec, postshuffle=False)
    ds = (jnp.stack(ds_feats) if ds_feats
          else jnp.zeros((0,) + merged.shape, merged.dtype))
    return merged, ds


# ---------------------------------------------------------------------------
# Host-side prep (numpy, data pipeline). Everything here is a pure function
# of grid_thw / token ids — computed once per sample, shipped as arrays.
# ---------------------------------------------------------------------------

def prep_patch_metadata(
    grid_thw: np.ndarray, vspec: VisionSpec, pad_to: int | None = None
) -> dict[str, np.ndarray]:
    """Per-patch arrays for a concatenated multi-image stream.

    Returns dict with seg_ids [P], pos_idx [4, P], pos_w [4, P],
    rope_coords [P, 2]; P = sum(t*h*w) padded to ``pad_to``.
    Order matches the HF processor's merge-block patch layout."""
    m, G = vspec.spatial_merge_size, vspec.grid_side
    segs, idxs, ws, coords = [], [], [], []
    seg_counter = 0
    for img_i, (t, hh, ww) in enumerate(np.asarray(grid_thw, np.int64), start=1):
        # attention is block-diagonal per FRAME, not per image (HF
        # Qwen3VLVisionModel: cu_seqlens = repeat_interleave(h*w, t).cumsum())
        fr = int(hh * ww)
        segs.append(np.repeat(
            np.arange(seg_counter + 1, seg_counter + 1 + int(t), dtype=np.int32), fr))
        seg_counter += int(t)

        # --- bilinear pos-embed gather (HF fast_pos_embed_interpolate) ---
        h_idx = np.linspace(0, G - 1, hh, dtype=np.float32)
        w_idx = np.linspace(0, G - 1, ww, dtype=np.float32)
        h_fl = h_idx.astype(np.int32)
        w_fl = w_idx.astype(np.int32)
        h_ce = np.clip(h_fl + 1, None, G - 1)
        w_ce = np.clip(w_fl + 1, None, G - 1)
        dh, dw = h_idx - h_fl, w_idx - w_fl
        idx4 = np.stack([
            (h_fl[:, None] * G + w_fl[None, :]).ravel(),
            (h_fl[:, None] * G + w_ce[None, :]).ravel(),
            (h_ce[:, None] * G + w_fl[None, :]).ravel(),
            (h_ce[:, None] * G + w_ce[None, :]).ravel(),
        ]).astype(np.int32)  # [4, h*w] row-major
        w4 = np.stack([
            ((1 - dh)[:, None] * (1 - dw)[None, :]).ravel(),
            ((1 - dh)[:, None] * dw[None, :]).ravel(),
            (dh[:, None] * (1 - dw)[None, :]).ravel(),
            (dh[:, None] * dw[None, :]).ravel(),
        ]).astype(np.float32)

        # merge-block permutation: row-major (h, w) -> (h/m, w/m, m, m) order
        perm = (
            np.arange(hh * ww)
            .reshape(hh // m, m, ww // m, m)
            .transpose(0, 2, 1, 3)
            .ravel()
        )
        idx4 = np.tile(idx4[:, perm], (1, t))
        w4 = np.tile(w4[:, perm], (1, t))
        idxs.append(idx4)
        ws.append(w4)

        # --- 2D rope coords, merge-block order (HF rot_pos_emb) ---
        rows = np.arange(hh).repeat(ww).reshape(hh, ww)
        cols = np.tile(np.arange(ww), (hh, 1))
        rc = np.stack([rows.ravel()[perm], cols.ravel()[perm]], axis=-1)
        coords.append(np.tile(rc, (t, 1)).astype(np.int32))

    seg_ids = np.concatenate(segs) if segs else np.zeros(0, np.int32)
    pos_idx = np.concatenate(idxs, axis=1) if idxs else np.zeros((4, 0), np.int32)
    pos_w = np.concatenate(ws, axis=1) if ws else np.zeros((4, 0), np.float32)
    rope_coords = np.concatenate(coords) if coords else np.zeros((0, 2), np.int32)
    P = seg_ids.shape[0]
    if pad_to is not None and pad_to > P:
        pad = pad_to - P
        seg_ids = np.pad(seg_ids, (0, pad))
        pos_idx = np.pad(pos_idx, ((0, 0), (0, pad)))
        pos_w = np.pad(pos_w, ((0, 0), (0, pad)))
        rope_coords = np.pad(rope_coords, ((0, pad), (0, 0)))
    return {"seg_ids": seg_ids, "pos_idx": pos_idx, "pos_w": pos_w,
            "rope_coords": rope_coords}


def prep_mrope_position_ids(
    token_ids: np.ndarray,
    grid_thw: np.ndarray,
    merge_size: int,
    image_token_id: int,
    video_token_id: int,
) -> np.ndarray:
    """[3, L] (t, h, w) positions for one UNPACKED sample — text tokens run
    sequentially (equal t/h/w), each vision block gets grid positions offset
    from the preceding text, and text resumes at max+1 (HF get_rope_index
    semantics; videos are pre-split to t=1 grids by the caller)."""
    L = len(token_ids)
    pos = np.zeros((3, L), np.int64)
    is_vis = (token_ids == image_token_id) | (token_ids == video_token_id)
    grid_iter = iter(np.asarray(grid_thw, np.int64))
    st, st_idx = 0, 0
    i = 0
    while i < L:
        if not is_vis[i]:
            i += 1
            continue
        # text span [st, i)
        text_len = i - st
        g = next(grid_iter, None)
        if g is None:
            # more vision-token runs than provided grids: a sampled/spurious
            # image token in an RL completion — treat the rest as plain text
            break
        pos[:, st:i] = np.arange(st_idx, st_idx + text_len)
        st_idx += text_len
        t, hh, ww = g
        gh, gw = int(hh) // merge_size, int(ww) // merge_size
        n = int(t) * gh * gw
        t_ix = np.arange(t).repeat(gh * gw)
        h_ix = np.tile(np.arange(gh).repeat(gw), int(t))
        w_ix = np.tile(np.arange(gw), int(t) * gh)
        m = min(n, L - i)  # a truncated sample may cut a vision block short
        pos[0, i : i + m] = st_idx + t_ix[:m]
        pos[1, i : i + m] = st_idx + h_ix[:m]
        pos[2, i : i + m] = st_idx + w_ix[:m]
        st_idx = st_idx + int(max(t - 1, gh - 1, gw - 1)) + 1
        i += m
        st = i
    if st < L:
        pos[:, st:L] = np.arange(st_idx, st_idx + (L - st))
    return pos.astype(np.int32)


def prep_image_slots(token_ids: np.ndarray, image_token_id: int,
                     video_token_id: int, base: int = 0,
                     max_slots: int | None = None) -> np.ndarray:
    """[L] int32: for each vision-token position, its row in the merged
    image-embed buffer (``base`` offsets into the micro-batch-wide buffer);
    -1 elsewhere — the in-model inject mask is ``slot >= 0``. ``max_slots``
    caps assignment at the merged-row count the grids actually provide, so
    sampled/spurious image tokens in an RL completion stay plain text."""
    is_vis = (token_ids == image_token_id) | (token_ids == video_token_id)
    slots = np.full(len(token_ids), -1, np.int32)
    vis_idx = np.nonzero(is_vis)[0]
    if max_slots is not None:
        vis_idx = vis_idx[:max_slots]
    slots[vis_idx] = base + np.arange(len(vis_idx), dtype=np.int32)
    return slots


def mrope_dim_select(mrope_section: tuple[int, ...], rot_half: int) -> np.ndarray:
    """Static [rot_half] array in {0,1,2}: which of (t,h,w) each frequency
    index reads — the interleaved-mRoPE layout (HF apply_interleaved_mrope:
    H at indices 1,4,7,…<3·sec[1], W at 2,5,8,…<3·sec[2], T elsewhere)."""
    sel = np.zeros(rot_half, np.int32)
    for dim, off in ((1, 1), (2, 2)):
        end = min(3 * mrope_section[dim], rot_half)
        sel[off:end:3] = dim
    return sel
