"""DSA sparse MLA attention (GLM-4.6/5-class DeepSeek-sparse-attention).

Behavior parity targets: reference glm_moe_dsa/sparse_mla_attention.py
(Indexer.compute_sparse_indices, _SparseMLA), kernels/fp8_indexer.py
(I_{t,s} = sum_h w_{t,h} * relu(q_{t,h} . k_s), varlen [ks, ke) masking,
sentinel = S_k) and kernels/sparse_mla_fwd.py (attention over per-token
top-k gathered latent KV; sentinel entries masked to -inf).

TPU-first design:

- The indexer scores in **bfloat16 on the MXU** — the reference's FP8
  (UE8M0 per-token-group) quantization exists to hit H100 fp8 tensor cores;
  v5e/v6e have no fp8 units, and bf16 is both the native MXU dtype and
  strictly more accurate. Scoring is query-chunked (`lax.map`) with a
  head-loop (`lax.fori_loop`) so the [C, S_k] logits — never [S, H, S_k] —
  are the only materialized buffer.
- Sparse attention is a **chunked gather + online matmul**: for each query
  chunk, gather its top-k latent-KV rows ([C, T, 576] bf16) and run two
  MXU matmuls ([H,576]x[576,T] scores, [H,T]x[T,512] values) per token.
  `jax.checkpoint` around the chunk body re-gathers on the backward pass
  instead of storing every chunk's [C, T, 576] (the flash-attention memory
  treatment, applied to gathers).
- Everything is static-shape: top-k is a compile-time constant, invalid
  selections carry the sentinel index S_k which maps to an appended
  all-zero KV row and a -inf score (exactly the reference contract).

All functions take single-row inputs ([S, ...]); families vmap over the
packed batch dim.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def interleaved_rope(x: jax.Array, position_ids: jax.Array, inv_freq: jax.Array) -> jax.Array:
    """Interleaved (non-neox) rotary: pairs are (0,1), (2,3), ... and the
    output keeps the de-interleaved [evens', odds'] layout (HF
    apply_rotary_pos_emb_interleave — both q and k permute identically, so
    scores are unchanged by the basis).

    x: [S, H, d] or [S, d]; position_ids: [S]; inv_freq: [d//2].
    """
    angles = position_ids[:, None].astype(jnp.float32) * inv_freq  # [S, d//2]
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    if x.ndim == 3:
        cos, sin = cos[:, None, :], sin[:, None, :]
    xf = x.astype(jnp.float32)
    x0, x1 = xf[..., 0::2], xf[..., 1::2]
    out = jnp.concatenate([x0 * cos - x1 * sin, x1 * cos + x0 * sin], axis=-1)
    return out.astype(x.dtype)


def _pad_to(x: jax.Array, n: int, axis: int = 0, fill=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def mla_topk_indices(
    q_idx: jax.Array,  # [S, Hi, Di]
    k_idx: jax.Array,  # [Sk, Di]
    w: jax.Array,      # [S, Hi] per-head weights
    ks: jax.Array,     # [S] int32 first valid K index per query
    ke: jax.Array,     # [S] int32 one-past-last valid K index (causal incl. self)
    topk: int,
    chunk: int = 1024,
    method: str = "exact",
) -> jax.Array:
    """[S, topk] int32 selected K indices per query; sentinel = Sk for
    out-of-range / sub-topk slots (reference fp8_indexer semantics). The
    whole computation is gradient-free (reference wraps it in no_grad).

    ``method="approx"`` uses the TPU's hardware-accelerated partial-
    reduction top-k (`jax.lax.approx_max_k`, ~0.95 recall) — DSA is itself
    an approximation, and the reference's fp8 indexer scores are noisier
    than a 5% recall miss; exact is the default for parity tests."""
    q_idx, k_idx, w = map(jax.lax.stop_gradient, (q_idx, k_idx, w))
    S, Hi, Di = q_idx.shape
    Sk = k_idx.shape[0]
    chunk = min(chunk, S)
    n_pad = -(-S // chunk) * chunk
    qp = _pad_to(q_idx, n_pad).reshape(-1, chunk, Hi, Di)
    wp = _pad_to(w, n_pad).reshape(-1, chunk, Hi)
    ksp = _pad_to(ks, n_pad, fill=0).reshape(-1, chunk)
    kep = _pad_to(ke, n_pad, fill=0).reshape(-1, chunk)
    k_eff = min(topk, Sk)
    kT = k_idx.astype(jnp.bfloat16).T  # [Di, Sk]
    pos = jnp.arange(Sk, dtype=jnp.int32)

    def body(args):
        qc, wc, ksc, kec = args  # [C,Hi,Di], [C,Hi], [C], [C]
        qc = qc.astype(jnp.bfloat16)

        def head(i, acc):
            s = jnp.dot(qc[:, i], kT, preferred_element_type=jnp.float32)  # [C, Sk]
            return acc + wc[:, i, None].astype(jnp.float32) * jnp.maximum(s, 0.0)

        logits = jax.lax.fori_loop(0, Hi, head, jnp.zeros((chunk, Sk), jnp.float32))
        valid = (pos[None, :] >= ksc[:, None]) & (pos[None, :] < kec[:, None])
        logits = jnp.where(valid, logits, NEG_INF)
        if method == "approx":
            val, idx = jax.lax.approx_max_k(logits, k_eff, recall_target=0.95)
        else:
            val, idx = jax.lax.top_k(logits, k_eff)
        idx = jnp.where(val > NEG_INF / 2, idx, Sk).astype(jnp.int32)
        return _pad_to(idx, topk, axis=1, fill=Sk)

    out = jax.lax.map(body, (qp, wp, ksp, kep))
    return out.reshape(n_pad, topk)[:S]


def mla_topk_thresholds(
    q_idx: jax.Array,  # [S, Hi, Di]
    k_idx: jax.Array,  # [Sk, Di]
    w: jax.Array,      # [S, Hi]
    ks: jax.Array,     # [S]
    ke: jax.Array,     # [S]
    topk: int,
    chunk: int = 1024,
) -> jax.Array:
    """[S] f32 per-token k-th-largest valid indexer logit.

    The threshold form of the reference top-k contract
    (kernels/fp8_indexer.py): an entry is selected iff its logit >= tau and
    it lies in [ks, ke). Tokens with fewer than ``topk`` valid entries get
    tau = NEG_INF, selecting exactly the valid set (the sentinel-drop
    semantics). Used by the fused Pallas DSA kernel, which recomputes the
    logits tile-wise on the MXU instead of gathering top-k rows — gathers
    are HBM-hostile on TPU, dense recompute is nearly free."""
    q_idx, k_idx, w = map(jax.lax.stop_gradient, (q_idx, k_idx, w))
    S, Hi, Di = q_idx.shape
    Sk = k_idx.shape[0]
    chunk = min(chunk, S)
    n_pad = -(-S // chunk) * chunk
    qp = _pad_to(q_idx, n_pad).reshape(-1, chunk, Hi, Di)
    wp = _pad_to(w, n_pad).reshape(-1, chunk, Hi)
    ksp = _pad_to(ks, n_pad, fill=0).reshape(-1, chunk)
    kep = _pad_to(ke, n_pad, fill=0).reshape(-1, chunk)
    k_eff = min(topk, Sk)
    kT = k_idx.astype(jnp.bfloat16).T
    pos = jnp.arange(Sk, dtype=jnp.int32)

    def body(args):
        qc, wc, ksc, kec = args
        qc = qc.astype(jnp.bfloat16)

        def head(i, acc):
            s = jnp.dot(qc[:, i], kT, preferred_element_type=jnp.float32)
            return acc + wc[:, i, None].astype(jnp.float32) * jnp.maximum(s, 0.0)

        logits = jax.lax.fori_loop(0, Hi, head, jnp.zeros((chunk, Sk), jnp.float32))
        valid = (pos[None, :] >= ksc[:, None]) & (pos[None, :] < kec[:, None])
        logits = jnp.where(valid, logits, NEG_INF)
        kth = jax.lax.top_k(logits, k_eff)[0][:, -1]
        return jnp.where(kth > NEG_INF / 2, kth, NEG_INF)

    out = jax.lax.map(body, (qp, wp, ksp, kep))
    return out.reshape(n_pad)[:S]


def sparse_mla_attention(
    q: jax.Array,        # [S, H, Dq] (absorbed latent + rope tail)
    kv: jax.Array,       # [Sk, Dq] latent KV (no sentinel row — appended here)
    indices: jax.Array,  # [S, topk] int32, sentinel = Sk
    sm_scale: float,
    v_dim: int,
    chunk: int = 256,
) -> jax.Array:
    """[S, H, v_dim]: softmax over each query's top-k gathered latent rows;
    value = the first ``v_dim`` channels of the gathered row (absorbed MLA —
    reference sparse_mla_fwd o_shape)."""
    S, H, Dq = q.shape
    Sk = kv.shape[0]
    kv_s = jnp.concatenate([kv, jnp.zeros((1, Dq), kv.dtype)], axis=0)  # sentinel row
    chunk = min(chunk, S)
    n_pad = -(-S // chunk) * chunk
    qp = _pad_to(q, n_pad).reshape(-1, chunk, H, Dq)
    ip = _pad_to(indices, n_pad, fill=Sk).reshape(-1, chunk, indices.shape[1])

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def body(args):
        qc, ic = args  # [C, H, Dq], [C, T]
        kvg = jnp.take(kv_s, ic, axis=0)  # [C, T, Dq]
        s = jnp.einsum("chd,ctd->cht", qc.astype(jnp.bfloat16), kvg.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32) * sm_scale
        s = jnp.where((ic < Sk)[:, None, :], s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - jnp.maximum(m, NEG_INF / 2))
        l = jnp.sum(p, axis=-1, keepdims=True)
        p = p / jnp.maximum(l, 1e-30)
        o = jnp.einsum("cht,ctd->chd", p.astype(kvg.dtype), kvg[..., :v_dim],
                       preferred_element_type=jnp.float32)
        return o.astype(q.dtype)

    out = jax.lax.map(body, (qp, ip))
    return out.reshape(n_pad, H, v_dim)[:S]


def dense_mla_attention(
    q: jax.Array,            # [S, H, Dq]
    kv: jax.Array,           # [Sk, Dq]
    segment_ids: jax.Array,  # [S] (0 = pad), shared q/k coordinates (Sk == S)
    sm_scale: float,
    v_dim: int,
) -> jax.Array:
    """Full causal+segment-masked MLA attention (absorbed form) — the
    index_topk >= S limit of the sparse path; used for parity tests and as
    the deepseek_v3 (non-DSA) attention."""
    S = q.shape[0]
    pos = jnp.arange(S)
    mask = (
        (pos[:, None] >= pos[None, :])
        & (segment_ids[:, None] == segment_ids[None, :])
        & (segment_ids > 0)[:, None]
    )
    s = jnp.einsum("shd,td->sht", q.astype(jnp.bfloat16), kv.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32) * sm_scale
    s = jnp.where(mask[:, None, :], s, NEG_INF)  # mask [S, Sk] broadcast over H
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - jnp.maximum(m, NEG_INF / 2))
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / jnp.maximum(l, 1e-30)
    o = jnp.einsum("sht,td->shd", p.astype(kv.dtype), kv[:, :v_dim],
                   preferred_element_type=jnp.float32)
    return o.astype(q.dtype)
