"""Attention ops for packed sequences.

Packed-sequence convention: a micro-batch is ``[B, L]`` of concatenated
sequences; ``segment_ids [B, L]`` (int32, 0 = padding) delimit them and
``position_ids`` restart per sequence. Attention is causal *within* a
segment. This is the static-shape TPU analogue of the reference's
cu_seqlens/varlen flash-attention path (reference: trainer/batch.py,
utils/sequence.py).

Two implementations with identical semantics:
  - ``xla_attention``: einsum + masked softmax. Runs everywhere (CPU tests);
    XLA fuses it decently but materializes [B, H, L, L] — fine for short L.
  - ``flash_attention`` (ops/flash_attention.py): Pallas TPU kernel, online
    softmax, block-skipping. Used on TPU via ``attention()`` dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def segment_mask(seg_q: jax.Array, seg_kv: jax.Array, causal: bool = True) -> jax.Array:
    """[B, Lq] x [B, Lk] -> bool [B, 1, Lq, Lk]; True = attend.

    Padding (segment id 0) attends nowhere and is attended by nothing.
    """
    valid = (seg_q[:, :, None] == seg_kv[:, None, :]) & (seg_q[:, :, None] != 0)
    if causal:
        lq, lk = seg_q.shape[1], seg_kv.shape[1]
        # positions are the packed stream offsets (queries at the tail for decode)
        q_pos = jnp.arange(lq)[:, None] + (lk - lq)
        k_pos = jnp.arange(lk)[None, :]
        valid = valid & (q_pos >= k_pos)
    return valid[:, None, :, :]


def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, L, NKV, HD] -> [B, L, NKV*n_rep, HD] for GQA."""
    if n_rep == 1:
        return x
    b, l, nkv, hd = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, l, nkv, n_rep, hd)).reshape(b, l, nkv * n_rep, hd)


def xla_attention(
    q: jax.Array,  # [B, Lq, NH, HD]
    k: jax.Array,  # [B, Lk, NKV, HD]
    v: jax.Array,  # [B, Lk, NKV, HD]
    segment_ids_q: jax.Array,  # [B, Lq] int32
    segment_ids_kv: jax.Array,  # [B, Lk] int32
    causal: bool = True,
    scale: float | None = None,
    window: jax.Array | int = 0,  # sliding window; 0/traced-0 = full attention
    sinks: jax.Array | None = None,  # [NH] learned sink logits (gpt-oss style)
) -> jax.Array:
    nh, nkv = q.shape[2], k.shape[2]
    k = repeat_kv(k, nh // nkv)
    v = repeat_kv(v, nh // nkv)
    if scale is None:
        scale = q.shape[-1] ** -0.5
    # [B, NH, Lq, Lk] scores in fp32 for numerically stable softmax
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    mask = segment_mask(segment_ids_q, segment_ids_kv, causal)
    lq, lk = q.shape[1], k.shape[1]
    q_pos = jnp.arange(lq)[:, None] + (lk - lq)
    k_pos = jnp.arange(lk)[None, :]
    win = jnp.asarray(window)
    in_window = (win <= 0) | (q_pos - k_pos < win)
    mask = mask & in_window[None, None, :, :]
    scores = jnp.where(mask, scores, NEG_INF)
    if sinks is not None:
        # sink = a virtual token with learned logit and zero value: it joins
        # the softmax denominator only
        m = jnp.maximum(jnp.max(scores, axis=-1, keepdims=True),
                        sinks.astype(jnp.float32)[None, :, None, None])
        p = jnp.exp(scores - m)
        denom = jnp.sum(p, axis=-1, keepdims=True) + jnp.exp(
            sinks.astype(jnp.float32)[None, :, None, None] - m
        )
        probs = (p / denom).astype(v.dtype)
    else:
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    segment_ids: jax.Array,
    causal: bool = True,
    scale: float | None = None,
    impl: str = "auto",
    block_q: int = 512,
    block_kv: int = 512,
    mesh=None,
    cp_axis: str = "context",
    cp_style: str = "ulysses",
    window: jax.Array | int = 0,
    sinks: jax.Array | None = None,
) -> jax.Array:
    """Self-attention dispatch for the training forward (Lq == Lk).

    With a ``mesh`` whose ``cp_axis`` degree > 1, runs context parallelism:
    ``ulysses`` (all-to-all heads↔seq) or ``ring`` (rotating KV blocks);
    otherwise a single-program kernel under GSPMD.

    Static int ``window`` and ``sinks`` run INSIDE the flash kernel (banded
    grid, sink folded into the online softmax) — models keep windows static
    by grouping layers (models/qwen3.py forward). A traced window is the
    only case that still falls back to the masked XLA kernel."""
    static_window = isinstance(window, int)
    if impl == "auto":
        impl = ("pallas" if q.shape[1] >= 512 and static_window
                and jax.default_backend() not in ("cpu",) else "xla")
    if not static_window:
        # traced window (legacy scan path): full-matrix mask is the only option
        return xla_attention(q, k, v, segment_ids, segment_ids, causal=causal,
                             scale=scale, window=window, sinks=sinks)
    if mesh is not None and mesh.shape.get(cp_axis, 1) > 1:
        if cp_style == "ring" and window == 0 and sinks is None:
            from prime_rl_tpu.ops.ring_attention import ring_attention

            return ring_attention(q, k, v, segment_ids, mesh, axis=cp_axis, causal=causal)
        from prime_rl_tpu.ops.ulysses import ulysses_attention

        return ulysses_attention(
            q, k, v, segment_ids, mesh, axis=cp_axis, causal=causal,
            impl=impl, block_q=block_q, block_kv=block_kv,
            window=window, sinks=sinks,
        )
    if impl == "pallas":
        from prime_rl_tpu.ops.flash_attention import flash_attention

        return flash_attention(
            q, k, v, segment_ids, causal=causal, scale=scale,
            block_q=block_q, block_kv=block_kv, window=window, sinks=sinks,
        )
    return xla_attention(q, k, v, segment_ids, segment_ids, causal=causal, scale=scale,
                         window=window, sinks=sinks)


def make_segment_ids(seq_lens: list[int], total_len: int) -> jax.Array:
    """Host helper: seq_lens -> int32 [total_len] segment ids (1-based, 0 pad)."""
    import numpy as np

    seg = np.zeros(total_len, dtype=np.int32)
    off = 0
    for i, n in enumerate(seq_lens):
        seg[off : off + n] = i + 1
        off += n
    return seg


def make_position_ids(seq_lens: list[int], total_len: int) -> jax.Array:
    import numpy as np

    pos = np.zeros(total_len, dtype=np.int32)
    off = 0
    for n in seq_lens:
        pos[off : off + n] = np.arange(n)
        off += n
    return pos
