"""Ring-attention context parallelism: KV blocks rotate around the context
axis while each rank's queries accumulate online-softmax partials.

TPU-native re-design of the reference's ring-flash-attn integration
(reference: models/layers/ring_attn.py:1-606, rl/train.py:201-227): instead
of a CUDA ring library, a ``shard_map`` whose body runs cp steps of

    attend(local q, visiting kv) → online-softmax merge → ppermute kv

over the ICI ring. Sequence layout is contiguous by rank (rank r holds
tokens [r·Lc, (r+1)·Lc)); causality is enforced per-origin with global
position offsets. Zigzag load balancing is a planned refinement — this form
is correct and keeps collectives rotation-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, seg_q, seg_kv, q_pos0, kv_pos0, causal):
    """One (local q) x (visiting kv) partial: returns (scores_max [B,H,Lq],
    exp-sum [B,H,Lq], weighted values [B,H,Lq,D]) in f32."""
    b, lq, nh, hd = q.shape
    lk = k.shape[1]
    nkv = k.shape[2]
    group = nh // nkv
    qf = q.astype(jnp.float32) * (hd ** -0.5)
    kf = k.astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qf,
                   jnp.repeat(kf, group, axis=2) if group > 1 else kf)
    mask = (seg_q[:, :, None] == seg_kv[:, None, :]) & (seg_q[:, :, None] != 0)
    if causal:
        q_ids = q_pos0 + jnp.arange(lq)
        k_ids = kv_pos0 + jnp.arange(lk)
        mask = mask & (q_ids[:, None] >= k_ids[None, :])[None]
    s = jnp.where(mask[:, None, :, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)  # [B, H, Lq]
    p = jnp.exp(s - m[..., None])
    p = jnp.where(mask[:, None, :, :], p, 0.0)
    l = jnp.sum(p, axis=-1)
    vf = v.astype(jnp.float32)
    pv = jnp.einsum("bhqk,bkhd->bhqd", p, jnp.repeat(vf, group, axis=2) if group > 1 else vf)
    return m, l, pv


def ring_attention(
    q: jax.Array,  # [B, L, NH, HD] global; L sharded over `axis`
    k: jax.Array,  # [B, L, NKV, HD]
    v: jax.Array,
    segment_ids: jax.Array,  # [B, L]
    mesh: Mesh,
    *,
    axis: str = "context",
    causal: bool = True,
) -> jax.Array:
    cp = mesh.shape[axis]
    if cp == 1:
        from prime_rl_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, segment_ids, segment_ids, causal=causal)

    b, l, nh, hd = q.shape
    lc = l // cp
    dp = mesh.shape["replica"] * mesh.shape["fsdp"]
    batch_axes = ("replica", "fsdp") if b % dp == 0 else None
    spec = P(batch_axes, axis, None, None)
    sspec = P(batch_axes, axis)

    def body(q_l, k_l, v_l, seg_l):
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % cp) for i in range(cp)]  # rotate kv to the right
        q_pos0 = my * lc

        m_acc = jnp.full((q_l.shape[0], nh, lc), NEG_INF, jnp.float32)
        l_acc = jnp.zeros((q_l.shape[0], nh, lc), jnp.float32)
        o_acc = jnp.zeros((q_l.shape[0], nh, lc, hd), jnp.float32)

        k_v, v_v, seg_v = k_l, v_l, seg_l
        origin = my
        for step in range(cp):
            kv_pos0 = origin * lc
            m_b, l_b, pv_b = _block_attend(q_l, k_v, v_v, seg_l, seg_v,
                                           q_pos0, kv_pos0, causal)
            m_new = jnp.maximum(m_acc, m_b)
            alpha = jnp.exp(m_acc - m_new)
            beta = jnp.exp(m_b - m_new)
            l_acc = l_acc * alpha + l_b * beta
            o_acc = o_acc * alpha[..., None] + pv_b * beta[..., None]
            m_acc = m_new
            if step < cp - 1:
                k_v = jax.lax.ppermute(k_v, axis, perm)
                v_v = jax.lax.ppermute(v_v, axis, perm)
                seg_v = jax.lax.ppermute(seg_v, axis, perm)
                origin = (origin - 1) % cp

        l_safe = jnp.where(l_acc > 0, l_acc, 1.0)
        out = (o_acc / l_safe[..., None]).transpose(0, 2, 1, 3)  # [B, Lq, H, D]
        return out.astype(q_l.dtype)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, sspec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, segment_ids)
