"""Ring-attention context parallelism: KV blocks rotate around the context
axis while each rank's queries accumulate online-softmax partials.

TPU-native re-design of the reference's ring-flash-attn integration
(reference: models/layers/ring_attn.py:1-606, rl/train.py:201-227):

- **flash inner kernel**: every (q-chunk, kv-chunk) pair runs the Pallas
  flash kernel (``flash_attention_with_lse``) and partials merge exactly via
  their lse — nothing materializes [Lq, Lkv] scores (the r1 einsum fallback
  did, and 64k CP ran at XLA-attention speed).
- **zigzag layout**: the global sequence is split into 2·cp chunks and rank
  r works on chunks (r, 2cp-1-r), so every rank does the same amount of
  causal work — the contiguous layout made the last rank attend cp blocks
  while rank 0 attended one, and the ring ran at straggler speed. The
  zigzag exchange is two half-chunk ppermutes in and one pair out; the
  kv rotation stays rotation-only on the ICI ring.

Gradients flow through the flash custom VJP (lse cotangent folded into
delta) and through the ppermutes (their own transpose).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30


def _fit_block(n: int, want: int) -> int:
    b = min(want, n)
    while n % b:
        b //= 2
    return max(b, 1)


def _merge(o_acc, lse_acc, o_new, lse_new):
    """Exact online merge of two normalized partials via their lse.
    o: [B, Lq, H, D]; lse: [B, H, Lq]."""
    m = jnp.maximum(lse_acc, lse_new)
    w_old = jnp.exp(lse_acc - m)
    w_new = jnp.exp(lse_new - m)
    den = w_old + w_new
    den_safe = jnp.where(den > 0, den, 1.0)
    scale_old = jnp.swapaxes(w_old / den_safe, 1, 2)[..., None]  # [B, Lq, H, 1]
    scale_new = jnp.swapaxes(w_new / den_safe, 1, 2)[..., None]
    o = o_acc * scale_old + o_new * scale_new
    lse = jnp.where(den > 0, m + jnp.log(den_safe), NEG_INF)
    return o, lse


def ring_attention(
    q: jax.Array,  # [B, L, NH, HD] global; L sharded over `axis`
    k: jax.Array,  # [B, L, NKV, HD]
    v: jax.Array,
    segment_ids: jax.Array,  # [B, L]
    mesh: Mesh,
    *,
    axis: str = "context",
    causal: bool = True,
    block_q: int = 512,
    block_kv: int = 512,
) -> jax.Array:
    from prime_rl_tpu.ops.flash_attention import flash_attention_with_lse

    cp = mesh.shape[axis]
    if cp == 1:
        from prime_rl_tpu.ops.attention import xla_attention

        return xla_attention(q, k, v, segment_ids, segment_ids, causal=causal)

    b, l, nh, hd = q.shape
    lc = l // cp
    h = lc // 2  # zigzag half-chunk
    if lc % 2:
        raise ValueError(f"ring attention needs an even per-rank length, got {lc}")
    dp = mesh.shape["replica"] * mesh.shape["fsdp"]
    batch_axes = ("replica", "fsdp") if b % dp == 0 else None
    spec = P(batch_axes, axis, None, None)
    sspec = P(batch_axes, axis)
    bq = _fit_block(h, block_q)
    bkv = _fit_block(h, block_kv)

    # half-chunk routing tables (static): contiguous rank s holds global
    # chunks (2s, 2s+1); zigzag rank of chunk c is c if c < cp else 2cp-1-c
    def zrank(c: int) -> int:
        return c if c < cp else 2 * cp - 1 - c

    perm_low = [(s, zrank(2 * s)) for s in range(cp)]  # each rank's low half
    perm_high = [(s, zrank(2 * s + 1)) for s in range(cp)]
    inv_low = [(d, s) for s, d in perm_low]
    inv_high = [(d, s) for s, d in perm_high]

    def to_zigzag(x_l, seq_axis=1):
        """[.., lc, ..] contiguous halves -> this rank's zigzag (low, high)."""
        lo, hi = jnp.split(x_l, 2, axis=seq_axis)
        recv_lo = jax.lax.ppermute(lo, axis, perm_low)  # carries chunk 2s
        recv_hi = jax.lax.ppermute(hi, axis, perm_high)  # carries chunk 2s+1
        my = jax.lax.axis_index(axis)
        # zigzag low chunk (global idx my) came from the low-half route iff
        # my is even; the high chunk (idx 2cp-1-my) from the other route
        low = jnp.where(my % 2 == 0, recv_lo, recv_hi)
        high = jnp.where(my % 2 == 0, recv_hi, recv_lo)
        return low, high

    def from_zigzag(low, high, seq_axis=1):
        my = jax.lax.axis_index(axis)
        send_lo = jnp.where(my % 2 == 0, low, high)  # chunk 2·my travels back
        send_hi = jnp.where(my % 2 == 0, high, low)
        back_lo = jax.lax.ppermute(send_lo, axis, inv_low)
        back_hi = jax.lax.ppermute(send_hi, axis, inv_high)
        return jnp.concatenate([back_lo, back_hi], axis=seq_axis)

    def body(q_l, k_l, v_l, seg_l):
        my = jax.lax.axis_index(axis)
        qa, qb = to_zigzag(q_l)
        ka, kb = to_zigzag(k_l)
        va, vb = to_zigzag(v_l)
        sa, sb = to_zigzag(seg_l)
        ga = my  # global chunk index of the low q chunk
        gb = 2 * cp - 1 - my  # .. of the high q chunk

        def pair(qc, sc, kc, vc, skc, gq, gkv):
            """One (q-chunk, kv-chunk) flash partial with the right causal
            relation: diagonal / full / skip, decided at runtime on the
            traced chunk indices."""
            def diag(_):
                return flash_attention_with_lse(qc, kc, vc, sc, skc, causal=True,
                                                block_q=bq, block_kv=bkv)

            def full(_):
                return flash_attention_with_lse(qc, kc, vc, sc, skc, causal=False,
                                                block_q=bq, block_kv=bkv)

            def skip(_):
                return (jnp.zeros_like(qc),
                        jnp.full((qc.shape[0], nh, h), NEG_INF, jnp.float32))

            if not causal:
                return full(None)
            # gq == gkv -> diagonal; gq > gkv -> fully visible; else skip
            return jax.lax.cond(
                gq == gkv, diag,
                lambda _: jax.lax.cond(gq > gkv, full, skip, None),
                None,
            )

        o_lo = jnp.zeros((q_l.shape[0], h, nh, hd), jnp.float32)
        o_hi = jnp.zeros((q_l.shape[0], h, nh, hd), jnp.float32)
        lse_lo = jnp.full((q_l.shape[0], nh, h), NEG_INF, jnp.float32)
        lse_hi = jnp.full((q_l.shape[0], nh, h), NEG_INF, jnp.float32)

        rot = [(i, (i + 1) % cp) for i in range(cp)]  # rotate kv to the right
        kva, kvb, vva, vvb, ska, skb = ka, kb, va, vb, sa, sb
        origin = my
        for step in range(cp):
            oa = origin  # visiting low chunk's global index
            ob = 2 * cp - 1 - origin
            for (kc, vc, skc, gkv) in ((kva, vva, ska, oa), (kvb, vvb, skb, ob)):
                o_n, lse_n = pair(qa, sa, kc, vc, skc, ga, gkv)
                o_lo, lse_lo = _merge(o_lo, lse_lo, o_n.astype(jnp.float32), lse_n)
                o_n, lse_n = pair(qb, sb, kc, vc, skc, gb, gkv)
                o_hi, lse_hi = _merge(o_hi, lse_hi, o_n.astype(jnp.float32), lse_n)
            if step < cp - 1:
                kva = jax.lax.ppermute(kva, axis, rot)
                kvb = jax.lax.ppermute(kvb, axis, rot)
                vva = jax.lax.ppermute(vva, axis, rot)
                vvb = jax.lax.ppermute(vvb, axis, rot)
                ska = jax.lax.ppermute(ska, axis, rot)
                skb = jax.lax.ppermute(skb, axis, rot)
                origin = (origin - 1) % cp

        return from_zigzag(o_lo, o_hi).astype(q_l.dtype)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec, sspec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v, segment_ids)
