"""Ulysses context parallelism: all-to-all heads↔sequence so any local
attention kernel runs unsharded on full sequences.

TPU-native re-design of the reference's ulysses_attn.py:1-345 (torch
all-to-all + flash-attn): a ``shard_map`` over the ``context`` mesh axis
whose body is

    [B, L/c, H, D] --all_to_all--> [B, L, H/c, D] --local flash-- -->
    [B, L, H/c, D] --all_to_all--> [B, L/c, H, D]

with GQA KV-head replication when the local KV-head count doesn't divide the
context degree (reference: ulysses_attn.py:1-70). The collectives ride the
ICI mesh; XLA differentiates through them (all_to_all is its own transpose).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from prime_rl_tpu.ops.attention import repeat_kv, xla_attention


def _local_attention(q, k, v, segment_ids, causal, impl, block_q, block_kv,
                     window=0, sinks=None):
    if impl == "pallas":
        from prime_rl_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, segment_ids, causal=causal,
                               block_q=block_q, block_kv=block_kv,
                               window=window, sinks=sinks)
    return xla_attention(q, k, v, segment_ids, segment_ids, causal=causal,
                         window=window, sinks=sinks)


def ulysses_attention(
    q: jax.Array,  # [B, L, NH, HD] (global view; L sharded over `axis`)
    k: jax.Array,  # [B, L, NKV, HD]
    v: jax.Array,
    segment_ids: jax.Array,  # [B, L]
    mesh: Mesh,
    *,
    axis: str = "context",
    causal: bool = True,
    impl: str = "xla",
    block_q: int = 512,
    block_kv: int = 512,
    window: int = 0,  # static sliding window (0 = full)
    sinks: jax.Array | None = None,  # [NH] sink logits, sliced per head group
) -> jax.Array:
    cp = mesh.shape[axis]
    if cp == 1:
        return _local_attention(q, k, v, segment_ids, causal, impl, block_q, block_kv,
                                window=window, sinks=sinks)

    b, l, nh, hd = q.shape
    nkv = k.shape[2]
    if nh % cp:
        raise ValueError(f"num_heads {nh} must divide context degree {cp}")
    kv_rep = cp // math.gcd(nkv, cp)  # replicate KV heads so cp | nkv*kv_rep

    # batch sharding over the data axes only when divisible; heads stay
    # unsharded by tensor inside the wrapper (robust across head counts)
    dp = mesh.shape["replica"] * mesh.shape["fsdp"]
    batch_axes = ("replica", "fsdp") if b % dp == 0 else None
    qspec = P(batch_axes, axis, None, None)
    sspec = P(batch_axes, axis)

    def body(q_l, k_l, v_l, seg_l, sinks_l):
        # local: [B', Lc, NH, HD]
        k_l = repeat_kv(k_l, kv_rep)
        v_l = repeat_kv(v_l, kv_rep)
        # heads -> seq: split heads into cp groups, gather full sequence
        q_g = jax.lax.all_to_all(q_l, axis, split_axis=2, concat_axis=1, tiled=True)
        k_g = jax.lax.all_to_all(k_l, axis, split_axis=2, concat_axis=1, tiled=True)
        v_g = jax.lax.all_to_all(v_l, axis, split_axis=2, concat_axis=1, tiled=True)
        seg_g = jax.lax.all_gather(seg_l, axis, axis=1, tiled=True)  # [B', L]
        o_g = _local_attention(q_g, k_g, v_g, seg_g, causal, impl, block_q, block_kv,
                               window=window,
                               sinks=None if sinks is None else sinks_l)
        # seq -> heads
        return jax.lax.all_to_all(o_g, axis, split_axis=1, concat_axis=2, tiled=True)

    # sinks shard over the context axis exactly like the all-to-all splits
    # query heads: contiguous head blocks per device
    if sinks is None:
        sinks_in = jnp.zeros((cp,), jnp.float32)  # placeholder, unused
        sinks_spec = P(axis)
    else:
        sinks_in = sinks
        sinks_spec = P(axis)
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(qspec, qspec, qspec, sspec, sinks_spec),
        out_specs=qspec,
        check_vma=False,
    )(q, k, v, segment_ids, sinks_in)
