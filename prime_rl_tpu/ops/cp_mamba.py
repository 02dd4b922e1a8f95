"""Context-parallel Mamba-2 SSD: sequence-sharded conv + chunked scan.

TPU-native replacement for the reference's cp_mamba.py:1-249 (torch
send/recv of conv halos and SSM states between CP ranks). Design:

- The sequence axis is sharded contiguously over the ``context`` mesh axis
  (the same layout Ulysses attention uses, so hybrid nemotron_h models can
  mix both in one mesh).
- Depthwise causal conv needs a K-1-token halo from the left neighbor:
  one ``ppermute`` of the tail columns (+ their segment ids, so taps never
  cross packed-segment boundaries — rank 0 receives zeros = no neighbor).
- The SSD is split into an initial-state-independent phase 1 (all the
  FLOPs: intra-chunk quadratic blocks, per-chunk states) that runs fully
  parallel, and a linear carry: each rank exports
  ``(final_state_with_zero_init, total_decay)``; after one ``all_gather``
  every rank computes its incoming carry in closed form (the recurrence
  ``carry_r = final0_{r-1} + decay_{r-1} * carry_{r-1}`` unrolled over the
  static CP degree) and finishes phase 2 locally. Packed-segment resets
  compose: a reset inside a rank drives its exported ``total_decay`` to
  exactly zero, killing any cross-rank carry, and the true neighbor
  segment id (ppermuted) distinguishes a segment continuing across the
  rank boundary from a fresh one starting there.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from prime_rl_tpu.ops.mamba import (
    _ssd_local_summary,
    _ssd_phase1,
    _ssd_phase2,
    causal_conv1d,
)


def conv_ssd_cp(
    xbc: jax.Array,  # [B, L, conv_dim] pre-conv (L sharded over `axis`)
    dt: jax.Array,  # [B, L, H] post-softplus
    segment_ids: jax.Array | None,  # [B, L]
    conv_w: jax.Array,  # [conv_dim, K]
    conv_b: jax.Array | None,
    a_log: jax.Array,  # [H]
    d_skip: jax.Array,  # [H]
    mesh: Mesh,
    *,
    axis: str = "context",
    num_heads: int,
    head_dim: int,
    ssm_state_size: int,
    n_groups: int,
    chunk_size: int,
) -> jax.Array:
    """conv -> silu -> SSD under context parallelism. Returns y [B, L, H, P]
    (f32), with L sharded exactly as the input."""
    cp = mesh.shape[axis]
    inter = num_heads * head_dim
    gn = n_groups * ssm_state_size

    b, l, conv_dim = xbc.shape
    k = conv_w.shape[1]
    if (l // cp) % chunk_size:
        raise ValueError(
            f"per-rank seq {l}/{cp} must be a multiple of chunk_size {chunk_size} "
            "(phase-1 padding would inject a spurious segment reset at the "
            "rank boundary)")

    dp = mesh.shape["replica"] * mesh.shape["fsdp"]
    batch_axes = ("replica", "fsdp") if b % dp == 0 else None
    xspec = P(batch_axes, axis, None)
    sspec = P(batch_axes, axis)
    wspec = P()
    perm = [(i, i + 1) for i in range(cp - 1)]  # left neighbor -> me

    if segment_ids is None:
        segment_ids = jnp.ones((b, l), jnp.int32)

    def body(xbc_l, dt_l, seg_l):
        # --- conv halo ---------------------------------------------------
        halo = jax.lax.ppermute(xbc_l[:, -(k - 1):], axis, perm)
        halo_seg = jax.lax.ppermute(seg_l[:, -(k - 1):], axis, perm)
        ext = jnp.concatenate([halo, xbc_l], axis=1)
        ext_seg = jnp.concatenate([halo_seg, seg_l], axis=1)
        conv = causal_conv1d(ext, conv_w, conv_b, ext_seg)[:, k - 1:]
        conv = jax.nn.silu(conv)
        bl, ll = xbc_l.shape[:2]  # local (batch, seq) shard sizes
        x = conv[..., :inter].reshape(bl, ll, num_heads, head_dim)
        b_in = conv[..., inter:inter + gn].reshape(bl, ll, n_groups, ssm_state_size)
        c_in = conv[..., inter + gn:].reshape(bl, ll, n_groups, ssm_state_size)

        # --- SSD phase 1 (parallel) + closed-form carry ------------------
        prev_tail = jax.lax.ppermute(seg_l[:, -1], axis, perm)  # [B], 0 @ rank 0
        pieces = _ssd_phase1(x, dt_l, a_log, b_in, c_in, d_skip, chunk_size,
                             seg_l, prev_seg_tail=prev_tail)
        final0, decay = _ssd_local_summary(pieces)
        finals = jax.lax.all_gather(final0, axis)  # [cp, B, H, P, N]
        decays = jax.lax.all_gather(decay, axis)  # [cp, B, H]
        carries = [jnp.zeros_like(final0)]
        for r in range(cp - 1):
            carries.append(finals[r] + decays[r][..., None, None] * carries[-1])
        my_carry = jnp.stack(carries)[jax.lax.axis_index(axis)]
        y, _ = _ssd_phase2(pieces, my_carry)
        return y

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(xspec, P(batch_axes, axis, None), sspec),
        out_specs=P(batch_axes, axis, None, None),
        check_vma=False,
    )(xbc, dt, segment_ids)
