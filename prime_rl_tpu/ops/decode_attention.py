"""Pallas decode-time paged attention with fused KV-cache append.

The serving engine's decode step calls attention once per layer over the
paged KV pool (reference behavior: vLLM's paged attention inside the decode
forward; SURVEY.md §2.4 "vLLM" row). Stock kernels
(``jax.experimental.pallas.ops.tpu.paged_attention`` / ``ragged_paged_
attention``) spend ~0.45-1.1 ms *per call* at RL-serving shapes (32 slots,
short-to-mid contexts): their grids run hundreds of tiny steps (kv_head x
slot x page-block) each with fixed Mosaic step cost. The XLA scatter that
appends the new token's K/V (32 sequential dynamic-update-slices per pool)
costs as much again. At 28 layers that is the entire decode budget.

This kernel:
  - runs ONE grid step per slot and hides DMA latency by prefetching the
    NEXT slot's first page block from the current step (Pallas scratch
    persists across sequential grid steps, so a 2-deep ring carries the
    lookahead) — Mosaic's grid machinery keeps per-step fixed cost ~1us
    where a software fori-loop worklist pays ~10x that in scalar control;
  - fuses the new token's K/V append as an aligned-subtile read-modify-write
    (HBM tiling forbids single-row DMA): the RMW read is prefetched a step
    ahead, the write-back completes by the final grid step, and the new
    token's attention contribution comes from VMEM directly — no XLA
    scatter, no write-before-read ordering constraint;
  - folds GQA, sliding windows (block-skipped below the window) and
    attention sinks (gpt-oss) so no layer falls back to a gather path.

The RMW write-back races other slots' page fetches benignly: prefix rows
are rewritten byte-identical and the new row (position ``n``) is masked out
of every score pass (reads mask to < n).

Layout contract (matches sampler/cache.KVPool):
  q, k_new, v_new  [S, NH|NKV, HD]   one new token per slot
  k/v pool         [NKV, NP, PS, HD] paged, per layer (aliased in/out)
  lengths          [S] int32         tokens in cache BEFORE the new one
  page_table       [S, P] int32      pages owned by each slot, in order
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    lengths_ref,     # [S] int32: cache tokens BEFORE the new one
    table_ref,       # [S, P] int32
    # inputs
    q_ref,           # [1, NH, HD] VMEM (this slot's query)
    k_new_ref,       # [1, NKV, HD] VMEM
    v_new_ref,
    sinks_ref,       # [1, NH] f32 VMEM
    k_hbm,           # [NKV, NP, PS, HD] ANY (aliased to output)
    v_hbm,
    # outputs
    o_ref,           # [1, NH, HD] VMEM
    k_out,           # aliased pool refs (the alias makes the in-kernel
    v_out,           # write DMAs visible to XLA)
    # scratch (persists across grid steps — carries the cross-slot lookahead)
    k_buf,           # [2, NKV, BP, PS, HD] VMEM ring: block 0 of slot s
    v_buf,
    kt_buf,          # [2, NKV, BP, PS, HD] VMEM ring: tail blocks (b >= 1)
    vt_buf,
    wk_buf,          # [S, NKV, 8, HD] new-token RMW subtiles
    wv_buf,
    acc_ref,         # [NH, HD] f32 accumulators (reset per grid step)
    m_ref,           # [NH, 128] f32
    l_ref,           # [NH, 128] f32
    sem_k,           # [2, BP] ring sems (block 0)
    sem_v,
    sem_kt,          # [2, BP] tail sems
    sem_vt,
    sem_wk,          # [S] RMW sems (read, then write-back)
    sem_wv,
    *,
    num_kv_heads: int,
    group: int,
    page_size: int,
    block_pages: int,
    window: int,
    sm_scale: float,
    has_sinks: bool,
):
    s = pl.program_id(0)
    s_max = pl.num_programs(0)
    t_blk = block_pages * page_size

    def n_of(slot):
        return lengths_ref[jnp.minimum(slot, s_max - 1)]

    def b_lo_of(slot):
        if window <= 0:
            return jnp.int32(0)
        return jnp.maximum(n_of(slot) + 1 - window, 0) // t_blk

    def issue_block(bufs, sems, ring, slot, b):
        k_b, v_b = bufs
        s_k, s_v = sems
        n_pages = pl.cdiv(n_of(slot), page_size)
        for j in range(block_pages):
            pidx = b * block_pages + j

            @pl.when(pidx < n_pages)
            def _():
                page = table_ref[jnp.minimum(slot, s_max - 1), pidx]
                pltpu.make_async_copy(
                    k_hbm.at[:, page], k_b.at[ring, :, j], s_k.at[ring, j]
                ).start()
                pltpu.make_async_copy(
                    v_hbm.at[:, page], v_b.at[ring, :, j], s_v.at[ring, j]
                ).start()

    def wait_block(bufs, sems, ring, slot, b):
        k_b, v_b = bufs
        s_k, s_v = sems
        n_pages = pl.cdiv(n_of(slot), page_size)
        for j in range(block_pages):
            pidx = b * block_pages + j

            @pl.when(pidx < n_pages)
            def _():
                pltpu.make_async_copy(
                    k_hbm.at[:, 0], k_b.at[ring, :, j], s_k.at[ring, j]
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[:, 0], v_b.at[ring, :, j], s_v.at[ring, j]
                ).wait()

    def rmw_copies(slot, writeback: bool = False):
        n = lengths_ref[slot]
        page = table_ref[slot, n // page_size]
        pos0 = jax.lax.rem(n, page_size) // 8 * 8
        if writeback:
            # write through the OUTPUT refs: on hardware they alias the input
            # pools (same buffer); in interpret mode input and output are
            # separate and only output writes are captured
            k_slice = k_out.at[:, page, pl.ds(pos0, 8)]
            v_slice = v_out.at[:, page, pl.ds(pos0, 8)]
            return (
                pltpu.make_async_copy(wk_buf.at[slot], k_slice, sem_wk.at[slot]),
                pltpu.make_async_copy(wv_buf.at[slot], v_slice, sem_wv.at[slot]),
            )
        k_slice = k_hbm.at[:, page, pl.ds(pos0, 8)]
        v_slice = v_hbm.at[:, page, pl.ds(pos0, 8)]
        return (
            pltpu.make_async_copy(k_slice, wk_buf.at[slot], sem_wk.at[slot]),
            pltpu.make_async_copy(v_slice, wv_buf.at[slot], sem_wv.at[slot]),
        )

    def rmw_read(slot):
        rk, rv = rmw_copies(slot)
        rk.start()
        rv.start()

    # ---- prefetch: step s fetches slot s+1's block 0 + RMW subtile; step 0
    # bootstraps its own. Ring parity = slot index parity.
    @pl.when(s == 0)
    def _():
        issue_block((k_buf, v_buf), (sem_k, sem_v), 0, 0, b_lo_of(0))
        rmw_read(0)

    @pl.when(s + 1 < s_max)
    def _():
        issue_block((k_buf, v_buf), (sem_k, sem_v),
                    jax.lax.rem(s + 1, 2), s + 1, b_lo_of(s + 1))
        rmw_read(s + 1)

    # ---- fused append: insert the new row into the prefetched subtile and
    # write it back (completion enforced at the last grid step)
    n = lengths_ref[s]
    rk, rv = rmw_copies(s)
    rk.wait()
    rv.wait()
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (num_kv_heads, 8, 1), 1)
    hit = row_iota == jax.lax.rem(n, jnp.int32(8))
    wk_buf[pl.ds(s, 1)] = jnp.where(
        hit, k_new_ref[0][:, None, :].astype(wk_buf.dtype), wk_buf[pl.ds(s, 1)][0])[None]
    wv_buf[pl.ds(s, 1)] = jnp.where(
        hit, v_new_ref[0][:, None, :].astype(wv_buf.dtype), wv_buf[pl.ds(s, 1)][0])[None]
    wk, wv = rmw_copies(s, writeback=True)
    wk.start()
    wv.start()

    # ---- attention over the slot's cached pages + the new token from VMEM.
    # Accumulators live in scratch refs (values cannot escape @pl.when).
    acc_ref[:] = jnp.zeros_like(acc_ref)
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)

    def compute_block(bufs, ring, b):
        k_b, v_b = bufs
        offs = b * t_blk + jax.lax.broadcasted_iota(jnp.int32, (1, t_blk), 1)
        valid = offs < n
        if window > 0:
            valid &= offs >= jnp.maximum(n + 1 - window, 0)
        # zero the invalid rows before the dots: pages past the slot's length
        # are never DMA'd, and stale VMEM bytes can decode to Inf/NaN — the
        # 0-weight in the softmax does NOT save us (0*NaN = NaN in the pv dot).
        # (column iota, not valid.reshape: Mosaic can't reshape i1 vectors
        # across the minor dim)
        offs_col = b * t_blk + jax.lax.broadcasted_iota(jnp.int32, (t_blk, 1), 0)
        validc = offs_col < n
        if window > 0:
            validc &= offs_col >= jnp.maximum(n + 1 - window, 0)
        for h in range(num_kv_heads):
            hs = slice(h * group, (h + 1) * group)
            q_h = q_ref[0, hs, :]
            k_h = jnp.where(validc, k_b[ring, h].reshape(t_blk, -1), 0)
            v_h = jnp.where(validc, v_b[ring, h].reshape(t_blk, -1), 0)
            scores = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale
            scores = jnp.where(valid, scores, NEG_INF)
            m_old = m_ref[hs, :]
            m_new = jnp.maximum(m_old, jnp.max(scores, -1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            p = jnp.exp(scores - m_new[:, :1])
            l_ref[hs, :] = l_ref[hs, :] * alpha + jnp.sum(p, -1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[hs, :] = acc_ref[hs, :] * alpha[:, :1] + pv
            m_ref[hs, :] = m_new

    ring = jax.lax.rem(s, 2)
    b0 = b_lo_of(s)
    nb = pl.cdiv(jnp.maximum(n, 1), t_blk)
    wait_block((k_buf, v_buf), (sem_k, sem_v), ring, s, b0)
    compute_block((k_buf, v_buf), ring, b0)

    # rare tail (contexts longer than one block): serial double-buffered loop
    # over blocks b0+1..nb-1 in the tail ring
    @pl.when(nb - b0 > 1)
    def _tail():
        def body(i, _):
            b = b0 + 1 + i
            tr = jax.lax.rem(i, 2)

            @pl.when(i == 0)
            def _():
                issue_block((kt_buf, vt_buf), (sem_kt, sem_vt), tr, s, b)

            @pl.when(b + 1 < nb)
            def _():
                issue_block((kt_buf, vt_buf), (sem_kt, sem_vt),
                            1 - tr, s, b + 1)

            wait_block((kt_buf, vt_buf), (sem_kt, sem_vt), tr, s, b)
            compute_block((kt_buf, vt_buf), tr, b)
            return 0

        jax.lax.fori_loop(0, nb - b0 - 1, body, 0)

    # ---- finalize: new-token term + sinks, normalize, emit
    outs = []
    for h in range(num_kv_heads):
        hs = slice(h * group, (h + 1) * group)
        q_h = q_ref[0, hs, :]
        k_h = k_new_ref[0, h, :][None]
        v_h = v_new_ref[0, h, :][None]
        # VPU mul+sum: a [G,HD]x[1,HD] MXU dot trips a Mosaic broadcast
        # verifier bug, and the VPU is cheaper at this size anyway
        s_new = jnp.sum(
            q_h.astype(jnp.float32) * k_h.astype(jnp.float32),
            axis=-1, keepdims=True,
        ) * sm_scale  # [G, 1]
        m_h = m_ref[hs, :1]
        l_h = l_ref[hs, :1]
        a_h = acc_ref[hs, :]
        m_f = jnp.maximum(m_h, s_new)
        alpha = jnp.exp(m_h - m_f)
        p_new = jnp.exp(s_new - m_f)
        l_f = l_h * alpha + p_new
        a_f = a_h * alpha + p_new * v_h.astype(jnp.float32)
        if has_sinks:
            sink = sinks_ref[0, hs][:, None]
            m2 = jnp.maximum(m_f, sink)
            scale2 = jnp.exp(m_f - m2)
            l_f = l_f * scale2 + jnp.exp(sink - m2)
            a_f = a_f * scale2
        outs.append(a_f / l_f)
    o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)

    # ---- last step: every slot's write-back must have landed
    @pl.when(s == s_max - 1)
    def _():
        for slot in range(s_max):
            wk, wv = rmw_copies(slot, writeback=True)
            wk.wait()
            wv.wait()


@functools.partial(
    jax.jit,
    static_argnames=("window", "sm_scale", "block_pages", "interpret"),
)
def decode_paged_attention(
    q: jax.Array,            # [S, NH, HD]
    k_new: jax.Array,        # [S, NKV, HD] — the new token's K per slot
    v_new: jax.Array,
    k_pool: jax.Array,       # [NKV, NP, PS, HD]
    v_pool: jax.Array,
    lengths: jax.Array,      # [S] int32: cache tokens BEFORE the new one
    page_table: jax.Array,   # [S, P] int32
    *,
    sinks: jax.Array | None = None,  # [NH] attention-sink logits
    window: int = 0,
    sm_scale: float | None = None,
    block_pages: int = 4,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused decode attention + cache append.

    Returns (o [S, NH, HD] in q.dtype, k_pool, v_pool) where the pools now
    hold the new token's K/V at position ``lengths[s]`` of each slot.
    """
    s, nh, hd = q.shape
    nkv, _np_, ps, _ = k_pool.shape
    p = page_table.shape[1]
    group = nh // nkv
    bp = max(1, min(block_pages, p))
    if sm_scale is None:
        sm_scale = hd ** -0.5

    sinks_arr = (
        jnp.zeros((1, nh), jnp.float32)
        if sinks is None
        else jnp.asarray(sinks, jnp.float32).reshape(1, nh)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s,),
        in_specs=[
            pl.BlockSpec((1, nh, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nkv, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nh), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec((1, nh, hd), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, nkv, bp, ps, hd), k_pool.dtype),
            pltpu.VMEM((2, nkv, bp, ps, hd), v_pool.dtype),
            pltpu.VMEM((2, nkv, bp, ps, hd), k_pool.dtype),
            pltpu.VMEM((2, nkv, bp, ps, hd), v_pool.dtype),
            pltpu.VMEM((s, nkv, 8, hd), k_pool.dtype),
            pltpu.VMEM((s, nkv, 8, hd), v_pool.dtype),
            pltpu.VMEM((nh, hd), jnp.float32),
            pltpu.VMEM((nh, 128), jnp.float32),
            pltpu.VMEM((nh, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2, bp)),
            pltpu.SemaphoreType.DMA((2, bp)),
            pltpu.SemaphoreType.DMA((2, bp)),
            pltpu.SemaphoreType.DMA((2, bp)),
            pltpu.SemaphoreType.DMA((s,)),
            pltpu.SemaphoreType.DMA((s,)),
        ],
    )
    kernel = functools.partial(
        _kernel,
        num_kv_heads=nkv,
        group=group,
        page_size=ps,
        block_pages=bp,
        window=int(window or 0),
        sm_scale=float(sm_scale),
        has_sinks=sinks is not None,
    )
    kv_bytes = 2 * nkv * ps * hd * k_pool.dtype.itemsize
    # pallas_call input order: [lengths, table, q, k_new, v_new, sinks,
    # k_pool(6), v_pool(7)]; outputs: [o(0), k_pool(1), v_pool(2)]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((s, nh, hd), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
        ),
        input_output_aliases={6: 1, 7: 2},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * s * nh * hd * p * ps,
            bytes_accessed=s * p * kv_bytes,
            transcendentals=s * nh * p * ps,
        ),
        interpret=interpret,
    )(lengths.astype(jnp.int32), page_table.astype(jnp.int32),
      q, k_new, v_new, sinks_arr, k_pool, v_pool)
