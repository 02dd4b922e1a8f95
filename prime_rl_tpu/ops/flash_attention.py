"""Pallas TPU flash attention for packed sequences (training path).

TPU-native replacement for the reference's external flash-attn 2/3/4 CUDA
kernels (reference: models/layers/attn.py dispatch; SURVEY.md §2.4): online-
softmax tiling with fp32 accumulators, causal block skipping, segment-id
masking for packed sequences, GQA via head-index mapping (no KV replication
in HBM), and a custom VJP whose backward recomputes attention blockwise —
two Pallas kernels (dq; dk/dv) so nothing materializes [L, L].

Sliding windows run BANDED: the kv-grid dimension only spans the window band
(index maps offset the kv block by the query block's band start), so both
the FLOPs and the K/V block DMAs scale with window size, not L² — a gpt-oss
style 128-token window at 16k+ costs what a 16-block band costs. Attention
sinks (gpt-oss: a learned per-head logit joining the softmax denominator)
fold into the online-softmax finalize; their gradient is a tiny XLA
reduction over (lse, delta) outside the kernels.

Layout: kernels work on [B, H, L, D] with D as the lane dimension (128-
aligned for the MXU). Grid iterates (batch, head, q-block, kv-block) with
the kv-block innermost so VMEM scratch accumulators persist across the
sequential TPU grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def _band_lo(i, block_q, block_kv, window):
    """First kv block index the q block ``i`` can see under ``window``."""
    if window <= 0:
        return 0
    return jnp.maximum(0, (i * block_q - window + 1) // block_kv)


def _band_blocks(l, block_q, block_kv, window):
    """Static kv-grid length: full for dense causal, band for windowed."""
    nkv = pl.cdiv(l, block_kv)
    if window <= 0:
        return nkv
    return min(nkv, pl.cdiv(block_q + window - 1, block_kv) + 1)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    seg_q_ref,  # [1, 1, bq]
    seg_kv_ref,  # [1, 1, bkv]
    q_ref,  # [1, 1, bq, D]
    k_ref,  # [1, 1, bkv, D]
    v_ref,  # [1, 1, bkv, D]
    sink_ref,  # [NH, 1] f32 in SMEM (whole array; indexed by the head id)
    out_ref,  # [1, 1, bq, D]
    lse_ref,  # [1, 1, 1, bq]
    acc_ref,  # scratch [bq, D] f32
    m_ref,  # scratch [bq, 1] f32
    l_ref,  # scratch [bq, 1] f32
    *,
    scale: float,
    causal: bool,
    window: int,
    has_sinks: bool,
    block_q: int,
    block_kv: int,
    nkv_total: int,
):
    h = pl.program_id(1)
    i = pl.program_id(2)
    j = pl.program_id(3)
    nband = pl.num_programs(3)
    j_abs = _band_lo(i, block_q, block_kv, window) + j

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    # causal: skip blocks strictly above the diagonal band; clipped band
    # positions past the end of the sequence also skip
    run = (j_abs < nkv_total)
    if causal:
        run &= j_abs * block_kv <= i * block_q + block_q - 1

    @pl.when(run)
    def _compute():
        # keep MXU inputs in bf16 (f32 dots are ~8x slower); accumulate f32
        q = q_ref[0, 0]  # [bq, D]
        k = k_ref[0, 0]  # [bkv, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [bq, bkv]

        seg_q = seg_q_ref[0, 0]  # [bq]
        seg_kv = seg_kv_ref[0, 0]  # [bkv]
        mask = (seg_q[:, None] == seg_kv[None, :]) & (seg_q[:, None] != 0)
        if causal or window > 0:
            rows = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = j_abs * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            if causal:
                mask = mask & (rows >= cols)
            if window > 0:
                mask = mask & (rows - cols < window)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0]  # [bq]
        m_cur = jnp.max(s, axis=1)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows: keep m at NEG_INF contributing nothing
        p = jnp.exp(s - m_new[:, None])
        p = jnp.where(mask, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:, 0] = m_new
        l_ref[:, 0] = l_new

    @pl.when(j == nband - 1)
    def _finalize():
        if has_sinks:
            # the sink is a virtual token with learned logit and zero value:
            # it joins the denominator in the online-softmax finalize
            sink = sink_ref[h, 0]
            m = m_ref[:, 0]
            m_f = jnp.maximum(m, sink)
            alpha = jnp.exp(m - m_f)  # pad rows: m = NEG_INF -> 0
            l_f = l_ref[:, 0] * alpha + jnp.exp(sink - m_f)
            out_ref[0, 0] = (acc_ref[:] * (alpha / l_f)[:, None]).astype(out_ref.dtype)
            lse_ref[0, 0, 0] = m_f + jnp.log(l_f)
        else:
            l = l_ref[:, 0]
            l_safe = jnp.where(l > 0, l, 1.0)
            out_ref[0, 0] = (acc_ref[:] / l_safe[:, None]).astype(out_ref.dtype)
            # lse for the backward: m + log l (NEG_INF rows stay very negative)
            lse_ref[0, 0, 0] = jnp.where(l > 0, m_ref[:, 0] + jnp.log(l_safe), NEG_INF)


def _kv_index_map(block_q, block_kv, window, nkv_total, group, causal=False):
    def index_map(bi, h, i, j):
        j_abs = _band_lo(i, block_q, block_kv, window) + j
        cap = nkv_total - 1
        if causal:
            # clamp past-diagonal cells to the diagonal block: Mosaic skips
            # the DMA when the mapped block index doesn't change, so the
            # ~50% of causal cells the kernel predicates away fetch nothing
            cap = jnp.minimum(cap, (i * block_q + block_q - 1) // block_kv)
        return (bi, h // group, jnp.minimum(j_abs, cap), 0)

    return index_map


def _kvseg_index_map(block_q, block_kv, window, nkv_total, causal=False):
    def index_map(bi, h, i, j):
        j_abs = _band_lo(i, block_q, block_kv, window) + j
        cap = nkv_total - 1
        if causal:
            cap = jnp.minimum(cap, (i * block_q + block_q - 1) // block_kv)
        return (bi, 0, jnp.minimum(j_abs, cap))

    return index_map


def _fwd(q, k, v, sinks, seg_q, seg_kv, causal, scale, window, has_sinks, block_q, block_kv):
    b, nh, l, d = q.shape
    lkv = k.shape[2]
    nkv_heads = k.shape[1]
    group = nh // nkv_heads
    nq = pl.cdiv(l, block_q)
    nkv = pl.cdiv(lkv, block_kv)
    nband = _band_blocks(lkv, block_q, block_kv, window) if l == lkv else nkv
    seg3q = seg_q[:, None, :]  # [B, 1, L] so (sublane, lane) tiling rules hold
    seg3kv = seg_kv[:, None, :]

    grid = (b, nh, nq, nband)
    out, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel, scale=scale, causal=causal, window=window,
            has_sinks=has_sinks, block_q=block_q, block_kv=block_kv, nkv_total=nkv,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, h, i, j: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_kv), _kvseg_index_map(block_q, block_kv, window, nkv, causal)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), _kv_index_map(block_q, block_kv, window, nkv, group, causal)),
            pl.BlockSpec((1, 1, block_kv, d), _kv_index_map(block_q, block_kv, window, nkv, group, causal)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, h, i, j: (bi, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nh, l, d), q.dtype),
            jax.ShapeDtypeStruct((b, nh, 1, l), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(seg3q, seg3kv, q, k, v, sinks)
    return out, lse


# ---------------------------------------------------------------------------
# Backward: dq kernel (grid kv-innermost) and dkv kernel (grid q-innermost)
# ---------------------------------------------------------------------------

def _bwd_dq_kernel(
    seg_q_ref, seg_kv_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc_ref,
    *, scale, causal, window, block_q, block_kv, nkv_total,
):
    i = pl.program_id(2)
    j = pl.program_id(3)
    nband = pl.num_programs(3)
    j_abs = _band_lo(i, block_q, block_kv, window) + j

    @pl.when(j == 0)
    def _init():
        dq_acc_ref[:] = jnp.zeros_like(dq_acc_ref)

    run = (j_abs < nkv_total)
    if causal:
        run &= j_abs * block_kv <= i * block_q + block_q - 1

    @pl.when(run)
    def _compute():
        # bf16 MXU inputs, f32 accumulation (softmax math stays f32)
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        do = do_ref[0, 0]
        lse = lse_ref[0, 0, 0]  # [bq]
        delta = delta_ref[0, 0, 0]  # [bq]

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        seg_q = seg_q_ref[0, 0]
        seg_kv = seg_kv_ref[0, 0]
        mask = (seg_q[:, None] == seg_kv[None, :]) & (seg_q[:, None] != 0)
        if causal or window > 0:
            rows = i * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = j_abs * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            if causal:
                mask = mask & (rows >= cols)
            if window > 0:
                mask = mask & (rows - cols < window)
        p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = (p * (dp - delta[:, None])).astype(k.dtype)
        dq_acc_ref[:] += jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale

    @pl.when(j == nband - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    seg_q_ref, seg_kv_ref,
    q_ref,  # [1, G, bq, D]: all query heads of this KV head's GQA group
    k_ref, v_ref,  # [1, 1, bkv, D]
    do_ref,  # [1, G, bq, D]
    lse_ref, delta_ref,  # [1, G, 1, bq]
    dk_ref, dv_ref,  # [1, 1, bkv, D]
    dk_acc_ref, dv_acc_ref,
    *, scale, causal, window, block_q, block_kv, group, nq_total,
):
    j = pl.program_id(2)  # kv block
    i = pl.program_id(3)  # q band position (innermost)
    nband = pl.num_programs(3)
    # q blocks that can see kv block j: the transpose of the forward band
    i_lo = (j * block_kv) // block_q if causal else 0
    i_abs = i_lo + i

    @pl.when(i == 0)
    def _init():
        dk_acc_ref[:] = jnp.zeros_like(dk_acc_ref)
        dv_acc_ref[:] = jnp.zeros_like(dv_acc_ref)

    run = (i_abs < nq_total)
    if causal:
        run &= j * block_kv <= i_abs * block_q + block_q - 1
    if window > 0:
        # q past the window's reach of this kv block contributes nothing
        run &= i_abs * block_q <= (j + 1) * block_kv - 1 + window - 1

    @pl.when(run)
    def _compute():
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        seg_q = seg_q_ref[0, 0]
        seg_kv = seg_kv_ref[0, 0]
        mask = (seg_q[:, None] == seg_kv[None, :]) & (seg_q[:, None] != 0)
        if causal or window > 0:
            rows = i_abs * block_q + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 0)
            cols = j * block_kv + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_kv), 1)
            if causal:
                mask = mask & (rows >= cols)
            if window > 0:
                mask = mask & (rows - cols < window)
        # accumulate dk/dv over the whole GQA group before writing HBM
        for g in range(group):
            q = q_ref[0, g]
            do = do_ref[0, g]
            lse = lse_ref[0, g, 0]
            delta = delta_ref[0, g, 0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale
            p = jnp.where(mask, jnp.exp(s - lse[:, None]), 0.0)  # [bq, bkv]
            dv_acc_ref[:] += jax.lax.dot_general(
                p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            ds = (p * (dp - delta[:, None])).astype(q.dtype)  # [bq, bkv]
            dk_acc_ref[:] += jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            ) * scale

    @pl.when(i == nband - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc_ref[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc_ref[:].astype(dv_ref.dtype)


def _bwd(causal, scale, window, has_sinks, block_q, block_kv, res, g):
    q, k, v, sinks, seg_q, seg_kv, out, lse = res
    do, dlse = g  # cotangents wrt (out, lse)
    b, nh, l, d = q.shape
    lkv = k.shape[2]
    nkv_heads = k.shape[1]
    group = nh // nkv_heads
    # the backward's per-block working set is ~2x the forward's (p AND ds in
    # f32); kv blocks beyond 512 spill VMEM and regress
    block_kv = min(block_kv, 512)
    nq = pl.cdiv(l, block_q)
    nkv = pl.cdiv(lkv, block_kv)
    nband_kv = (_band_blocks(lkv, block_q, block_kv, window) if l == lkv else nkv)
    # transpose band: q blocks reaching one kv block
    nband_q = nq if window <= 0 or l != lkv else min(
        nq, pl.cdiv(block_kv + window - 1, block_q) + 1)

    delta = jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32), axis=-1)[:, :, None, :]  # [B, H, 1, L]
    # an lse cotangent folds into delta: ds = p * (dp - delta + dlse)
    # (d lse / d s_j = p_j), so delta' = delta - dlse
    if dlse is not None and not isinstance(dlse, jax.custom_derivatives.SymbolicZero):
        delta = delta - dlse.astype(jnp.float32).reshape(delta.shape)
    seg3q = seg_q[:, None, :]
    seg3kv = seg_kv[:, None, :]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, scale=scale, causal=causal, window=window,
            block_q=block_q, block_kv=block_kv, nkv_total=nkv,
        ),
        grid=(b, nh, nq, nband_kv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), lambda bi, h, i, j: (bi, 0, i)),
            pl.BlockSpec((1, 1, block_kv), _kvseg_index_map(block_q, block_kv, window, nkv, causal)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), _kv_index_map(block_q, block_kv, window, nkv, group, causal)),
            pl.BlockSpec((1, 1, block_kv, d), _kv_index_map(block_q, block_kv, window, nkv, group, causal)),
            pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, h, i, j: (bi, h, 0, i)),
            pl.BlockSpec((1, 1, 1, block_q), lambda bi, h, i, j: (bi, h, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, h, i, j: (bi, h, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, nh, l, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=_interpret(),
    )(seg3q, seg3kv, q, k, v, do, lse, delta)

    def _q_index_map(block_dims):
        def index_map(bi, h, j, i):
            i_lo = (j * block_kv) // block_q if causal else 0
            return (bi, h, jnp.minimum(i_lo + i, nq - 1), 0)

        return index_map

    def _qseg_index_map(bi, h, j, i):
        i_lo = (j * block_kv) // block_q if causal else 0
        return (bi, 0, jnp.minimum(i_lo + i, nq - 1))

    def _qlse_index_map(bi, h, j, i):
        i_lo = (j * block_kv) // block_q if causal else 0
        return (bi, h, 0, jnp.minimum(i_lo + i, nq - 1))

    # dk/dv: one grid cell per KV head, GQA group accumulated in-kernel
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, scale=scale, causal=causal, window=window,
            block_q=block_q, block_kv=block_kv, group=group, nq_total=nq,
        ),
        grid=(b, nkv_heads, nkv, nband_q),
        in_specs=[
            pl.BlockSpec((1, 1, block_q), _qseg_index_map),
            pl.BlockSpec((1, 1, block_kv), lambda bi, h, j, i: (bi, 0, j)),
            pl.BlockSpec((1, group, block_q, d), _q_index_map(None)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, h, j, i: (bi, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, h, j, i: (bi, h, j, 0)),
            pl.BlockSpec((1, group, block_q, d), _q_index_map(None)),
            pl.BlockSpec((1, group, 1, block_q), _qlse_index_map),
            pl.BlockSpec((1, group, 1, block_q), _qlse_index_map),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, h, j, i: (bi, h, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bi, h, j, i: (bi, h, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nkv_heads, lkv, d), k.dtype),
            jax.ShapeDtypeStruct((b, nkv_heads, lkv, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        interpret=_interpret(),
    )(seg3q, seg3kv, q, k, v, do, lse, delta)

    if has_sinks:
        # dsink_h = -sum_q p_sink(q) * delta(q) with p_sink = exp(sink - lse);
        # pad rows have delta == 0 so they contribute nothing
        sink_col = sinks[:, 0]  # [NH]
        lse_f = lse[:, :, 0, :]  # [B, H, L]
        w = jnp.where(lse_f > NEG_INF / 2,
                      jnp.exp(sink_col[None, :, None] - lse_f), 0.0)
        dsinks = -(w * delta[:, :, 0, :]).sum(axis=(0, 2))[:, None]  # [NH, 1]
        dsinks = dsinks.astype(sinks.dtype)
    else:
        dsinks = jnp.zeros_like(sinks)
    return dq, dk, dv, dsinks, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9, 10, 11))
def _flash(q, k, v, sinks, seg_q, seg_kv, causal, scale, window, has_sinks,
           block_q, block_kv):
    return _fwd(q, k, v, sinks, seg_q, seg_kv, causal, scale, window, has_sinks,
                block_q, block_kv)


def _flash_fwd(q, k, v, sinks, seg_q, seg_kv, causal, scale, window, has_sinks,
               block_q, block_kv):
    from jax.ad_checkpoint import checkpoint_name

    out, lse = _fwd(q, k, v, sinks, seg_q, seg_kv, causal, scale, window, has_sinks,
                    block_q, block_kv)
    # named so the "save_attn" remat policy can keep the kernel outputs and
    # skip re-running the forward flash kernel during the backward pass
    out = checkpoint_name(out, "attn_out")
    lse = checkpoint_name(lse, "attn_lse")
    return (out, lse), (q, k, v, sinks, seg_q, seg_kv, out, lse)


def _flash_bwd(causal, scale, window, has_sinks, block_q, block_kv, res, g):
    return _bwd(causal, scale, window, has_sinks, block_q, block_kv, res, g)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jax.Array,  # [B, L, NH, HD]
    k: jax.Array,  # [B, L, NKV, HD]
    v: jax.Array,  # [B, L, NKV, HD]
    segment_ids: jax.Array,  # [B, L] int32, 0 = pad
    causal: bool = True,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 512,
    window: int = 0,  # sliding window (static!); 0 = full attention
    sinks: jax.Array | None = None,  # [NH] learned sink logits (gpt-oss style)
) -> jax.Array:
    """Public entry, [B, L, N, D] layout in/out (matches ops.attention).

    ``window`` must be a static Python int — the banded grid and block
    skipping are built at trace time (models unroll/group windowed layers so
    this holds; see models/qwen3.py forward)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if not isinstance(window, int):
        raise TypeError("flash_attention window must be a static int "
                        "(traced windows route to xla_attention)")
    l = q.shape[1]
    block_q = min(block_q, l)
    block_kv = min(block_kv, l)
    if l % block_q or l % block_kv:
        raise ValueError(f"seq len {l} must be divisible by block sizes ({block_q}, {block_kv})")
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    has_sinks = sinks is not None
    nh = q.shape[2]
    sinks_arr = (jnp.zeros((nh, 1), jnp.float32) if sinks is None
                 else sinks.astype(jnp.float32).reshape(nh, 1))
    out, _ = _flash(qt, kt, vt, sinks_arr, segment_ids, segment_ids, causal,
                    float(scale), int(window), has_sinks, block_q, block_kv)
    return jnp.swapaxes(out, 1, 2)


def flash_attention_with_lse(
    q: jax.Array,  # [B, Lq, NH, HD]
    k: jax.Array,  # [B, Lkv, NKV, HD]
    v: jax.Array,  # [B, Lkv, NKV, HD]
    seg_q: jax.Array,  # [B, Lq]
    seg_kv: jax.Array,  # [B, Lkv]
    causal: bool = False,
    scale: float | None = None,
    block_q: int = 512,
    block_kv: int = 512,
) -> tuple[jax.Array, jax.Array]:
    """Cross-block flash attention returning (out [B, Lq, NH, HD],
    lse [B, NH, Lq]) — the ring-attention inner kernel: partials from
    different KV blocks merge exactly via their lse, and the custom VJP
    folds the lse cotangent into delta so gradients flow through the merge
    (reference: models/layers/ring_attn.py role). ``causal`` only makes
    sense for the diagonal block (Lq == Lkv, same global offsets)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    lq, lkv = q.shape[1], k.shape[1]
    block_q = min(block_q, lq)
    block_kv = min(block_kv, lkv)
    if lq % block_q or lkv % block_kv:
        raise ValueError(f"lengths ({lq}, {lkv}) must divide blocks ({block_q}, {block_kv})")
    qt = jnp.swapaxes(q, 1, 2)
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    nh = q.shape[2]
    sinks_arr = jnp.zeros((nh, 1), jnp.float32)
    out, lse = _flash(qt, kt, vt, sinks_arr, seg_q, seg_kv, causal,
                      float(scale), 0, False, block_q, block_kv)
    return jnp.swapaxes(out, 1, 2), lse[:, :, 0, :]
