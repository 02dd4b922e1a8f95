"""Pallas TPU sparse-MLA attention (DSA phase-2, gathered-flash form).

Behavior parity target: reference kernels/sparse_mla_fwd.py:1-212 /
sparse_mla_bwd.py:1-303 — softmax attention over each query token's top-k
gathered latent-KV rows, sentinel (== Sk) entries masked to -inf, value =
first ``v_dim`` channels of the gathered row (absorbed MLA).

TPU-first split of the reference Triton design:

- The **row gather stays in XLA** (`jnp.take`): TPU serves scattered
  row-granularity loads through the hardware gather DMA engine; a Pallas
  kernel would have to issue one async copy per selected row, which is
  DMA-latency-bound. Keeping the gather in the autodiff graph also gives
  the dKV scatter-add for free as the gather's transpose.
- The **attention over the gathered rows is a fused Pallas kernel**: the
  XLA baseline (`ops.sparse_mla.sparse_mla_attention`) materializes the
  [C, H, T] f32 score tensor and reads the gathered [C, T, Dq] buffer
  twice (scores + values); this kernel streams each gathered tile through
  VMEM exactly once with an online softmax, so HBM traffic drops to
  ~1x the gathered bytes and the scores never leave VMEM.
- Backward is one Pallas kernel producing dq and d(kvg) blockwise from the
  saved LSE (flash-attention treatment); the chunk body is wrapped in
  `jax.checkpoint` so the backward re-gathers instead of storing every
  chunk's [C, T, Dq].

Layout: queries are processed in chunks of ``chunk`` tokens; the kernel
grid is (token, T/block_t) with the selection dim innermost so the f32
softmax state lives in VMEM scratch across tiles. Head count rides the
sublane dim (one query token's [H, Dq] panel per grid row) — H>=16 keeps
bf16 tiles full. Dq is zero-padded to a lane multiple (576 -> 640) before
the gather so every MXU operand is 128-aligned.
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


def _pad_axis(x: jax.Array, n: int, axis: int, fill=0) -> jax.Array:
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=fill)


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


# ---------------------------------------------------------------------------
# Forward kernel: one query token per grid row, selection tiles innermost
# ---------------------------------------------------------------------------

def _fwd_kernel(
    ic_ref,   # [1, bt] int32 selected indices (sentinel == sk)
    q_ref,    # [1, H, Dqp]
    kvg_ref,  # [1, bt, Dqp] gathered rows for this token
    out_ref,  # [1, H, Dv]
    lse_ref,  # [1, H]
    acc_ref,  # scratch [H, Dv] f32
    m_ref,    # scratch [H, 1] f32
    l_ref,    # scratch [H, 1] f32
    *,
    sm_scale: float,
    v_dim: int,
    sk: int,
):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    q = q_ref[0]          # [H, Dqp] (bf16 in)
    kvg = kvg_ref[0]      # [bt, Dqp]
    s = jax.lax.dot_general(
        q, kvg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale          # [H, bt]
    valid = (ic_ref[0] < sk)[None, :]
    s = jnp.where(valid, s, NEG_INF)

    m_prev = m_ref[:, 0]
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
    m_safe = jnp.maximum(m_cur, NEG_INF / 2)  # all-masked rows stay at 0
    alpha = jnp.exp(m_prev - m_safe)
    p = jnp.exp(s - m_safe[:, None])          # [H, bt]
    l_ref[:, 0] = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    acc_ref[:] = acc_ref[:] * alpha[:, None] + jax.lax.dot(
        p.astype(kvg.dtype), kvg[:, :v_dim], preferred_element_type=jnp.float32
    )
    m_ref[:, 0] = m_cur

    @pl.when(j == nt - 1)
    def _finalize():
        l = l_ref[:, 0]
        out_ref[0] = (acc_ref[:] / jnp.maximum(l, 1e-30)[:, None]).astype(out_ref.dtype)
        lse_ref[0] = jnp.maximum(m_ref[:, 0], NEG_INF / 2) + jnp.log(
            jnp.maximum(l, 1e-30)
        )


def _fwd_call(qc, kvg, ic, *, sm_scale, v_dim, sk, block_t):
    c, h, dqp = qc.shape
    tp = kvg.shape[1]
    nt = tp // block_t
    grid = (c, nt)
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, sm_scale=sm_scale, v_dim=v_dim, sk=sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t), lambda i, j: (i, j)),
            pl.BlockSpec((1, h, dqp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_t, dqp), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, v_dim), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, h, v_dim), qc.dtype),
            jax.ShapeDtypeStruct((c, h), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h, v_dim), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
            pltpu.VMEM((h, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(ic, qc, kvg)
    return out, lse


# ---------------------------------------------------------------------------
# Backward kernel: dq accumulated across tiles, d(kvg) written per tile
# ---------------------------------------------------------------------------

def _bwd_kernel(
    ic_ref,     # [1, bt]
    q_ref,      # [1, H, Dqp]
    kvg_ref,    # [1, bt, Dqp]
    do_ref,     # [1, H, Dv]
    lse_ref,    # [1, H]
    delta_ref,  # [1, H]
    dq_ref,     # [1, H, Dqp] out
    dkvg_ref,   # [1, bt, Dqp] out
    dq_acc,     # scratch [H, Dqp] f32
    *,
    sm_scale: float,
    v_dim: int,
    sk: int,
):
    j = pl.program_id(1)
    nt = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    q = q_ref[0]        # [H, Dqp]
    kvg = kvg_ref[0]    # [bt, Dqp]
    do = do_ref[0]      # [H, Dv]
    lse = lse_ref[0]    # [H]
    delta = delta_ref[0]  # [H]

    s = jax.lax.dot_general(
        q, kvg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale        # [H, bt]
    valid = (ic_ref[0] < sk)[None, :]
    p = jnp.where(valid, jnp.exp(s - lse[:, None]), 0.0)  # [H, bt]

    # dp = do . v^T ; ds = p * (dp - delta) * scale
    dp = jax.lax.dot_general(
        do, kvg[:, :v_dim], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                   # [H, bt]
    ds = (p * (dp - delta[:, None]) * sm_scale).astype(kvg.dtype)

    dq_acc[:] += jax.lax.dot(ds, kvg, preferred_element_type=jnp.float32)

    # dkvg tile: dK part spans all Dqp channels, dV part the first v_dim
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                   # [bt, Dqp]
    dv = jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                   # [bt, Dv]
    dkvg = jnp.concatenate([dk[:, :v_dim] + dv, dk[:, v_dim:]], axis=-1)
    dkvg_ref[0] = dkvg.astype(dkvg_ref.dtype)

    @pl.when(j == nt - 1)
    def _finalize():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_call(qc, kvg, ic, do, lse, delta, *, sm_scale, v_dim, sk, block_t):
    c, h, dqp = qc.shape
    tp = kvg.shape[1]
    nt = tp // block_t
    grid = (c, nt)
    dq, dkvg = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=sm_scale, v_dim=v_dim, sk=sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_t), lambda i, j: (i, j)),
            pl.BlockSpec((1, h, dqp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_t, dqp), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, h, v_dim), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, h), lambda i, j: (i, 0)),
            pl.BlockSpec((1, h), lambda i, j: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, h, dqp), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_t, dqp), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, h, dqp), qc.dtype),
            jax.ShapeDtypeStruct((c, tp, dqp), kvg.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((h, dqp), jnp.float32)],
        interpret=_interpret(),
    )(ic, qc, kvg, do, lse, delta)
    return dq, dkvg


# ---------------------------------------------------------------------------
# Differentiable gathered-flash op (gather itself stays outside, in XLA)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _gathered_flash(qc, kvg, ic, sm_scale, v_dim, sk, block_t):
    out, _ = _fwd_call(qc, kvg, ic, sm_scale=sm_scale, v_dim=v_dim, sk=sk,
                       block_t=block_t)
    return out


def _gf_fwd(qc, kvg, ic, sm_scale, v_dim, sk, block_t):
    out, lse = _fwd_call(qc, kvg, ic, sm_scale=sm_scale, v_dim=v_dim, sk=sk,
                         block_t=block_t)
    return out, (qc, kvg, ic, out, lse)


def _gf_bwd(sm_scale, v_dim, sk, block_t, res, do):
    qc, kvg, ic, out, lse = res
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dq, dkvg = _bwd_call(qc, kvg, ic, do, lse, delta, sm_scale=sm_scale,
                         v_dim=v_dim, sk=sk, block_t=block_t)
    return dq, dkvg, None


_gathered_flash.defvjp(_gf_fwd, _gf_bwd)


def sparse_mla_attention(
    q: jax.Array,        # [S, H, Dq] (absorbed latent + rope tail)
    kv: jax.Array,       # [Sk, Dq] latent KV (no sentinel row — appended here)
    indices: jax.Array,  # [S, topk] int32, sentinel = Sk
    sm_scale: float,
    v_dim: int,
    chunk: int = 128,
    block_t: int = 512,
) -> jax.Array:
    """[S, H, v_dim]: Pallas gathered-flash DSA attention. Drop-in for
    `ops.sparse_mla.sparse_mla_attention` (same contract, same sentinel
    semantics); requires v_dim % 128 == 0 (latent MLA dims always are)."""
    S, H, Dq = q.shape
    Sk = kv.shape[0]
    T = indices.shape[1]
    if v_dim % 128 != 0 or H % 8 != 0:
        from prime_rl_tpu.ops.sparse_mla import sparse_mla_attention as xla_attn

        return xla_attn(q, kv, indices, sm_scale, v_dim)

    dqp = _round_up(Dq, 128)
    qp = _pad_axis(q, dqp, axis=2)
    kv_s = _pad_axis(
        jnp.concatenate([kv, jnp.zeros((1, Dq), kv.dtype)], axis=0), dqp, axis=1
    )  # [Sk+1, Dqp] with sentinel row

    block_t = min(block_t, _round_up(T, 128))
    tp = _round_up(T, block_t)
    ip = _pad_axis(indices, tp, axis=1, fill=Sk)

    chunk = min(chunk, S)
    n_pad = _round_up(S, chunk)
    qp = _pad_axis(qp, n_pad, axis=0).reshape(-1, chunk, H, dqp)
    ip = _pad_axis(ip, n_pad, axis=0, fill=Sk).reshape(-1, chunk, tp)

    @functools.partial(jax.checkpoint, prevent_cse=False)
    def body(args):
        qc, ic = args  # [C, H, Dqp], [C, Tp]
        kvg = jnp.take(kv_s, ic, axis=0)  # [C, Tp, Dqp] — HW gather; its
        # autodiff transpose is the dKV scatter-add
        return _gathered_flash(qc, kvg, ic, sm_scale, v_dim, Sk, block_t)

    out = jax.lax.map(body, (qp, ip))
    return out.reshape(n_pad, H, v_dim)[:S]
