"""Fused decode-time QKV preparation — one Pallas launch per layer.

At decode batch sizes ([S=32..128, 1] tokens) the per-layer pre-attention
chain (rms_norm -> q/k/v projections (+bias) -> per-head qk-norm -> two
rotary embeddings) lowers to ~12 small XLA fusions whose fixed launch +
lane-permute cost dominates the decode step: stripping just the norm/rope
sites halves the measured step time (13.9 -> 7.3 ms on Qwen3-0.6B @ 32
slots). This kernel computes the whole chain in one launch: the projection
weights fit VMEM at the model sizes where overhead dominates (gated by
``fits_vmem``), the matmuls run on the MXU with f32 accumulation, and the
norm/rope arithmetic rides the VPU between them with zero HBM round-trips.

Semantics match sampler/model._qkv for the standard family path (rms-norm
attn_norm, optional q/k/v biases, per-head RMS qk-norm, half-split rotary
with optional partial rotation and YaRN cos/sin scaling, 1-D positions).
Anything else (LoRA adapters, per-layer qk-norm scope, per-frequency mRoPE
positions, interleaved rope) falls back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def fits_vmem(d: int, nh: int, nkv: int, hd: int, budget_mb: int = 10) -> bool:
    """Projection weights (the kernel's VMEM residents) under budget."""
    w_bytes = d * (nh + 2 * nkv) * hd * 2
    return w_bytes <= budget_mb * (1 << 20)


def _kernel(
    x_ref,        # [S, D] hidden (pre-norm), any float dtype
    nw_ref,       # [1, D] attn_norm weight
    wq_ref,       # [D, NH*HD]
    wk_ref,       # [D, NKV*HD]
    wv_ref,
    bias_ref,     # [8, NH*HD] rows 0/1/2 = q/k/v bias (padded; zeros if none)
    qn_ref,       # [1, HD] qk-norm weights (ones if disabled)
    kn_ref,       # [1, HD]
    pos_ref,      # [S, 1] int32 rope positions
    inv_ref,      # [1, R2] inverse frequencies (R2 = rot // 2)
    q_ref,        # out [S, NH, HD]
    k_ref,        # out [S, NKV, HD]
    v_ref,        # out [S, NKV, HD]
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    qk_norm: bool,
    has_bias: bool,
    rot: int,
    scaling: float,
    eps: float,
):
    s, d = x_ref.shape
    xf = x_ref[:].astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    xn = (xf * jax.lax.rsqrt(var + eps) * nw_ref[0].astype(jnp.float32))
    xb = xn.astype(wq_ref.dtype)

    r2 = rot // 2
    angles = pos_ref[:].astype(jnp.float32) * inv_ref[0, :]  # [S, R2]
    cos = jnp.cos(angles) * scaling
    sin = jnp.sin(angles) * scaling

    def head_prep(flat, n_heads, norm_w, bias_row):
        """[S, n_heads*HD] f32 -> per-head qk-norm + rope -> [S, n_heads, HD]."""
        h3 = flat.reshape(s, n_heads, head_dim)
        if has_bias:
            h3 = h3 + bias_ref[bias_row, : n_heads * head_dim].astype(
                jnp.float32).reshape(1, n_heads, head_dim)
        if qk_norm:
            v2 = jnp.mean(jnp.square(h3), axis=-1, keepdims=True)
            h3 = h3 * jax.lax.rsqrt(v2 + eps) * norm_w[0].astype(jnp.float32)
        x1 = h3[..., : r2]
        x2 = h3[..., r2: rot]
        c = cos[:, None, :]
        sn = sin[:, None, :]
        rotated = jnp.concatenate([x1 * c - x2 * sn, x2 * c + x1 * sn], axis=-1)
        if rot == head_dim:
            return rotated
        return jnp.concatenate([rotated, h3[..., rot:]], axis=-1)

    qf = jax.lax.dot_general(xb, wq_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    q_ref[:] = head_prep(qf, num_heads, qn_ref, 0).astype(q_ref.dtype)
    kf = jax.lax.dot_general(xb, wk_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    k_ref[:] = head_prep(kf, num_kv_heads, kn_ref, 1).astype(k_ref.dtype)
    vf = jax.lax.dot_general(xb, wv_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    v3 = vf.reshape(s, num_kv_heads, head_dim)
    if has_bias:
        v3 = v3 + bias_ref[2, : num_kv_heads * head_dim].astype(
            jnp.float32).reshape(1, num_kv_heads, head_dim)
    v_ref[:] = v3.astype(v_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_kv_heads", "head_dim", "qk_norm",
                     "rot", "scaling", "eps", "interpret"),
)
def decode_qkv_prep(
    x: jax.Array,            # [S, D] hidden states (pre-attn-norm)
    norm_w: jax.Array,       # [D]
    wq: jax.Array,           # [D, NH*HD]
    wk: jax.Array,           # [D, NKV*HD]
    wv: jax.Array,
    positions: jax.Array,    # [S] int32
    inv_freq: jax.Array,     # [rot // 2] f32
    *,
    num_heads: int,
    num_kv_heads: int,
    head_dim: int,
    qk_norm: bool = True,
    q_norm_w: jax.Array | None = None,   # [HD]
    k_norm_w: jax.Array | None = None,
    q_bias: jax.Array | None = None,     # flat or per-head bias
    k_bias: jax.Array | None = None,
    v_bias: jax.Array | None = None,
    rot: int | None = None,
    scaling: float = 1.0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (q [S, NH, HD], k [S, NKV, HD], v [S, NKV, HD]) in x.dtype."""
    s, d = x.shape
    if rot is None:
        rot = 2 * inv_freq.shape[0]
    has_bias = q_bias is not None
    ones = jnp.ones((1, head_dim), jnp.float32)
    qn = ones if q_norm_w is None else jnp.asarray(q_norm_w, jnp.float32).reshape(1, head_dim)
    kn = ones if k_norm_w is None else jnp.asarray(k_norm_w, jnp.float32).reshape(1, head_dim)
    bias = jnp.zeros((8, num_heads * head_dim), jnp.float32)
    if has_bias:
        bias = bias.at[0, : num_heads * head_dim].set(
            jnp.asarray(q_bias, jnp.float32).reshape(-1))
        bias = bias.at[1, : num_kv_heads * head_dim].set(
            jnp.asarray(k_bias, jnp.float32).reshape(-1))
        bias = bias.at[2, : num_kv_heads * head_dim].set(
            jnp.asarray(v_bias, jnp.float32).reshape(-1))

    kernel = functools.partial(
        _kernel,
        num_heads=num_heads, num_kv_heads=num_kv_heads, head_dim=head_dim,
        qk_norm=qk_norm, has_bias=has_bias, rot=int(rot),
        scaling=float(scaling), eps=float(eps),
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[vmem] * 10,
        out_specs=(vmem, vmem, vmem),
        out_shape=(
            jax.ShapeDtypeStruct((s, num_heads, head_dim), x.dtype),
            jax.ShapeDtypeStruct((s, num_kv_heads, head_dim), x.dtype),
            jax.ShapeDtypeStruct((s, num_kv_heads, head_dim), x.dtype),
        ),
        interpret=interpret,
    )(x, norm_w.reshape(1, d), wq, wk, wv, bias, qn, kn,
      positions.reshape(s, 1).astype(jnp.int32),
      jnp.asarray(inv_freq, jnp.float32).reshape(1, -1))
