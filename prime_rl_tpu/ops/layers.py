"""Elementwise/normalization/position ops shared by all model families
(reference: models/layers/{norms.py, rotary_emb.py, mlp.py})."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMSNorm in fp32 with cast back to input dtype (matches HF Qwen/Llama)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jax.Array:
    """Inverse frequencies [head_dim//2] (float32)."""
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def apply_rope(
    x: jax.Array,  # [B, L, N, HD]
    position_ids: jax.Array,  # [B, L] int32
    inv_freq: jax.Array,  # [HD//2]
) -> jax.Array:
    """Rotary embedding, half-split layout (HF convention: rotate_half)."""
    dtype = x.dtype
    angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [B, L, HD//2]
    cos = jnp.cos(angles)[:, :, None, :]  # [B, L, 1, HD//2]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(dtype)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up
