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


def layer_norm(x: jax.Array, weight: jax.Array, bias: jax.Array | None = None,
               eps: float = 1e-6) -> jax.Array:
    """LayerNorm (mean-subtracting, affine) in fp32 — the vision-tower norm
    (ViT blocks use LayerNorm, not RMSNorm)."""
    dtype = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    x = (x - mean) * jax.lax.rsqrt(var + eps)
    x = x * weight.astype(jnp.float32)
    if bias is not None:
        x = x + bias.astype(jnp.float32)
    return x.astype(dtype)


def rope_frequencies(head_dim: int, theta: float = 10000.0) -> jax.Array:
    """Inverse frequencies [head_dim//2] (float32)."""
    return 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))


def yarn_rope_parameters(
    head_dim: int,
    theta: float,
    factor: float,
    original_max_pos: int,
    beta_fast: float = 32.0,
    beta_slow: float = 1.0,
    truncate: bool = True,
) -> tuple[jax.Array, float]:
    """YaRN-scaled inverse frequencies + cos/sin attention factor
    (paper 2309.00071; matches HF _compute_yarn_parameters — the gpt-oss
    131k context recipe, reference: gpt_oss/modeling_gpt_oss.py rope init)."""
    import math

    dim = head_dim
    pos_freqs = theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    inv_extrapolation = 1.0 / pos_freqs
    inv_interpolation = 1.0 / (factor * pos_freqs)

    def correction_dim(num_rot):
        return (dim * math.log(original_max_pos / (num_rot * 2 * math.pi))) / (
            2 * math.log(theta))

    low, high = correction_dim(beta_fast), correction_dim(beta_slow)
    if truncate:
        low, high = math.floor(low), math.ceil(high)
    low, high = max(low, 0), min(high, dim - 1)
    if low == high:
        high += 0.001
    ramp = jnp.clip(
        (jnp.arange(dim // 2, dtype=jnp.float32) - low) / (high - low), 0, 1
    )
    extrapolation_factor = 1.0 - ramp
    inv_freq = (inv_interpolation * (1 - extrapolation_factor)
                + inv_extrapolation * extrapolation_factor)
    attention_factor = 0.1 * math.log(factor) + 1.0 if factor > 1 else 1.0
    return inv_freq, attention_factor


def apply_rope(
    x: jax.Array,  # [B, L, N, HD]
    position_ids: jax.Array,  # [B, L] int32
    inv_freq: jax.Array,  # [HD//2]
    scaling: float = 1.0,  # YaRN attention factor on cos/sin
) -> jax.Array:
    """Rotary embedding, half-split layout (HF convention: rotate_half).
    Partial rotary (glm4_moe): ``inv_freq`` shorter than head_dim//2 rotates
    only the leading ``2*len(inv_freq)`` dims; the tail passes through.

    mRoPE (qwen3_vl): ``position_ids`` may be [B, L, rot//2] — a PER-FREQUENCY
    position (each frequency slot reads its t/h/w grid coordinate, the
    interleaved-mRoPE layout) — in which case angles are elementwise."""
    dtype = x.dtype
    rot = 2 * inv_freq.shape[0]
    hd = x.shape[-1]
    if position_ids.ndim == 3:  # [B, L, rot//2] per-frequency positions
        angles = position_ids.astype(jnp.float32) * inv_freq
    else:
        angles = position_ids[..., None].astype(jnp.float32) * inv_freq  # [B, L, rot//2]
    cos = jnp.cos(angles)[:, :, None, :] * scaling  # [B, L, 1, rot//2]
    sin = jnp.sin(angles)[:, :, None, :] * scaling
    xf = x.astype(jnp.float32)
    x_rot, x_pass = xf[..., :rot], xf[..., rot:]
    x1, x2 = jnp.split(x_rot, 2, axis=-1)
    rotated = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    out = rotated if rot == hd else jnp.concatenate([rotated, x_pass], axis=-1)
    return out.astype(dtype)


def swiglu(gate: jax.Array, up: jax.Array) -> jax.Array:
    return jax.nn.silu(gate) * up


def clamped_glu(gate: jax.Array, up: jax.Array, alpha: float, limit: float) -> jax.Array:
    """gpt-oss expert activation: clamp both branches, gated sigmoid(alpha·g)
    with a +1 on the linear branch (reference: gpt_oss GptOssExperts.forward)."""
    gate = jnp.minimum(gate, limit)
    up = jnp.clip(up, -limit, limit)
    return (up + 1.0) * (gate * jax.nn.sigmoid(alpha * gate))
