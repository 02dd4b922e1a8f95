"""Chunked gated delta rule (GatedDeltaNet linear attention), TPU-native.

Behavior parity target: the published gated-delta-rule math as shipped in
HF transformers' Qwen3-Next (`torch_chunk_gated_delta_rule` /
`torch_recurrent_gated_delta_rule`) and the reference's FLA kernel use
(reference: trainer/models/qwen3_5_moe/modeling_qwen3_5_moe.py:86-232
chunk_gated_delta_rule call; the reference outsources the kernel to
fla-org/flash-linear-attention Triton — this is an original JAX
implementation of the same recurrence).

Recurrence (per head; S_t is a [Dk, Dv] fast-weight state):
    S_t = exp(g_t) * S_{t-1} + beta_t * k_t (v_t - exp(g_t)^T? ...)
precisely:  S_t = exp(g_t) * S_{t-1} + k_t ⊗ beta_t (v_t - (exp(g_t) S_{t-1})^T k_t)
    o_t = S_t^T q_t * Dk^-0.5          (q, k L2-normalized per head)

TPU form: the sequence is processed in chunks of 64. Within a chunk the
delta-rule corrections are solved in closed form via the WY representation:
T = (I - A)^{-1} for the strictly-lower A = -(beta k)(k)^T ⊙ decay, computed
by NEUMANN DOUBLING ((I-A)^{-1} = Π (I + A^{2^j}), A nilpotent) — six 64×64
matmuls on the MXU instead of a sequential row loop or an XLA
triangular-solve (which lowers poorly on TPU). Chunks are then combined with
a `lax.scan` carrying the [B, H, Dk, Dv] state.

Packed-sequence resets use the same device as ops/mamba.py: a large negative
log-decay injected at each segment start makes every cross-boundary decay
factor exactly exp(-1e9) = 0 in all four places it appears (intra-chunk
decay mask, state read, state write, state carry), so packing is exact.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG = -1e9

# process-wide default for the chunked kernel's matmul precision; set from
# ModelConfig.gdn_mxu_precision by the trainer/engine entrypoints ("bfloat16"
# = full-rate MXU dots with f32 accumulation)
MXU_PRECISION = "highest"


def _l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # fla l2norm: x / sqrt(sum x^2 + eps) (matches HF torch_chunk path)
    return x * jax.lax.rsqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True) + eps)


def _neumann_tril_inv(a: jax.Array, chunk: int) -> jax.Array:
    """(I - a)^{-1} for strictly-lower-triangular a [..., C, C] via doubling:
    T_{j+1} = (I + a^{2^j}) T_j. Exact after ceil(log2(C)) steps."""
    eye = jnp.eye(chunk, dtype=a.dtype)
    t = eye + a
    p = a
    steps = max(1, (chunk - 1).bit_length())
    for _ in range(steps - 1):
        p = p @ p
        t = t + p @ t
    return t


def chunk_gated_delta_rule(
    q: jax.Array,      # [B, S, H, Dk]
    k: jax.Array,      # [B, S, H, Dk]
    v: jax.Array,      # [B, S, H, Dv]
    g: jax.Array,      # [B, S, H] log decay (<= 0)
    beta: jax.Array,   # [B, S, H] write strength in (0, 1)
    *,
    chunk_size: int = 64,
    segment_ids: jax.Array | None = None,  # [B, S]; 0 = pad
    initial_state: jax.Array | None = None,  # [B, H, Dk, Dv]
    l2norm_qk: bool = True,
    mxu_precision: str | None = None,
    prev_seg_tail: jax.Array | None = None,  # [B] segment id just before pos 0
    # (chunked serving prefill: the previous chunk's last token; None =
    # sequence start — position 0 then RESETS and ignores initial_state)
) -> tuple[jax.Array, jax.Array]:
    """Returns (out [B, S, H, Dv] in q.dtype, final_state [B, H, Dk, Dv] f32).

    ``mxu_precision="bfloat16"`` runs every matmul with bf16 operands and
    f32 accumulation (full-rate MXU on TPU; f32 dots are ~8x slower) — state
    math and exponentials stay f32. "highest" is the parity-test default.
    """
    if mxu_precision is None:
        mxu_precision = MXU_PRECISION
    if mxu_precision != "highest":
        with jax.default_matmul_precision(mxu_precision):
            return _chunk_gdr_impl(q, k, v, g, beta, chunk_size=chunk_size,
                                   segment_ids=segment_ids,
                                   initial_state=initial_state,
                                   l2norm_qk=l2norm_qk,
                                   prev_seg_tail=prev_seg_tail)
    return _chunk_gdr_impl(q, k, v, g, beta, chunk_size=chunk_size,
                           segment_ids=segment_ids, initial_state=initial_state,
                           l2norm_qk=l2norm_qk, prev_seg_tail=prev_seg_tail)


def _chunk_gdr_impl(
    q, k, v, g, beta, *, chunk_size=64, segment_ids=None, initial_state=None,
    l2norm_qk=True, prev_seg_tail=None,
):
    b, s, h, dk = q.shape
    dv = v.shape[-1]
    out_dtype = v.dtype
    c = chunk_size
    pad = (-s) % c
    n = (s + pad) // c

    if l2norm_qk:
        q = _l2norm(q.astype(jnp.float32))
        k = _l2norm(k.astype(jnp.float32))
    q = q.astype(jnp.float32) * (dk ** -0.5)
    k = k.astype(jnp.float32)
    v = v.astype(jnp.float32)
    g = g.astype(jnp.float32)
    beta = beta.astype(jnp.float32)

    reset = None
    if segment_ids is not None:
        prev = jnp.pad(segment_ids, ((0, 0), (1, 0)))[:, :s]
        if prev_seg_tail is not None:
            prev = prev.at[:, 0].set(prev_seg_tail)
        reset = (segment_ids != prev)  # first position of every segment
        # pad tokens neither decay nor write: g=0 keeps the carried state
        # exact through trailing pad (serving needs the state AT `length`)
        g = jnp.where((segment_ids != 0)[..., None], g, 0.0)

    def pad_t(x):
        return jnp.pad(x, ((0, 0), (0, pad)) + ((0, 0),) * (x.ndim - 2))

    # [B, H, N, C, D] chunked layout
    def chunks(x):
        x = pad_t(x)
        x = jnp.moveaxis(x, -1 if x.ndim == 3 else 2, 1)  # [B, H, S(+pad), ...]
        if x.ndim == 3:
            return x.reshape(b, h, n, c)
        return x.reshape(b, h, n, c, x.shape[-1])

    qc, kc, vc = chunks(q), chunks(k), chunks(v)
    gc = jnp.cumsum(chunks(g), axis=-1)          # within-chunk cumulative log decay
    bc = chunks(beta)

    kb = kc * bc[..., None]                      # beta-scaled keys
    vb = vc * bc[..., None]

    # intra-chunk decay matrix: exp(g_i - g_j) on the lower triangle (gc is
    # nonincreasing within a chunk, so masked diff <= 0 and exp never overflows)
    diff = gc[..., :, None] - gc[..., None, :]
    tril = jnp.tril(jnp.ones((c, c), bool))
    pair_ok = tril

    # Packed-segment resets, as EXPLICIT masks (not log-decay injection, which
    # loses the real decays to f32 cancellation): cross-segment pairs are
    # masked from the intra-chunk matrices; tokens at/after a reset never read
    # the carried state; tokens before a reset never write the outgoing state;
    # the carried state dies entirely in a chunk containing a reset.
    read_ok = write_ok = carry_ok = None
    if reset is not None:
        seg_pad = jnp.pad(segment_ids, ((0, 0), (0, pad)))
        seg_c = seg_pad.reshape(b, 1, n, c)
        pair_ok = tril & (seg_c[..., :, None] == seg_c[..., None, :])
        # resets at real (nonzero) segment starts; pad tokens never write
        res_c = (reset & (segment_ids != 0))
        res_c = jnp.pad(res_c, ((0, 0), (0, pad))).reshape(b, 1, n, c)
        valid_c = (seg_c != 0)
        cum = jnp.cumsum(res_c, axis=-1)
        total = cum[..., -1:]
        read_ok = (cum == 0).astype(jnp.float32)[..., None]          # no reset <= i
        write_ok = (((total - cum) == 0) & valid_c).astype(jnp.float32)[..., None]
        carry_ok = (total[..., 0] == 0).astype(jnp.float32)          # [B,1,N]
    decay = jnp.exp(jnp.where(pair_ok, diff, NEG))

    a = -jnp.tril((kb @ jnp.swapaxes(kc, -1, -2)) * decay, -1)  # strictly lower
    t = _neumann_tril_inv(a, c)                  # [B, H, N, C, C]

    u = t @ vb                                   # corrected values
    read_f = jnp.exp(gc)[..., None]              # state-read decay per token
    if read_ok is not None:
        read_f = read_f * read_ok
    w = t @ (kb * read_f)                        # state-read weights

    g_last = gc[..., -1]                         # [B, H, N]
    attn = jnp.where(pair_ok, (qc @ jnp.swapaxes(kc, -1, -2)) * decay, 0.0)

    write_f = jnp.exp(g_last[..., None] - gc)[..., None]  # state-write decay
    if write_ok is not None:
        write_f = write_f * write_ok
    carry_f = jnp.exp(g_last)                    # [B, H, N]
    if carry_ok is not None:
        carry_f = carry_f * carry_ok

    s0 = (jnp.zeros((b, h, dk, dv), jnp.float32) if initial_state is None
          else initial_state.astype(jnp.float32))

    def step(state, xs):
        qr_i, kw_i, u_i, w_i, attn_i, cf_i = xs
        v_new = u_i - w_i @ state                         # [B, H, C, Dv]
        out_i = qr_i @ state + attn_i @ v_new
        state = state * cf_i[..., None, None] + \
            jnp.swapaxes(kw_i, -1, -2) @ v_new
        return state, out_i

    xs = tuple(jnp.moveaxis(x, 2, 0)
               for x in (qc * read_f, kc * write_f, u, w, attn,
                         jnp.broadcast_to(carry_f, qc.shape[:3])))
    state, outs = jax.lax.scan(step, s0, xs)
    out = jnp.moveaxis(outs, 0, 2)               # [B, H, N, C, Dv]
    out = out.reshape(b, h, n * c, dv)[:, :, :s]
    return jnp.moveaxis(out, 1, 2).astype(out_dtype), state


def recurrent_gated_delta_rule(
    q: jax.Array,      # [B, H, Dk] one token per batch row
    k: jax.Array,
    v: jax.Array,      # [B, H, Dv]
    g: jax.Array,      # [B, H]
    beta: jax.Array,   # [B, H]
    state: jax.Array,  # [B, H, Dk, Dv] f32
    *,
    l2norm_qk: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Single-token decode step (serving analogue of the chunked form).
    Returns (out [B, H, Dv], new_state)."""
    dk = q.shape[-1]
    if l2norm_qk:
        q = _l2norm(q.astype(jnp.float32))
        k = _l2norm(k.astype(jnp.float32))
    q = q.astype(jnp.float32) * (dk ** -0.5)
    k = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    state = state * jnp.exp(g.astype(jnp.float32))[..., None, None]
    kv_mem = jnp.einsum("bhkv,bhk->bhv", state, k)
    delta = (vf - kv_mem) * beta.astype(jnp.float32)[..., None]
    state = state + k[..., :, None] * delta[..., None, :]
    out = jnp.einsum("bhkv,bhk->bhv", state, q)
    return out.astype(v.dtype), state
