"""Mamba-2 SSD ops: chunked state-space scan + causal depthwise conv, both
segment-aware for packed sequences.

TPU-native replacement for the reference's Triton `_mamba_chunk_scan_combined`
(reference: nemotron_h/modeling_nemotron_h.py patched mixer + cp_mamba.py):
the SSD "state-space duality" form is all matmuls over chunks — intra-chunk
quadratic blocks + an inter-chunk decay recurrence — which tiles straight
onto the MXU (no sequential scan over L). Packed-sequence resets are exact:
a large negative log-decay is injected at each segment start, so any
contribution crossing a boundary decays to exactly zero while same-segment
and own-token terms are untouched (the Triton kernel's seq_idx mechanism).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

RESET_NEG = -1e4  # exp(-1e4) == 0 in f32, but cumsums stay finite


def _segsum(a: jax.Array) -> jax.Array:
    """[..., Q] log-decays -> [..., Q, Q] lower-triangular pairwise sums:
    out[..., j, i] = sum(a[..., i+1 : j+1]) for j >= i, -inf above."""
    q = a.shape[-1]
    cum = jnp.cumsum(a, axis=-1)
    diff = cum[..., :, None] - cum[..., None, :]  # [..., j, i] = sum (i, j]
    mask = jnp.tril(jnp.ones((q, q), bool))
    return jnp.where(mask, diff, -jnp.inf)


def causal_conv1d(
    x: jax.Array,  # [B, L, C]
    weight: jax.Array,  # [C, K] depthwise taps (tap k multiplies x[t-K+1+k])
    bias: jax.Array | None,
    segment_ids: jax.Array | None = None,  # [B, L]; taps never cross segments
) -> jax.Array:
    """Depthwise causal conv as K shifted multiplies (K is 4): exact segment
    masking beats a conv op that would need post-hoc correction."""
    b, l, c = x.shape
    k = weight.shape[1]
    out = x * weight[None, None, :, k - 1]
    for s in range(1, k):
        shifted = jnp.pad(x, ((0, 0), (s, 0), (0, 0)))[:, :l]
        if segment_ids is not None:
            seg_shift = jnp.pad(segment_ids, ((0, 0), (s, 0)))[:, :l]
            same = (seg_shift == segment_ids) & (segment_ids != 0)
            shifted = shifted * same[..., None]
        out = out + shifted * weight[None, None, :, k - 1 - s]
    if bias is not None:
        out = out + bias
    return out


def _ssd_phase1(
    x: jax.Array,  # [B, L, H, P]
    dt: jax.Array,  # [B, L, H] post-softplus time steps
    a_log: jax.Array,  # [H]
    b_in: jax.Array,  # [B, L, G, N]
    c_in: jax.Array,  # [B, L, G, N]
    d_skip: jax.Array,  # [H]
    chunk_size: int,
    segment_ids: jax.Array | None,
    prev_seg_tail: jax.Array | None = None,  # [B] segment id just before pos 0
    # (CP: the previous rank's last token; None = sequence start, id 0)
) -> dict:
    """Initial-state-INDEPENDENT part of the SSD: discretize, chunk, intra-
    chunk quadratic blocks, raw per-chunk states. This is where the FLOPs
    are; _ssd_phase2 threads the initial state through cheap state ops, so
    context-parallel ranks only serialize phase 2's carry."""
    bsz, l, h, p = x.shape
    f32 = jnp.float32
    x = x.astype(f32)
    dt = dt.astype(f32)
    a = -jnp.exp(a_log.astype(f32))  # [H], negative

    rep = h // b_in.shape[2]
    b_full = jnp.repeat(b_in.astype(f32), rep, axis=2)  # [B, L, H, N]
    c_full = jnp.repeat(c_in.astype(f32), rep, axis=2)

    pad = (-l) % chunk_size
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
        b_full = jnp.pad(b_full, ((0, 0), (0, pad), (0, 0), (0, 0)))
        c_full = jnp.pad(c_full, ((0, 0), (0, pad), (0, 0), (0, 0)))
    lp = l + pad

    d_residual = d_skip.astype(f32)[None, None, :, None] * x

    # discretize
    xd = x * dt[..., None]  # [B, Lp, H, P]
    a_pos = a[None, None, :] * dt  # [B, Lp, H] log-decay per position
    if segment_ids is not None:
        seg = jnp.pad(segment_ids, ((0, 0), (0, pad)))
        prev = jnp.pad(seg, ((0, 0), (1, 0)))[:, :lp]
        if prev_seg_tail is not None:
            prev = prev.at[:, 0].set(prev_seg_tail)
        reset = (seg != prev)  # first position of every segment (and pad edges)
        # decay THROUGH a reset position is exactly zero; own-token terms
        # never include their own a, so they survive
        a_pos = a_pos + jnp.where(reset[..., None], RESET_NEG, 0.0)

    ch = lp // chunk_size
    q = chunk_size

    def chunks(t):
        return t.reshape((bsz, ch, q) + t.shape[2:])

    xc = chunks(xd)  # [B, C, Q, H, P]
    bc = chunks(b_full)  # [B, C, Q, H, N]
    cc = chunks(c_full)
    ac = chunks(a_pos).transpose(0, 3, 1, 2)  # [B, H, C, Q]
    a_cum = jnp.cumsum(ac, axis=-1)  # [B, H, C, Q]

    # 1. intra-chunk (diagonal blocks)
    l_intra = jnp.exp(_segsum(ac))  # [B, H, C, Q(j), Q(i)]
    scores = jnp.einsum("bcqhn,bcshn->bhcqs", cc, bc)  # [B,H,C,Q(j),Q(i)]
    y_diag = jnp.einsum("bhcqs,bhcqs,bcshp->bcqhp", scores, l_intra, xc)

    # 2. per-chunk states (B terms decayed to chunk end)
    decay_states = jnp.exp(a_cum[..., -1:] - a_cum)  # [B, H, C, Q]
    states = jnp.einsum("bcqhn,bhcq,bcqhp->bchpn", bc, decay_states, xc)

    return dict(y_diag=y_diag, states=states, a_cum=a_cum, cc=cc,
                d_residual=d_residual, orig_len=l, shape=(bsz, lp, h, p))


def _ssd_phase2(pieces: dict, initial_state: jax.Array | None):
    """Inter-chunk recurrence + state readout. Linear in ``initial_state``.
    Returns (y [B, L, H, P] f32, final_state [B, H, P, N])."""
    bsz, lp, h, p = pieces["shape"]
    states, a_cum, cc = pieces["states"], pieces["a_cum"], pieces["cc"]
    n = states.shape[-1]
    if initial_state is None:
        initial_state = jnp.zeros((bsz, h, p, n), jnp.float32)

    # 3. inter-chunk recurrence over chunk states
    states = jnp.concatenate([initial_state[:, None], states], axis=1)
    chunk_decay = jnp.pad(a_cum[..., -1], ((0, 0), (0, 0), (1, 0)))  # [B, H, C+1]
    decay_chunk = jnp.exp(_segsum(chunk_decay))  # [B, H, C+1(j), C+1(i)]
    new_states = jnp.einsum("bhzc,bchpn->bzhpn", decay_chunk, states)
    states, final_state = new_states[:, :-1], new_states[:, -1]

    # 4. state -> output per chunk (C terms)
    state_decay_out = jnp.exp(a_cum)  # [B, H, C, Q]
    y_off = jnp.einsum("bcqhn,bchpn,bhcq->bcqhp", cc, states, state_decay_out)

    y = (pieces["y_diag"] + y_off).reshape(bsz, lp, h, p) + pieces["d_residual"]
    return y[:, : pieces["orig_len"]], final_state


def _ssd_local_summary(pieces: dict) -> tuple[jax.Array, jax.Array]:
    """(final_state_with_zero_init [B,H,P,N], total_decay [B,H]) — the linear
    summary a context-parallel rank exports: for any incoming carry S,
    final = final0 + total_decay * S. Cheap (no y_off readout)."""
    states, a_cum = pieces["states"], pieces["a_cum"]
    chunk_decay = jnp.pad(a_cum[..., -1], ((0, 0), (0, 0), (1, 0)))  # [B,H,C+1]
    decay_chunk = jnp.exp(_segsum(chunk_decay))  # [B,H,C+1,C+1]
    final0 = jnp.einsum("bhc,bchpn->bhpn", decay_chunk[:, :, -1, 1:], states)
    total_decay = decay_chunk[:, :, -1, 0]  # [B, H]
    return final0, total_decay


def ssd_chunked(
    x: jax.Array,  # [B, L, H, P]
    dt: jax.Array,  # [B, L, H] post-softplus time steps
    a_log: jax.Array,  # [H] A_log parameter (A = -exp(a_log))
    b_in: jax.Array,  # [B, L, G, N]
    c_in: jax.Array,  # [B, L, G, N]
    d_skip: jax.Array,  # [H] skip connection
    chunk_size: int = 64,
    segment_ids: jax.Array | None = None,  # [B, L] packed-seq resets
    initial_state: jax.Array | None = None,  # [B, H, P, N] (decode prefill)
    return_final_state: bool = False,
    prev_seg_tail: jax.Array | None = None,  # [B] (CP continuation)
):
    """Mamba-2 SSD (reference math: HF Mamba2Mixer torch_forward SSD branch;
    chunked matmul form). Returns y [B, L, H, P] (+ final ssm state)."""
    pieces = _ssd_phase1(x, dt, a_log, b_in, c_in, d_skip, chunk_size,
                         segment_ids, prev_seg_tail)
    y, final_state = _ssd_phase2(pieces, initial_state)
    if return_final_state:
        return y, final_state
    return y


def gated_rms_norm(y: jax.Array, gate: jax.Array, weight: jax.Array,
                   eps: float = 1e-5) -> jax.Array:
    """Mamba2RMSNormGated: normalize y * silu(gate), then scale."""
    f = (y * jax.nn.silu(gate)).astype(jnp.float32)
    var = jnp.mean(f * f, axis=-1, keepdims=True)
    return (f * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(y.dtype)


def mamba2_mixer(
    h_in: jax.Array,  # [B, L, D]
    lp: dict,  # layer params: in_proj, conv_w, conv_b, A_log, D, dt_bias, ssm_norm, out_proj
    *,
    num_heads: int,
    head_dim: int,
    ssm_state_size: int,
    n_groups: int,
    chunk_size: int = 64,
    segment_ids: jax.Array | None = None,
    time_step_limit: tuple[float, float] = (0.0, float("inf")),
    mesh=None,
    cp_axis: str = "context",
) -> jax.Array:
    """One Mamba-2 mixer block (HF Mamba2Mixer torch_forward parity):
    in_proj -> [gate | xBC | dt]; causal conv + silu over xBC; SSD; gated
    RMSNorm; out_proj. A ``mesh`` with a >1 ``cp_axis`` routes the conv+SSD
    through the context-parallel path (ops/cp_mamba.py)."""
    inter = num_heads * head_dim
    gn = n_groups * ssm_state_size
    proj = jnp.dot(h_in, lp["in_proj"])
    if lp.get("in_proj_bias") is not None:
        proj = proj + lp["in_proj_bias"]
    gate = proj[..., :inter]
    xbc = proj[..., inter : inter + inter + 2 * gn]
    dt = proj[..., inter + inter + 2 * gn :]  # [B, L, H]

    dt = jax.nn.softplus(dt.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32))
    lo, hi = time_step_limit
    if lo > 0.0 or hi != float("inf"):
        dt = jnp.clip(dt, lo, hi)

    bsz, l, _ = h_in.shape
    if mesh is not None and mesh.shape.get(cp_axis, 1) > 1:
        from prime_rl_tpu.ops.cp_mamba import conv_ssd_cp

        y = conv_ssd_cp(
            xbc, dt, segment_ids, lp["conv_w"], lp.get("conv_b"),
            lp["A_log"], lp["D"], mesh, axis=cp_axis,
            num_heads=num_heads, head_dim=head_dim,
            ssm_state_size=ssm_state_size, n_groups=n_groups,
            chunk_size=chunk_size,
        )
    else:
        xbc = causal_conv1d(xbc, lp["conv_w"], lp.get("conv_b"), segment_ids)
        xbc = jax.nn.silu(xbc)
        x = xbc[..., :inter]
        b_in = xbc[..., inter : inter + gn]
        c_in = xbc[..., inter + gn :]
        y = ssd_chunked(
            x.reshape(bsz, l, num_heads, head_dim),
            dt,
            lp["A_log"],
            b_in.reshape(bsz, l, n_groups, ssm_state_size),
            c_in.reshape(bsz, l, n_groups, ssm_state_size),
            lp["D"],
            chunk_size=chunk_size,
            segment_ids=segment_ids,
        )
    y = y.reshape(bsz, l, inter).astype(h_in.dtype)
    y = gated_rms_norm(y, gate, lp["ssm_norm"])
    return jnp.dot(y, lp["out_proj"])
