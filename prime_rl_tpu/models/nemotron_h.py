"""NemotronH hybrid-Mamba family (nemotron_h): per-layer pattern of Mamba-2
SSD mixers, RoPE-free attention, relu^2 MLPs, and LatentMoE blocks.

Behavior parity target: reference trainer/models/nemotron_h/ (873 LoC torch:
modeling_nemotron_h.py layer classes, configuration defaults, converter) and
the public HF NemotronH implementation. Every layer is
``residual + mixer(rms_norm(h))`` — there is no attention+MLP pairing and no
rotary embedding (position information comes from the SSM layers;
reference modeling_nemotron_h.py:401-402).

TPU design: params are grouped into four stacked type-stacks
(``mamba_layers`` / ``attn_layers`` / ``mlp_layers`` / ``moe_layers``), and
the forward unrolls the pattern string, indexing each stack in order. The
hybrid pattern is aperiodic in real checkpoints, so there is no lax.scan over
layers; each block is remat-wrapped so the backward memory profile matches
the scanned families. The Mamba mixer rides ops/mamba.py's chunked SSD
(all-matmul MXU form with exact packed-segment resets — the Triton
``_mamba_chunk_scan_combined`` analogue), and LatentMoE rides the sorted
ragged-GEMM MoE op with non-gated relu^2 experts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.ops.attention import attention
from prime_rl_tpu.ops.layers import rms_norm
from prime_rl_tpu.ops.mamba import mamba2_mixer
from prime_rl_tpu.ops.moe import moe_mlp

BLOCK_CHARS = "M*-E"


def stack_counts(spec: ModelSpec) -> dict[str, int]:
    pat = spec.layer_pattern
    if len(pat) != spec.num_layers:
        raise ValueError(
            f"layer_pattern length {len(pat)} != num_layers {spec.num_layers}")
    return {c: pat.count(c) for c in BLOCK_CHARS}


def relu2(x: jax.Array) -> jax.Array:
    return jnp.square(jax.nn.relu(x))


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32) -> Params:
    counts = stack_counts(spec)
    d = spec.hidden_size
    init = functools.partial(jax.random.truncated_normal, lower=-2.0, upper=2.0)

    def w(k, *shape):
        return (init(k, shape=shape) * 0.02).astype(dtype)

    ks = iter(jax.random.split(key, 24))
    params: Params = {
        "embed": w(next(ks), spec.vocab_size, d),
        "final_norm": jnp.ones((d,), dtype),
    }
    if not spec.tie_embeddings:
        params["lm_head"] = w(next(ks), d, spec.vocab_size)

    if counts["M"]:
        n, inter, conv = counts["M"], spec.mamba_inter, spec.mamba_conv_dim
        h = spec.mamba_num_heads
        # dt_bias ~ softplus^-1(uniform[dt_min, dt_max]), A in [1, 16) — the
        # HF Mamba2 init ranges (stability: dt must start small and positive)
        dt = np.exp(np.random.RandomState(0).uniform(
            np.log(0.001), np.log(0.1), size=(n, h))).astype(np.float32)
        params["mamba_layers"] = {
            "norm": jnp.ones((n, d), dtype),
            "in_proj": w(next(ks), n, d, inter + conv + h),
            "conv_w": w(next(ks), n, conv, spec.mamba_conv_kernel),
            "conv_b": jnp.zeros((n, conv), dtype),
            "A_log": jnp.log(jnp.linspace(1.0, 16.0, h, dtype=jnp.float32))[None, :]
            * jnp.ones((n, 1), jnp.float32),
            "D": jnp.ones((n, h), jnp.float32),
            "dt_bias": jnp.asarray(dt + np.log(-np.expm1(-dt))),
            "ssm_norm": jnp.ones((n, inter), dtype),
            "out_proj": w(next(ks), n, inter, d),
        }
    if counts["*"]:
        n = counts["*"]
        params["attn_layers"] = {
            "norm": jnp.ones((n, d), dtype),
            "q": w(next(ks), n, d, spec.q_dim),
            "k": w(next(ks), n, d, spec.kv_dim),
            "v": w(next(ks), n, d, spec.kv_dim),
            "o": w(next(ks), n, spec.q_dim, d),
        }
    if counts["-"]:
        n = counts["-"]
        params["mlp_layers"] = {
            "norm": jnp.ones((n, d), dtype),
            "up": w(next(ks), n, d, spec.intermediate_size),
            "down": w(next(ks), n, spec.intermediate_size, d),
        }
    if counts["E"]:
        n, e, m = counts["E"], spec.num_experts, spec.moe_intermediate_size
        latent = spec.moe_latent_size or d
        moe = {
            "norm": jnp.ones((n, d), dtype),
            "router": w(next(ks), n, d, e),
            "router_correction_bias": jnp.zeros((n, e), jnp.float32),
            "expert_up": w(next(ks), n, e, latent, m),
            "expert_down": w(next(ks), n, e, m, latent),
            "shared_up": w(next(ks), n, d, spec.moe_shared_expert_size),
            "shared_down": w(next(ks), n, spec.moe_shared_expert_size, d),
        }
        if spec.moe_latent_size:
            moe["fc1_latent"] = w(next(ks), n, d, spec.moe_latent_size)
            moe["fc2_latent"] = w(next(ks), n, spec.moe_latent_size, d)
        params["moe_layers"] = moe
    return params


def get_lm_head(params: Params, spec: ModelSpec) -> jax.Array:
    if spec.tie_embeddings:
        return params["embed"].T
    return params["lm_head"]


def _mamba_block(h, lp, spec: ModelSpec, segment_ids, compute_dtype, mesh=None):
    cast = {k: (v.astype(compute_dtype) if k in ("in_proj", "out_proj") else v)
            for k, v in lp.items()}
    x = rms_norm(h, cast["norm"], spec.rms_eps)
    y = mamba2_mixer(
        x, cast,
        num_heads=spec.mamba_num_heads, head_dim=spec.mamba_head_dim,
        ssm_state_size=spec.mamba_state_size, n_groups=spec.mamba_n_groups,
        chunk_size=spec.mamba_chunk_size, segment_ids=segment_ids,
        mesh=mesh,
    )
    return h + y


def _attn_block(h, lp, spec: ModelSpec, segment_ids, attn_impl, block_q,
                block_kv, mesh, cp_style, compute_dtype, lora_scale=1.0):
    from prime_rl_tpu.models.lora import apply_lora_proj as _p

    b, l, d = h.shape
    ll = lp.get("_lora")
    cast = {k: v.astype(compute_dtype) for k, v in lp.items() if k != "_lora"}
    x = rms_norm(h, cast["norm"], spec.rms_eps)
    q = _p(x, cast["q"], ll, "q", lora_scale).reshape(b, l, spec.num_heads, spec.head_dim)
    k = _p(x, cast["k"], ll, "k", lora_scale).reshape(b, l, spec.num_kv_heads, spec.head_dim)
    v = _p(x, cast["v"], ll, "v", lora_scale).reshape(b, l, spec.num_kv_heads, spec.head_dim)
    o = attention(q, k, v, segment_ids, causal=True, impl=attn_impl,
                  block_q=block_q, block_kv=block_kv, mesh=mesh, cp_style=cp_style)
    from jax.ad_checkpoint import checkpoint_name as _ckname
    o = _ckname(o, "attn_out")
    return h + _p(o.reshape(b, l, spec.q_dim), cast["o"], ll, "o", lora_scale)


def _mlp_block(h, lp, spec: ModelSpec, compute_dtype):
    cast = {k: v.astype(compute_dtype) for k, v in lp.items()}
    x = rms_norm(h, cast["norm"], spec.rms_eps)
    return h + jnp.dot(relu2(jnp.dot(x, cast["up"])), cast["down"])


def _moe_block(h, lp, spec: ModelSpec, compute_dtype, lora_scale=1.0):
    """LatentMoE (reference: models/layers/moe.py:1034-1230): shared relu^2
    FFN at model dim + routed non-gated relu^2 experts at latent dim, with
    DeepSeek-V3-style sigmoid/noaux-tc routing. Returns (h, load_balance).
    A reserved ``_lora`` sub-dict carries per-expert moe_* adapters (applied
    at latent dim inside moe_mlp; non-gated experts have no moe_gate)."""
    b, l, d = h.shape
    cast = {k: (v.astype(compute_dtype) if getattr(v, "ndim", 0) >= 2 and "router" not in k
                and not k.startswith("_") else v)
            for k, v in lp.items()}
    x = rms_norm(h, cast["norm"], spec.rms_eps)
    flat = x.reshape(b * l, d)
    lat = jnp.dot(flat, cast["fc1_latent"]) if "fc1_latent" in cast else flat
    out, routing = moe_mlp(
        flat,  # routing scores at model dim (reference: LatentMoE.forward)
        lp["router"],  # router math stays f32
        None,  # non-gated relu^2 experts
        cast["expert_up"], cast["expert_down"],
        spec.num_experts_per_tok, spec.norm_topk_prob,
        x_experts=lat,  # expert compute at latent dim
        sigmoid_noaux=spec.router_sigmoid,
        correction_bias=lp.get("router_correction_bias"),
        n_group=spec.n_group, topk_group=spec.topk_group,
        routed_scaling=spec.routed_scaling_factor,
        lora=lp.get("_lora"), lora_scale=lora_scale,
    )
    if "fc2_latent" in cast:
        out = jnp.dot(out, cast["fc2_latent"])
    out = out.reshape(b, l, d)
    out = out + jnp.dot(relu2(jnp.dot(x, cast["shared_up"])), cast["shared_down"])
    return h + out, routing.load_balance_loss


def forward(
    params: Params,
    spec: ModelSpec,
    input_ids: jax.Array,
    segment_ids: jax.Array,
    position_ids: jax.Array,  # unused: no RoPE in NemotronH
    compute_dtype=jnp.bfloat16,
    attn_impl: str = "auto",
    block_q: int = 512,
    block_kv: int = 512,
    remat: str = "full",
    mesh=None,
    lora=None,
    lora_scale: float = 1.0,
    cp_style: str = "ulysses",
    collect_aux: bool = False,
):
    del position_ids
    embed = params["embed"].astype(compute_dtype)
    h = jnp.take(embed, input_ids, axis=0)
    aux = jnp.float32(0.0)

    def wrap(fn):
        if remat == "full":
            return jax.checkpoint(fn, prevent_cse=False)
        if remat in ("save_attn", "offload_attn"):
            names = ("attn_out", "attn_lse")
            if remat == "save_attn":
                policy = jax.checkpoint_policies.save_only_these_names(*names)
            else:
                policy = jax.checkpoint_policies.save_and_offload_only_these_names(
                    names_which_can_be_saved=[], names_which_can_be_offloaded=list(names),
                    offload_src="device", offload_dst="pinned_host")
            return jax.checkpoint(fn, policy=policy, prevent_cse=False)
        if remat == "selective":
            return jax.checkpoint(
                fn, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
                prevent_cse=False)
        return fn

    blocks = {
        "M": wrap(functools.partial(_mamba_block, spec=spec, segment_ids=segment_ids,
                                    compute_dtype=compute_dtype, mesh=mesh)),
        "*": wrap(functools.partial(_attn_block, spec=spec, segment_ids=segment_ids,
                                    attn_impl=attn_impl, block_q=block_q,
                                    block_kv=block_kv, mesh=mesh, cp_style=cp_style,
                                    compute_dtype=compute_dtype,
                                    lora_scale=lora_scale)),
        "-": wrap(functools.partial(_mlp_block, spec=spec, compute_dtype=compute_dtype)),
        "E": wrap(functools.partial(_moe_block, spec=spec, compute_dtype=compute_dtype,
                                    lora_scale=lora_scale)),
    }
    stacks = {"M": params.get("mamba_layers"), "*": params.get("attn_layers"),
              "-": params.get("mlp_layers"), "E": params.get("moe_layers")}
    if lora is not None:
        # select each stack's adapter rows from the [nl, ...] stacks
        # (attention projections on '*', moe_* expert targets on 'E'); ride a
        # reserved "_lora" sub-dict
        for ch in ("*", "E"):
            if stacks[ch] is None:
                continue
            sidx = jnp.asarray(
                np.nonzero([c == ch for c in spec.layer_pattern])[0])
            stacks[ch] = dict(stacks[ch],
                              _lora=jax.tree.map(lambda x, i=sidx: x[i],
                                                 lora["layers"]))

    idx = {c: 0 for c in BLOCK_CHARS}
    for ch in spec.layer_pattern:
        lp = jax.tree.map(lambda x, i=idx[ch]: x[i], stacks[ch])
        idx[ch] += 1
        if ch == "E":
            h, lb = blocks[ch](h, lp)
            aux = aux + lb
        else:
            h = blocks[ch](h, lp)
    h = rms_norm(h, params["final_norm"], spec.rms_eps)
    return (h, aux) if collect_aux else h


# ---------------------------------------------------------------------------
# HF interchange (reference: nemotron_h/converting_nemotron_h.py — the
# ``backbone.`` prefix, the unified per-layer ``mixer.`` namespace split by
# which sub-key is present, per-expert up/down with no gate). Torch Linears
# are [out, in] -> transposed into our [in, out].
# ---------------------------------------------------------------------------

_MAMBA_KEYS = [
    ("in_proj", "in_proj.weight", True),
    ("conv_b", "conv1d.bias", False),
    ("A_log", "A_log", False),
    ("D", "D", False),
    ("dt_bias", "dt_bias", False),
    ("ssm_norm", "norm.weight", False),
    ("out_proj", "out_proj.weight", True),
]
_ATTN_KEYS = [("q", "q_proj.weight", True), ("k", "k_proj.weight", True),
              ("v", "v_proj.weight", True), ("o", "o_proj.weight", True)]
_MLP_KEYS = [("up", "up_proj.weight", True), ("down", "down_proj.weight", True)]


def _layer_type(state: dict, i: int) -> str:
    pre = f"backbone.layers.{i}.mixer."
    if pre + "A_log" in state:
        return "M"
    if pre + "q_proj.weight" in state:
        return "*"
    if pre + "gate.weight" in state:
        return "E"
    if pre + "up_proj.weight" in state:
        return "-"
    raise KeyError(f"cannot classify layer {i}: no known mixer key under {pre!r}")


def params_from_hf_state_dict(state: dict, spec: ModelSpec, dtype=np.float32) -> Params:
    def get(key, tr):
        arr = np.asarray(state[key], dtype=dtype)
        return arr.T if tr else arr

    stacks: dict[str, dict[str, list]] = {c: {} for c in BLOCK_CHARS}
    for i in range(spec.num_layers):
        ch = _layer_type(state, i)
        if spec.layer_pattern and spec.layer_pattern[i] != ch:
            raise ValueError(
                f"layer {i}: checkpoint block type {ch!r} != spec pattern "
                f"{spec.layer_pattern[i]!r}")
        pre = f"backbone.layers.{i}.mixer."
        lp: dict[str, np.ndarray] = {"norm": get(f"backbone.layers.{i}.norm.weight", False)}
        if ch == "M":
            for ours, suf, tr in _MAMBA_KEYS:
                lp[ours] = get(pre + suf, tr)
            lp["conv_w"] = np.asarray(state[pre + "conv1d.weight"], dtype=dtype)[:, 0, :]
        elif ch == "*":
            for ours, suf, tr in _ATTN_KEYS:
                lp[ours] = get(pre + suf, tr)
        elif ch == "-":
            for ours, suf, tr in _MLP_KEYS:
                lp[ours] = get(pre + suf, tr)
        else:
            lp["router"] = get(pre + "gate.weight", True)
            lp["router_correction_bias"] = get(pre + "gate.e_score_correction_bias", False)
            if pre + "experts.up_proj" in state:  # fused-at-experts 3-D form
                lp["expert_up"] = np.asarray(state[pre + "experts.up_proj"],
                                             dtype=dtype).transpose(0, 2, 1)
                lp["expert_down"] = np.asarray(state[pre + "experts.down_proj"],
                                               dtype=dtype).transpose(0, 2, 1)
            else:
                lp["expert_up"] = np.stack([
                    get(pre + f"experts.{e}.up_proj.weight", True)
                    for e in range(spec.num_experts)])
                lp["expert_down"] = np.stack([
                    get(pre + f"experts.{e}.down_proj.weight", True)
                    for e in range(spec.num_experts)])
            lp["shared_up"] = get(pre + "shared_experts.up_proj.weight", True)
            lp["shared_down"] = get(pre + "shared_experts.down_proj.weight", True)
            if spec.moe_latent_size:
                lp["fc1_latent"] = get(pre + "fc1_latent_proj.weight", True)
                lp["fc2_latent"] = get(pre + "fc2_latent_proj.weight", True)
        for k, v in lp.items():
            stacks[ch].setdefault(k, []).append(v)

    name = {"M": "mamba_layers", "*": "attn_layers", "-": "mlp_layers", "E": "moe_layers"}
    params: Params = {
        "embed": get("backbone.embeddings.weight", False),
        "final_norm": get("backbone.norm_f.weight", False),
    }
    for ch, fields in stacks.items():
        if fields:
            params[name[ch]] = {k: np.stack(v) for k, v in fields.items()}
    if not spec.tie_embeddings:
        params["lm_head"] = get("lm_head.weight", True)
    return jax.tree.map(jnp.asarray, params)


def params_to_hf_state_dict(params: Params, spec: ModelSpec) -> dict:
    state: dict[str, np.ndarray] = {
        "backbone.embeddings.weight": np.asarray(params["embed"]),
        "backbone.norm_f.weight": np.asarray(params["final_norm"]),
    }
    name = {"M": "mamba_layers", "*": "attn_layers", "-": "mlp_layers", "E": "moe_layers"}
    idx = {c: 0 for c in BLOCK_CHARS}
    for i, ch in enumerate(spec.layer_pattern):
        lp = jax.tree.map(lambda x, j=idx[ch]: np.asarray(x[j]), params[name[ch]])
        idx[ch] += 1
        pre = f"backbone.layers.{i}.mixer."
        state[f"backbone.layers.{i}.norm.weight"] = lp["norm"]
        if ch == "M":
            for ours, suf, tr in _MAMBA_KEYS:
                state[pre + suf] = lp[ours].T if tr else lp[ours]
            state[pre + "conv1d.weight"] = lp["conv_w"][:, None, :]
        elif ch == "*":
            for ours, suf, tr in _ATTN_KEYS:
                state[pre + suf] = lp[ours].T if tr else lp[ours]
        elif ch == "-":
            for ours, suf, tr in _MLP_KEYS:
                state[pre + suf] = lp[ours].T if tr else lp[ours]
        else:
            state[pre + "gate.weight"] = lp["router"].T
            state[pre + "gate.e_score_correction_bias"] = lp["router_correction_bias"]
            for e in range(spec.num_experts):
                state[pre + f"experts.{e}.up_proj.weight"] = lp["expert_up"][e].T
                state[pre + f"experts.{e}.down_proj.weight"] = lp["expert_down"][e].T
            state[pre + "shared_experts.up_proj.weight"] = lp["shared_up"].T
            state[pre + "shared_experts.down_proj.weight"] = lp["shared_down"].T
            if spec.moe_latent_size:
                state[pre + "fc1_latent_proj.weight"] = lp["fc1_latent"].T
                state[pre + "fc2_latent_proj.weight"] = lp["fc2_latent"].T
    if not spec.tie_embeddings:
        state["lm_head.weight"] = np.asarray(params["lm_head"]).T
    return state


from prime_rl_tpu.models import Family, register_family  # noqa: E402

register_family("nemotron_h", Family(
    init_params, forward, params_from_hf_state_dict, params_to_hf_state_dict, get_lm_head,
))
