"""The jitted learner step: forward → fused logprob head → 3-component loss →
grad → optax update, with in-program gradient accumulation.

TPU-first design (replaces the reference's Python micro-batch loop +
FSDP backward hooks, reference: trainer/rl/train.py:343-586):

- Micro-batches are **stacked on a leading axis** and accumulated with
  ``lax.scan`` inside ONE jitted program: one compile, no host round-trips
  between micro-batches, and XLA overlaps the FSDP all-gathers with compute.
- Params live in float32 masters sharded over (fsdp, tensor); the forward
  casts to bfloat16 per-layer (MXU). Gradients come out in float32.
- Normalization: grads are divided by **global** per-component token counts
  (`scales`, all-reduced by the caller across processes), so DP-degree
  changes never change the effective loss — the analogue of the reference's
  `fsdp_gradient_divide_factor` fixup (reference: rl/train.py:564-577).
- Donation: the caller jits with ``donate_argnums=(0,)`` so the previous
  step's params/optimizer buffers are reused in place.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from prime_rl_tpu.models import base as model_base
from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import ModelSpec, Params
from prime_rl_tpu.ops.lm_head import chunked_logprob_entropy
from prime_rl_tpu.parallel.mesh import DATA_AXES, MeshInfo
from prime_rl_tpu.trainer.rl import loss as loss_lib
from prime_rl_tpu.trainer.rl.loss import MaskedStat

Array = jax.Array


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: Array  # int32 scalar


class MicroBatchArrays(NamedTuple):
    """Device-side packed micro-batch streams, all [N, B, L] (N = stacked
    micro-batches; absent optional streams are None — static per config)."""

    input_ids: Array  # int32
    loss_mask: Array  # bool
    advantages: Array  # float32
    inference_logprobs: Array  # float32
    position_ids: Array  # int32
    segment_ids: Array  # int32, 0 = padding
    temperatures: Array  # float32
    ref_logprobs: Array | None = None
    rl_weights: Array | None = None
    ce_weights: Array | None = None
    ref_kl_weights: Array | None = None
    # router replay: sampler-recorded expert selection [N, B, L, NL, K]
    # (-1 rows = trainer's own routing; reference: routed_experts replay)
    routed_experts: Array | None = None
    # VLM streams (present iff the model is a VLM family; trainer/batch.py
    # _assemble_mm builds them uniformly for every micro-batch)
    mm_patches: Array | None = None  # f32 [N, P, patch_dim]
    mm_vis_seg_ids: Array | None = None  # int32 [N, P], 0 = pad
    mm_vis_pos_idx: Array | None = None  # int32 [N, 4, P]
    mm_vis_pos_w: Array | None = None  # f32 [N, 4, P]
    mm_vis_rope_coords: Array | None = None  # int32 [N, P, 2]
    mm_img_slot: Array | None = None  # int32 [N, B, L]
    mm_position_ids: Array | None = None  # int32 [N, 3, B, L]


class Scales(NamedTuple):
    """Global (cross-rank, whole-step) per-component token counts."""

    rl: Array
    ce: Array
    ref_kl: Array


def _shift_left(x: Array, fill) -> Array:
    return jnp.concatenate([x[:, 1:], jnp.full_like(x[:, :1], fill)], axis=1)


def _shift_right(x: Array, fill) -> Array:
    return jnp.concatenate([jnp.full_like(x[:, :1], fill), x[:, :-1]], axis=1)


def model_logprobs(
    params: Params,
    spec: ModelSpec,
    mb,  # one micro-batch: fields [B, L]
    model_cfg,
    mesh=None,
    lora: Params | None = None,
    lora_scale: float = 1.0,
) -> tuple[Array, Array]:
    """(logprobs [B, L], entropy [B, L]) in current-token convention:
    out[i] = logp(token_i | tokens_<i). Position 0 of each packed row gets the
    uniform-distribution pad (log 1/V, log V) — those positions are always
    loss-masked (reference convention: loss.py:66-91)."""
    from prime_rl_tpu.models import get_family

    family = get_family(spec)
    extra = {} if lora is None else {"lora": lora, "lora_scale": lora_scale}
    collect_aux = spec.is_moe and model_cfg.moe_aux_coef > 0
    if collect_aux:
        extra["collect_aux"] = True
    if mb.routed_experts is not None and spec.is_moe:
        extra["routed_experts"] = mb.routed_experts
    if getattr(model_cfg, "quantized_compute", None):
        if spec.family not in ("qwen3", "llama"):
            raise ValueError(
                f"quantized_compute={model_cfg.quantized_compute!r} is only "
                f"wired for the qwen3/llama dense families, not {spec.family!r}")
        extra["quantized_compute"] = model_cfg.quantized_compute
    if mb.mm_patches is not None:
        extra["mm"] = {
            "patches": mb.mm_patches,
            "vis_seg_ids": mb.mm_vis_seg_ids,
            "vis_pos_idx": mb.mm_vis_pos_idx,
            "vis_pos_w": mb.mm_vis_pos_w,
            "vis_rope_coords": mb.mm_vis_rope_coords,
            "img_slot": mb.mm_img_slot,
            "mm_position_ids": mb.mm_position_ids,
        }
    hidden = family.forward(
        params, spec, mb.input_ids, mb.segment_ids, mb.position_ids,
        compute_dtype=jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16" else jnp.float32,
        attn_impl=model_cfg.attn.impl,
        block_q=model_cfg.attn.block_q,
        block_kv=model_cfg.attn.block_kv,
        remat=model_cfg.ac.mode,
        mesh=mesh,
        cp_style=model_cfg.cp_style,
        **extra,
    )
    moe_aux = jnp.float32(0.0)
    if collect_aux:
        hidden, moe_aux = hidden
    labels = _shift_left(mb.input_ids, 0)
    # logits at t are scaled by the temperature the *label* token was sampled at
    label_temps = _shift_left(mb.temperatures, 1.0)
    lm_head = family.get_lm_head(params, spec).astype(
        jnp.bfloat16 if model_cfg.compute_dtype == "bfloat16" else jnp.float32
    )
    lp_next, ent_next = chunked_logprob_entropy(
        hidden, lm_head, labels, label_temps, chunk_size=model_cfg.lm_head_chunk_size,
        softcap=spec.final_logit_softcap,
    )
    logprobs = _shift_right(lp_next, jnp.float32(-jnp.log(spec.vocab_size)))
    entropy = _shift_right(ent_next, jnp.float32(jnp.log(spec.vocab_size)))
    return logprobs, entropy, moe_aux


def make_loss_fn(spec: ModelSpec, model_cfg, loss_cfg, mesh=None, base_params: Params | None = None):
    """Per-micro-batch loss: (params, mb, scales, base) -> (loss, metrics).

    With a frozen ``base`` (LoRA mode), ``params`` is the adapter pytree and
    gradients flow only through the adapters. The base rides as a CALL
    ARGUMENT of the jitted step, never a closure: closed-over device arrays
    are baked into the program as constants (observed: 16 GB of captured
    constants lowering a 4B LoRA step)."""

    lora_mode = base_params is not None

    def loss_fn(params: Params, mb, scales: Scales, base: Params | None = None):
        if lora_mode:
            from prime_rl_tpu.models.lora import lora_scale as _ls

            logprobs, entropy, moe_aux = model_logprobs(
                base, spec, mb, model_cfg, mesh,
                lora=params, lora_scale=_ls(model_cfg.lora),
            )
        else:
            logprobs, entropy, moe_aux = model_logprobs(params, spec, mb, model_cfg, mesh)
        total, metrics = loss_lib.compute_loss(
            trainer_logprobs=logprobs,
            inference_logprobs=mb.inference_logprobs,
            advantages=mb.advantages,
            loss_mask=mb.loss_mask,
            ref_logprobs=mb.ref_logprobs,
            rl_weights=mb.rl_weights,
            ce_weights=mb.ce_weights,
            ref_kl_weights=mb.ref_kl_weights,
            loss_cfg=loss_cfg,
            rl_scale=scales.rl,
            ce_scale=scales.ce,
            ref_kl_scale=scales.ref_kl,
        )
        metrics = dict(metrics)
        if spec.is_moe and model_cfg.moe_aux_coef > 0:
            # switch-style load-balance term, trained (reference:
            # models/layers/moe.py load_balance_coeff hookup)
            total = total + model_cfg.moe_aux_coef * moe_aux
            metrics["moe_load_balance"] = MaskedStat(total=moe_aux, count=jnp.float32(1.0))
        metrics["entropy"] = loss_lib.masked_stat(entropy, mb.loss_mask)
        metrics["trainer_logprob"] = loss_lib.masked_stat(logprobs, mb.loss_mask)
        return total, metrics

    return loss_fn


def _find_adam(node):
    """Locate the ScaleByAdamState inside an optax chain state (or the
    matching node of a same-structure shardings pytree)."""
    if isinstance(node, optax.ScaleByAdamState):
        return node
    if isinstance(node, (tuple, list)):
        for c in node:
            got = _find_adam(c)
            if got is not None:
                return got
    return None


def _replace_adam(node, new_adam):
    if isinstance(node, optax.ScaleByAdamState):
        return new_adam
    if isinstance(node, tuple) and hasattr(node, "_fields"):  # NamedTuple
        return type(node)(*[_replace_adam(c, new_adam) for c in node])
    if isinstance(node, tuple):
        return tuple(_replace_adam(c, new_adam) for c in node)
    if isinstance(node, list):
        return [_replace_adam(c, new_adam) for c in node]
    return node


def make_train_step(
    spec: ModelSpec,
    model_cfg,
    loss_cfg,
    optimizer: optax.GradientTransformation,
    mesh_info: MeshInfo,
    base_params: Params | None = None,
    state_out_shardings=None,
    optimizer_cfg=None,
    schedule=None,
    grad_clip: float | None = None,
    dispatch_micro_batches: bool = False,
):
    """Build the jitted RL train step.

    fn(state, batch: MicroBatchArrays [N,B,L], scales) -> (state', metrics)

    ``base_params``: frozen base weights for LoRA mode — the state then holds
    only adapter params (reference analogue: trainer/lora.py module swap).

    ``optimizer_cfg``/``schedule``/``grad_clip``: when the optimizer is AdamW
    and the state is host-offloaded, the update runs LEAF-STREAMED — one
    small program per parameter stack, so only that leaf's moments occupy
    HBM at a time (whole-tree streaming peaks at ~3x the optimizer state and
    overflowed v5e HBM at 64k context).
    """
    # Ulysses CP engages when the mesh has a context axis > 1
    cp_mesh = mesh_info.mesh if mesh_info.cp_size > 1 else None
    loss_fn = make_loss_fn(spec, model_cfg, loss_cfg, cp_mesh, base_params)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    freeze_pats = None
    if model_cfg.freeze:
        import re

        freeze_pats = [re.compile(p) for p in model_cfg.freeze]

    def apply_freeze(grads):
        """Zero gradients for frozen param paths (reference: trainer/model.py
        freeze helpers) — trace-time regex match, no runtime cost."""
        if freeze_pats is None:
            return grads

        def mask_leaf(path, g):
            name = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            return jnp.zeros_like(g) if any(p.search(name) for p in freeze_pats) else g

        return jax.tree_util.tree_map_with_path(mask_leaf, grads)

    accum_bf16 = (getattr(model_cfg, "grad_accum_dtype", "float32") == "bfloat16"
                  and base_params is None)

    def accum_grads(params, batch: MicroBatchArrays, scales: Scales, base=None):
        # bf16 accumulation: differentiate against a pre-cast bf16 tree so
        # the per-micro-batch grad tree AND the accumulator are half-size —
        # the long-context HBM lever (f32 masters never enter the grad path)
        gp = params
        if accum_bf16:
            gp = jax.tree.map(
                lambda x: x.astype(jnp.bfloat16)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

        def accum(carry, mb):
            grads_acc, loss_acc, metrics_acc = carry
            (loss, metrics), grads = grad_fn(gp, mb, scales, base)
            grads_acc = jax.tree.map(jnp.add, grads_acc, grads)
            metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
            return (grads_acc, loss_acc + loss, metrics_acc), None

        zero_grads = jax.tree.map(jnp.zeros_like, gp)
        # trace once to get the metrics pytree structure
        metrics_shape = jax.eval_shape(
            lambda: loss_fn(gp, jax.tree.map(lambda x: x[0], batch), scales, base)[1]
        )
        zero_metrics = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape)

        (grads, loss, metrics), _ = jax.lax.scan(
            accum, (zero_grads, jnp.zeros(()), zero_metrics), batch
        )
        if accum_bf16:
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        return apply_freeze(grads), loss, metrics

    # dispatch_micro_batches: execute ONE micro-batch per device program and
    # accumulate across host dispatches (donated accumulators). Identical
    # math to the in-scan accumulation; bounds single-program wall time —
    # remote TPU runtimes (the axon tunnel) kill programs running over
    # ~100 s, which a 4-micro-batch 64k-context step exceeds.
    def _mb_cast(params):
        if not accum_bf16:
            return params
        return jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, params)

    @functools.partial(jax.jit, donate_argnums=(3, 4, 5))
    def one_mb_jit(gp, mb, scales, g_acc, loss_acc, metrics_acc, base=None):
        (loss, metrics), grads = grad_fn(gp, mb, scales, base)
        g_acc = jax.tree.map(jnp.add, g_acc, grads)
        metrics_acc = jax.tree.map(jnp.add, metrics_acc, metrics)
        return g_acc, loss_acc + loss, metrics_acc

    cast_mb_jit = jax.jit(_mb_cast)
    zeros_jit = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))

    @jax.jit
    def finalize_grads_jit(grads):
        if accum_bf16:
            grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        return apply_freeze(grads)

    def dispatched_accum(params, batch: MicroBatchArrays, scales: Scales, base=None):
        gp = cast_mb_jit(params) if accum_bf16 else params
        n = batch.input_ids.shape[0]
        g_acc = zeros_jit(gp)
        metrics_shape = jax.eval_shape(
            lambda: loss_fn(gp, jax.tree.map(lambda x: x[0], batch), scales, base)[1])
        loss = jnp.zeros(())
        metrics = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), metrics_shape)
        for i in range(n):
            mb = jax.tree.map(lambda x: x[i] if x is not None else None, batch)
            g_acc, loss, metrics = one_mb_jit(gp, mb, scales, g_acc, loss, metrics, base)
        return finalize_grads_jit(g_acc), loss, metrics

    def apply_update(state: TrainState, grads):
        # bf16 masters: moments/updates still run in f32
        grads = jax.tree.map(
            lambda g: g.astype(jnp.float32)
            if jnp.issubdtype(g.dtype, jnp.floating) else g, grads)
        grad_norm = optax.global_norm(grads)
        opt_state_in = state.opt_state
        if state_out_shardings is not None:
            # host-offloaded optimizer state: stream to device for the update
            # (out_shardings streams the new state back to pinned host)
            def to_device(x, sh):
                try:
                    return jax.device_put(x, sh.with_memory_kind("device"))
                except Exception:
                    return x

            opt_state_in = jax.tree.map(to_device, opt_state_in,
                                        state_out_shardings.opt_state)
        updates, opt_state = optimizer.update(grads, opt_state_in, state.params)
        if state_out_shardings is not None:
            # stream the updated state back to its (possibly host) home
            def to_home(x, sh):
                try:
                    return jax.device_put(x, sh)
                except Exception:
                    return x

            opt_state = jax.tree.map(to_home, opt_state, state_out_shardings.opt_state)
        if any(l.dtype == jnp.bfloat16
               for l in jax.tree.leaves(state.params)
               if jnp.issubdtype(l.dtype, jnp.floating)):
            # bf16 masters: apply the f32 update with stochastic rounding so
            # sub-bf16-ulp updates survive in expectation (master_dtype lever)
            from prime_rl_tpu.trainer.optim import stochastic_round_to

            step_key = jax.random.fold_in(jax.random.key(17), state.step)
            leaves, treedef = jax.tree_util.tree_flatten(state.params)
            u_leaves = jax.tree.leaves(updates)
            new_leaves = []
            for i, (p, u) in enumerate(zip(leaves, u_leaves)):
                if p.dtype == jnp.bfloat16:
                    new_leaves.append(stochastic_round_to(
                        jnp.bfloat16, p.astype(jnp.float32) + u,
                        jax.random.fold_in(step_key, i)))
                else:
                    new_leaves.append((p + u.astype(p.dtype)))
            params = jax.tree_util.tree_unflatten(treedef, new_leaves)
        else:
            params = optax.apply_updates(state.params, updates)
        return TrainState(params=params, opt_state=opt_state, step=state.step + 1), grad_norm

    if state_out_shardings is None:
        if dispatch_micro_batches:
            update_jit0 = jax.jit(apply_update, donate_argnums=(0,))

            def dispatched_step(state, batch, scales):
                grads, loss, metrics = dispatched_accum(state.params, batch, scales,
                                                        base_params)
                new_state, grad_norm = update_jit0(state, grads)
                metrics = dict(metrics)
                metrics["loss"] = loss
                metrics["grad_norm"] = grad_norm
                return new_state, metrics

            return dispatched_step

        def step_fn(state: TrainState, batch: MicroBatchArrays, scales: Scales,
                    base=None):
            grads, loss, metrics = accum_grads(state.params, batch, scales, base)
            new_state, grad_norm = apply_update(state, grads)
            metrics = dict(metrics)
            metrics["loss"] = loss
            metrics["grad_norm"] = grad_norm
            return new_state, metrics

        # The caller device_puts the batch with batch_sharding(); jit respects
        # those committed shardings and the donated state keeps its layout.
        # The frozen LoRA base rides as a jit ARGUMENT (see make_loss_fn).
        jitted = jax.jit(step_fn, donate_argnums=(0,))
        if base_params is None:
            return jitted
        return lambda state, batch, scales: jitted(state, batch, scales, base_params)

    # Host-offloaded optimizer: separate grad and update programs. Inside a
    # single jit, XLA overlaps the opt-state host->device prefetch with the
    # backward, so streamed state co-resides with peak backward activations —
    # at long context that overflows HBM (observed as a TPU worker crash at
    # 64k). ``state_out_shardings`` pins the output layout (state returns to
    # pinned host memory).
    grads_jit = dispatched_accum if dispatch_micro_batches else jax.jit(accum_grads)
    # (offload paths never run LoRA mode: base_params is None here)

    from prime_rl_tpu.configs.shared import AdamWConfig

    if isinstance(optimizer_cfg, AdamWConfig) and schedule is not None:
        return _make_streamed_adamw_step(
            grads_jit, optimizer_cfg, schedule, grad_clip, state_out_shardings)

    update_jit = jax.jit(apply_update, donate_argnums=(0, 1),
                         out_shardings=(state_out_shardings, None))

    def split_step(state: TrainState, batch: MicroBatchArrays, scales: Scales):
        grads, loss, metrics = grads_jit(state.params, batch, scales)
        new_state, grad_norm = update_jit(state, grads)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = grad_norm
        return new_state, metrics

    return split_step


def _make_streamed_adamw_step(grads_jit, cfg, schedule, grad_clip, state_out_shardings):
    """Leaf-streamed AdamW for host-offloaded state: one program per param
    stack (p, g, leaf mu/nu in; p', mu', nu' out), matching optax
    chain(clip_by_global_norm, adamw) numerics exactly. HBM peak during the
    update = params + grads + ONE leaf's moments, instead of the whole
    optimizer state."""
    b1, b2, eps, wd = cfg.betas[0], cfg.betas[1], cfg.eps, cfg.weight_decay
    sh_adam = _find_adam(state_out_shardings.opt_state)
    leaf_fns: dict[str, Any] = {}

    def _stream_in(x, sh):
        try:
            return jax.device_put(x, sh.with_memory_kind("device"))
        except Exception:
            return x

    def _stream_out(x, sh):
        try:
            return jax.device_put(x, sh)
        except Exception:
            return x

    def leaf_fn(p_sh, mu_sh, nu_sh):
        @functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3),
                           out_shardings=(p_sh, mu_sh, nu_sh))
        def fn(p, g, mu, nu, count, gnorm):
            g = g.astype(jnp.float32)
            if grad_clip is not None:
                g = g * jnp.minimum(1.0, grad_clip / jnp.maximum(gnorm, 1e-12))
            p_d = _stream_in(p, p_sh).astype(jnp.float32)
            mu_d = _stream_in(mu, mu_sh)
            nu_d = _stream_in(nu, nu_sh)
            mu2 = b1 * mu_d + (1.0 - b1) * g
            nu2 = b2 * nu_d + (1.0 - b2) * jnp.square(g)
            cf = count.astype(jnp.float32)
            mu_hat = mu2 / (1.0 - jnp.power(b1, cf))
            nu_hat = nu2 / (1.0 - jnp.power(b2, cf))
            upd = mu_hat / (jnp.sqrt(nu_hat) + eps) + wd * p_d
            p2 = _stream_out((p_d - schedule(count - 1) * upd).astype(p.dtype), p_sh)
            return p2, _stream_out(mu2, mu_sh), _stream_out(nu2, nu_sh)

        return fn

    gnorm_jit = jax.jit(optax.global_norm)

    # masters may live in pinned host (offload_params): the grads program
    # then consumes a bf16 DEVICE copy built here (one cast program; its
    # transient f32 leaf is bounded by the largest stack)
    def _device_kind(sh):
        try:
            return sh.with_memory_kind("device")
        except Exception:
            return sh

    params_offloaded = any(
        getattr(s, "memory_kind", "device") == "pinned_host"
        for s in jax.tree_util.tree_leaves(state_out_shardings.params)
    )
    cast_shardings = jax.tree.map(_device_kind, state_out_shardings.params)

    def _cast_leaf(x, sh):
        x = _stream_in(x, sh)
        return x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x

    cast_in_jit = jax.jit(
        lambda params: jax.tree.map(_cast_leaf, params, state_out_shardings.params),
        out_shardings=cast_shardings,
    )

    def streamed_step(state: TrainState, batch: MicroBatchArrays, scales: Scales):
        gp = cast_in_jit(state.params) if params_offloaded else state.params
        grads, loss, metrics = grads_jit(gp, batch, scales)
        del gp
        gnorm = gnorm_jit(grads)
        adam = _find_adam(state.opt_state)
        new_count = adam.count + 1
        p_flat = jax.tree_util.tree_flatten_with_path(state.params)
        g_flat = jax.tree_util.tree_leaves(grads)
        mu_flat, mu_def = jax.tree_util.tree_flatten(adam.mu)
        nu_flat = jax.tree_util.tree_leaves(adam.nu)
        psh_flat = jax.tree_util.tree_leaves(state_out_shardings.params)
        mush_flat = jax.tree_util.tree_leaves(sh_adam.mu)
        nush_flat = jax.tree_util.tree_leaves(sh_adam.nu)
        new_p, new_mu, new_nu = [], [], []
        for i, ((path, p), g) in enumerate(zip(p_flat[0], g_flat)):
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)
            fn = leaf_fns.get(key)
            if fn is None:
                fn = leaf_fns[key] = leaf_fn(psh_flat[i], mush_flat[i], nush_flat[i])
            p2, mu2, nu2 = fn(p, g, mu_flat[i], nu_flat[i], new_count, gnorm)
            new_p.append(p2)
            new_mu.append(mu2)
            new_nu.append(nu2)
        params = jax.tree_util.tree_unflatten(p_flat[1], new_p)
        new_adam = optax.ScaleByAdamState(
            count=new_count,
            mu=jax.tree_util.tree_unflatten(mu_def, new_mu),
            nu=jax.tree_util.tree_unflatten(mu_def, new_nu),
        )
        opt_state = _replace_adam(state.opt_state, new_adam)
        new_state = TrainState(params=params, opt_state=opt_state, step=state.step + 1)
        metrics = dict(metrics)
        metrics["loss"] = loss
        metrics["grad_norm"] = gnorm
        return new_state, metrics

    return streamed_step


def batch_sharding(mesh_info: MeshInfo, shape: tuple[int, ...] | None = None,
                   field: str = "") -> NamedSharding:
    """[N, B, L]: micro-batch axis unsharded (scan dim), batch over dp axes,
    sequence over context. Axes that don't divide the dim fall back to
    replicated on that dim (e.g. B=1 micro-batches on a dp>1 mesh).

    VLM fields: the patch buffer and its metadata are replicated (the vision
    tower runs whole-buffer — every dp shard needs the full merged-embedding
    table to gather from); mm_img_slot follows [N, B, L]; mm_position_ids has
    an extra leading (t,h,w) dim before (B, L)."""
    if field.startswith("mm_") and field != "mm_img_slot":
        if field == "mm_position_ids":
            spec = [None, None, DATA_AXES, "context"]
            if shape is not None:
                if shape[2] % mesh_info.dp_size != 0:
                    spec[2] = None
                if shape[3] % mesh_info.cp_size != 0:
                    spec[3] = None
            return NamedSharding(mesh_info.mesh, P(*spec))
        return mesh_info.replicated()
    spec = [None, DATA_AXES, "context"]
    if shape is not None:
        if shape[1] % mesh_info.dp_size != 0:
            spec[1] = None
        if shape[2] % mesh_info.cp_size != 0:
            spec[2] = None
    return NamedSharding(mesh_info.mesh, P(*spec))


def put_batch(batch: MicroBatchArrays, mesh_info: MeshInfo,
              mm_merge_unit: int = 1) -> MicroBatchArrays:
    """Place a batch on the mesh. Single-process: a committed device_put.
    Multi-process: each rank holds its packer-fed LOCAL rows [N, B_local, L];
    the global array is [N, B_local*world, L] sharded over the dp axes with
    this process's shard backed by the local data (no cross-host data
    movement — reference: rl/train.py per-rank MicroBatch feed).

    Multi-process VLM contract (reference: trainer/batch.py:576-617
    modality-uniform DP distribution — redesigned for SPMD): the per-rank
    patch buffers [N, P_pad, pd] are all-gathered into ONE replicated global
    buffer [N, world*P_pad, pd] (every dp shard gathers from the full merged-
    embedding table, so the buffer must agree across ranks); vision segment
    ids are renumbered per rank block to keep vision attention block-diagonal
    across the concatenation, and each rank's local ``mm_img_slot`` rows are
    offset by rank * P_pad // merge_unit — its block's base row in the global
    merged table. Token-aligned mm streams (img_slot, mm_position_ids) stay
    on the sharded local-rows path."""
    world = jax.process_count()
    if world == 1:
        return MicroBatchArrays(*[
            None if x is None
            else jax.device_put(x, batch_sharding(mesh_info, x.shape, f))
            for f, x in zip(MicroBatchArrays._fields, batch)
        ])

    def put(x, field=""):
        b_axis = 2 if field == "mm_position_ids" else 1
        gshape = (*x.shape[:b_axis], x.shape[b_axis] * world, *x.shape[b_axis + 1:])
        sh = batch_sharding(mesh_info, gshape, field)
        return jax.make_array_from_process_local_data(sh, np.asarray(x), gshape)

    updates: dict[str, Any] = {}
    if batch.mm_patches is not None:
        from jax.experimental import multihost_utils

        rank = jax.process_index()
        p_pad = batch.mm_patches.shape[1]
        # patch-aligned buffers: gather along P (leading process dim), then
        # concatenate rank blocks per micro-batch
        gathered = {
            f: np.asarray(multihost_utils.process_allgather(np.asarray(getattr(batch, f))))
            for f in ("mm_patches", "mm_vis_seg_ids", "mm_vis_pos_idx",
                      "mm_vis_pos_w", "mm_vis_rope_coords")
        }

        def concat_p(g, p_axis):
            # [R, N, ...] -> [N, ...] with rank blocks concatenated on p_axis
            return np.concatenate(list(g), axis=p_axis)

        def put_replicated(x):
            # every rank holds the identical full array (post-gather, with
            # deterministic renumbering) — the supported multi-controller way
            # to build a replicated global array
            return jax.make_array_from_process_local_data(
                mesh_info.replicated(), x, x.shape)

        seg = gathered["mm_vis_seg_ids"]  # [R, N, P]
        seg_global = []
        slot_base = np.int32(rank * (p_pad // max(mm_merge_unit, 1)))
        for n_i in range(seg.shape[1]):
            blocks, off = [], 0
            for r in range(world):
                blk = seg[r, n_i]
                blocks.append(np.where(blk > 0, blk + off, 0).astype(np.int32))
                off += int(blk.max(initial=0))
            seg_global.append(np.concatenate(blocks))
        updates["mm_vis_seg_ids"] = put_replicated(np.stack(seg_global))
        for f, axis in (("mm_patches", 1), ("mm_vis_pos_idx", 2),
                        ("mm_vis_pos_w", 2), ("mm_vis_rope_coords", 1)):
            updates[f] = put_replicated(concat_p(gathered[f], axis))
        slots = np.asarray(batch.mm_img_slot)
        updates["mm_img_slot"] = put(
            np.where(slots >= 0, slots + slot_base, slots).astype(np.int32),
            "mm_img_slot")
        updates["mm_position_ids"] = put(
            np.asarray(batch.mm_position_ids), "mm_position_ids")

    return MicroBatchArrays(**{
        f: updates[f] if f in updates
        else (None if x is None else put(x, f))
        for f, x in zip(MicroBatchArrays._fields, batch)
    })


def init_train_state(
    spec: ModelSpec,
    mesh_info: MeshInfo,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
    params: Params | None = None,
    offload_optimizer: bool = False,
    offload_params: bool = False,
    master_dtype: str = "float32",
) -> TrainState:
    """Sharded-init the train state. With ``params=None``, random-init directly
    into the sharded layout (single jit, no host materialization).

    ``offload_optimizer=True`` parks optimizer-state leaves in pinned host
    memory (the TPU analogue of the reference's CPUOffloadOptimizer,
    trainer/optim.py:17-108) — XLA streams them in/out around the update.
    ``master_dtype='bfloat16'`` halves master-weight HBM; the update applies
    with stochastic rounding (apply_update)."""
    from prime_rl_tpu.models import get_family

    mdt = jnp.bfloat16 if master_dtype == "bfloat16" else jnp.float32

    def _to_master(p):
        return jax.tree.map(
            lambda x: x.astype(mdt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    if params is None:
        family = get_family(spec)

        def init_fn():
            p = _to_master(family.init(spec, jax.random.key(seed)))
            return TrainState(params=p, opt_state=optimizer.init(p), step=jnp.zeros((), jnp.int32))

        shapes = jax.eval_shape(init_fn)
        shardings = state_shardings(shapes, mesh_info, offload_optimizer, offload_params)
        return jax.jit(init_fn, out_shardings=shardings)()
    shardings = model_base.param_shardings(params, mesh_info)
    if offload_params:
        shardings = jax.tree.map(_to_host_kind, shardings)
    params = jax.device_put(_to_master(params), shardings)
    opt_shardings = state_shardings_for_opt(optimizer, params, mesh_info)
    if offload_optimizer:
        opt_shardings = jax.tree.map(_to_host_kind, opt_shardings)
    opt_state = jax.jit(optimizer.init, out_shardings=opt_shardings)(params)
    return TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))


def _to_host_kind(sh: NamedSharding) -> NamedSharding:
    try:
        return sh.with_memory_kind("pinned_host")
    except Exception:  # platform without host memory kinds (CPU tests)
        return sh


def init_base_params(
    spec: ModelSpec,
    mesh_info: MeshInfo,
    seed: int = 0,
    params: Params | None = None,
    dtype=jnp.bfloat16,
) -> Params:
    """Sharded frozen base weights (LoRA mode): random-init in place or
    device_put a loaded pytree. The base is FROZEN, so it lives in the
    compute dtype (bf16 by default) — f32 masters exist only for trained
    params, and a 4B f32 base alone would eat 16 GB."""
    from prime_rl_tpu.models import get_family

    def cast(p):
        return jax.tree.map(
            lambda x: x.astype(dtype)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, p)

    if params is not None:
        return jax.device_put(cast(params),
                              model_base.param_shardings(params, mesh_info))
    family = get_family(spec)
    shapes = jax.eval_shape(lambda: cast(family.init(spec, jax.random.key(seed))))
    shardings = model_base.param_shardings(shapes, mesh_info)
    return jax.jit(lambda: cast(family.init(spec, jax.random.key(seed))),
                   out_shardings=shardings)()


def init_lora_train_state(
    spec: ModelSpec,
    lora_cfg,
    mesh_info: MeshInfo,
    optimizer: optax.GradientTransformation,
    seed: int = 0,
) -> TrainState:
    """Adapter-only train state, sharded by the LoRA rules."""
    from jax.sharding import NamedSharding

    from prime_rl_tpu.models.lora import init_lora, lora_param_pspec

    def init_fn():
        p = init_lora(spec, lora_cfg, jax.random.key(seed))
        return TrainState(params=p, opt_state=optimizer.init(p), step=jnp.zeros((), jnp.int32))

    shapes = jax.eval_shape(init_fn)
    replicated = mesh_info.replicated()

    def fit(spec_, shape):
        from jax.sharding import PartitionSpec as P

        dims = []
        for i, axis in enumerate(spec_):
            if axis is None:
                dims.append(None)
                continue
            size = mesh_info.sizes[axis]
            dims.append(axis if i < len(shape) and shape[i] % size == 0 else None)
        return P(*dims)

    param_pairs = model_base._iter_paths(shapes.params)
    by_shape = {}
    param_shardings = {"layers": {}}
    for path, leaf in param_pairs:
        sh = NamedSharding(mesh_info.mesh, fit(lora_param_pspec(path), leaf.shape))
        name = path.split(".")[-1]
        param_shardings["layers"][name] = sh
        by_shape.setdefault(tuple(leaf.shape), sh)
    opt_shardings = jax.tree.map(
        lambda leaf: by_shape.get(tuple(leaf.shape), replicated), shapes.opt_state
    )
    shardings = TrainState(params=param_shardings, opt_state=opt_shardings, step=replicated)
    return jax.jit(init_fn, out_shardings=shardings)()


def state_shardings(state_shapes: TrainState, mesh_info: MeshInfo,
                    offload_optimizer: bool = False, offload_params: bool = False):
    """Shardings for a full TrainState shape pytree: params by rule, optimizer
    leaves by shape-matching against the param tree, scalars replicated.

    ``offload_params`` parks the float32 MASTER weights in pinned host memory
    too (long-context: the grads program then runs on a bf16 device copy and
    the leaf-streamed update is the only consumer of the masters)."""
    param_shardings = model_base.param_shardings(state_shapes.params, mesh_info)
    by_shape: dict[tuple, NamedSharding] = {}
    for (path, leaf), (_, sh) in zip(
        model_base._iter_paths(state_shapes.params), model_base._iter_paths(param_shardings)
    ):
        by_shape.setdefault(tuple(leaf.shape), sh)
    replicated = mesh_info.replicated()

    def opt_leaf(leaf):
        sh = by_shape.get(tuple(leaf.shape), replicated)
        return _to_host_kind(sh) if offload_optimizer and leaf.ndim >= 2 else sh

    if offload_params:
        param_shardings = jax.tree.map(_to_host_kind, param_shardings)
    return TrainState(
        params=param_shardings,
        opt_state=jax.tree.map(opt_leaf, state_shapes.opt_state),
        step=replicated,
    )


def state_shardings_for_opt(optimizer, params: Params, mesh_info: MeshInfo):
    shapes = jax.eval_shape(optimizer.init, params)
    param_shardings = model_base.param_shardings(params, mesh_info)
    by_shape: dict[tuple, NamedSharding] = {}
    for (path, leaf), (_, sh) in zip(
        model_base._iter_paths({"p": params}), model_base._iter_paths({"p": param_shardings})
    ):
        by_shape.setdefault(tuple(leaf.shape), sh)
    replicated = mesh_info.replicated()
    return jax.tree.map(lambda leaf: by_shape.get(tuple(leaf.shape), replicated), shapes)
