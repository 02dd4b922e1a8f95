"""Optimizers + LR schedules for the learner, built on optax.

Mirrors the reference's optimizer surface (reference: trainer/optim.py,
sign_sgd.py, scheduler.py; config union at configs/trainer.py:354-405):
AdamW / SGD / Muon / SignSGD, constant / linear / cosine schedules with
warmup. TPU-native design: one optax GradientTransformation applied inside
the jitted train step; optimizer state inherits the params' NamedShardings
(ZeRO-like sharded optimizer state for free — no CPU-offload wrapper needed).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from prime_rl_tpu.configs.shared import (
    AdafactorMomConfig,
    AdamW8bitConfig,
    AdamWConfig,
    ConstantSchedulerConfig,
    CosineSchedulerConfig,
    LinearSchedulerConfig,
    MuonConfig,
    SGDConfig,
    SignSGDConfig,
)


def make_schedule(cfg, base_lr: float) -> optax.Schedule:
    """step -> lr. Warmup is linear from 0 (reference: trainer/scheduler.py)."""
    if isinstance(cfg, ConstantSchedulerConfig):
        main = optax.constant_schedule(base_lr)
    elif isinstance(cfg, LinearSchedulerConfig):
        main = optax.linear_schedule(base_lr, base_lr * cfg.min_lr_ratio, cfg.decay_steps)
    elif isinstance(cfg, CosineSchedulerConfig):
        main = optax.cosine_decay_schedule(base_lr, cfg.decay_steps, alpha=cfg.min_lr_ratio)
    else:
        raise ValueError(f"unknown scheduler {cfg!r}")
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base_lr, cfg.warmup_steps)
        return optax.join_schedules([warmup, main], [cfg.warmup_steps])
    return main


def _quant_q8(x: jax.Array, block: int) -> tuple[jax.Array, jax.Array, int]:
    """Blockwise-absmax int8: flatten, pad to ``block``, return (q [nb, block]
    int8, scale [nb, 1] f32, orig_size)."""
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    nb = -(-n // block)
    flat = jnp.pad(flat, (0, nb * block - n))
    blocks = flat.reshape(nb, block)
    scale = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    q = jnp.round(blocks / jnp.maximum(scale, 1e-30)).astype(jnp.int8)
    return q, scale, n


def _dequant_q8(q: jax.Array, scale: jax.Array, n: int, shape) -> jax.Array:
    return (q.astype(jnp.float32) * scale).reshape(-1)[:n].reshape(shape)


# Nonlinear (log-spaced) 256-entry codebook for the NON-NEGATIVE second
# moment: code 0 = exact zero, codes 1..255 span [1e-6, 1] geometrically
# (~5.6% relative step). With the LINEAR absmax code a coordinate whose
# sqrt(nu) is persistently ~127x below its block's max re-quantized to zero
# every step and was frozen forever (ADVICE r4 #4); the log code keeps
# relative resolution down to 1e-6 of the block max — the freeze guard now
# only fires for coordinates ≥1e6x below the dominant one (nu ratio 1e-12),
# i.e. effectively never. Same idea as bitsandbytes' dynamic quant map.
# NUMPY constant on purpose: a module-level jnp array would initialize the
# JAX backend at import time (which blocks when the device runtime isn't up
# yet); inside jit it traces as a constant either way.
_NU_CODE = np.concatenate(
    [[0.0], np.geomspace(1e-6, 1.0, 255)]).astype(np.float32)


def _quant_nu(x: jax.Array, block: int) -> tuple[jax.Array, jax.Array, int]:
    """Blockwise dynamic-code uint8 for non-negative x: returns
    (q [nb, block] uint8 codebook indices, absmax scale [nb, 1] f32, size)."""
    flat = x.reshape(-1).astype(jnp.float32)
    n = flat.shape[0]
    nb = -(-n // block)
    flat = jnp.pad(flat, (0, nb * block - n))
    blocks = flat.reshape(nb, block)
    scale = jnp.max(blocks, axis=1, keepdims=True)  # non-negative input
    y = blocks / jnp.maximum(scale, 1e-30)
    idx = jnp.searchsorted(_NU_CODE, y)
    lo = jnp.clip(idx - 1, 0, 255)
    hi = jnp.clip(idx, 0, 255)
    code = jnp.asarray(_NU_CODE)
    q = jnp.where(code[hi] - y < y - code[lo], hi, lo)
    return q.astype(jnp.uint8), scale, n


def _dequant_nu(q: jax.Array, scale: jax.Array, n: int, shape) -> jax.Array:
    return (jnp.asarray(_NU_CODE)[q.astype(jnp.int32)] * scale).reshape(-1)[:n].reshape(shape)


def scale_by_adam_8bit(
    b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8, block: int = 2048,
) -> optax.GradientTransformation:
    """Adam whose moments live as blockwise int8 (+1 f32 scale per ``block``
    params): ~1.004 bytes/param/moment instead of 4 — an 8x optimizer-state
    HBM shrink (reference analogue: the memory-lever family of
    trainer/optim.py:17-108; technique: bitsandbytes 8-bit Adam, blockwise
    dynamic quantization). ``mu`` (signed, EMA-self-correcting) uses linear
    blockwise int8; ``nu`` is stored as sqrt(nu) under the nonlinear log
    codebook (``_NU_CODE``) so small-magnitude coordinates sharing a block
    with a dominant one keep relative denominator resolution instead of
    freezing at zero (ADVICE r4 #4)."""

    def init(params):
        def leaf(p):
            z = jnp.zeros(p.shape, jnp.float32)
            mq, ms, n = _quant_q8(z, block)
            nq, ns, _ = _quant_nu(z, block)
            return {"mu_q": mq, "mu_s": ms, "nu_q": nq, "nu_s": ns}

        return {"count": jnp.zeros((), jnp.int32),
                "m": jax.tree.map(leaf, params)}

    def update(updates, state, params=None):
        count = state["count"] + 1
        cf = count.astype(jnp.float32)

        def leaf(g, m):
            g = g.astype(jnp.float32)
            mu = _dequant_q8(m["mu_q"], m["mu_s"], g.size, g.shape)
            nu_sqrt_q = _dequant_nu(m["nu_q"], m["nu_s"], g.size, g.shape)
            nu = jnp.square(nu_sqrt_q)
            mu = b1 * mu + (1.0 - b1) * g
            nu = b2 * nu + (1.0 - b2) * jnp.square(g)
            mu_hat = mu / (1.0 - jnp.power(b1, cf))
            nu_hat = nu / (1.0 - jnp.power(b2, cf))
            # The log code resolves sqrt(nu) down to 1e-6 of the block max
            # with ~5.6% relative step, so the denominator is trustworthy for
            # every representable coordinate; floor it at the smallest
            # nonzero representable value (scale * code[1]) so sub-resolution
            # coordinates can't be exploded by mu noise over eps, and freeze
            # the (effectively unreachable) exact-zero codes.
            nu_floor = jnp.broadcast_to(
                m["nu_s"] * _NU_CODE[1], (m["nu_q"].shape[0], block)
            ).reshape(-1)[: g.size].reshape(g.shape)
            denom = jnp.sqrt(nu_hat) + jnp.maximum(eps, nu_floor)
            upd = jnp.where(
                (nu_sqrt_q > 0) | (count <= 1), mu_hat / denom, 0.0)
            mq, ms, _ = _quant_q8(mu, block)
            nq, ns, _ = _quant_nu(jnp.sqrt(nu), block)
            return upd, {"mu_q": mq, "mu_s": ms, "nu_q": nq, "nu_s": ns}

        flat_u = jax.tree.leaves(updates)
        flat_m = jax.tree.leaves(state["m"], is_leaf=lambda x: isinstance(x, dict) and "mu_q" in x)
        out = [leaf(g, m) for g, m in zip(flat_u, flat_m)]
        treedef = jax.tree.structure(updates)
        new_u = jax.tree.unflatten(treedef, [o[0] for o in out])
        new_m = jax.tree.unflatten(treedef, [o[1] for o in out])
        return new_u, {"count": count, "m": new_m}

    return optax.GradientTransformation(init, update)


def stochastic_round_to(dtype, x: jax.Array, key: jax.Array) -> jax.Array:
    """f32 -> bf16 stochastic rounding (bit trick: add 16 random low bits,
    truncate). Unbiased: E[sr(x)] = x — the accumulated-update argument for
    bf16 master weights (the f32 information lives in the randomness across
    steps). Non-finite values pass through unchanged."""
    if dtype != jnp.bfloat16:
        return x.astype(dtype)
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    rnd = jax.random.bits(key, x.shape, jnp.uint32) & jnp.uint32(0xFFFF)
    rounded = (bits + rnd) & jnp.uint32(0xFFFF0000)
    out = jax.lax.bitcast_convert_type(rounded, jnp.float32).astype(jnp.bfloat16)
    return jnp.where(jnp.isfinite(x), out, x.astype(jnp.bfloat16))


def _sign_sgd(lr: optax.Schedule, weight_decay: float) -> optax.GradientTransformation:
    """signSGD with decoupled weight decay (reference: trainer/sign_sgd.py)."""
    tx = [optax.stateless(lambda g, p: jax.tree.map(jnp.sign, g))]
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay))
    tx.append(optax.scale_by_learning_rate(lr))
    return optax.chain(*tx)


def _is_matrix(path: tuple, leaf) -> bool:
    """Muon applies to 2D+ hidden-layer weights; embeddings/head/norms fall
    back to AdamW (reference: trainer/optim.py muon split)."""
    names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
    if any(n in ("embed", "lm_head") for n in names):
        return False
    return leaf.ndim >= 2


def make_optimizer(
    cfg,
    scheduler_cfg,
    grad_clip: float | None,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """Build the step transformation: global-norm clip -> optimizer(lr(t)).

    Gradient accumulation and the cross-rank mean are handled by the trainer
    (grads are already globally normalized by token counts), so the chain here
    is purely the update rule.
    """
    schedule = make_schedule(scheduler_cfg, cfg.lr if not isinstance(cfg, MuonConfig) else cfg.lr)

    if isinstance(cfg, AdamWConfig):
        opt = optax.adamw(
            schedule, b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
            weight_decay=cfg.weight_decay,
        )
    elif isinstance(cfg, AdamW8bitConfig):
        opt = optax.chain(
            scale_by_adam_8bit(cfg.betas[0], cfg.betas[1], cfg.eps, cfg.block),
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
            optax.scale_by_learning_rate(schedule),
        )
    elif isinstance(cfg, AdafactorMomConfig):
        opt = optax.adafactor(
            learning_rate=schedule,
            multiply_by_parameter_scale=False,
            decay_rate=cfg.decay_rate,
            clipping_threshold=cfg.clipping_threshold,
            momentum=cfg.momentum,
            dtype_momentum=jnp.bfloat16,
            weight_decay_rate=cfg.weight_decay or None,
            factored=True,
        )
    elif isinstance(cfg, SGDConfig):
        opt = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay) if cfg.weight_decay else optax.identity(),
            optax.sgd(schedule, momentum=cfg.momentum or None, nesterov=cfg.nesterov),
        )
    elif isinstance(cfg, SignSGDConfig):
        opt = _sign_sgd(schedule, cfg.weight_decay)
    elif isinstance(cfg, MuonConfig):
        adamw_schedule = make_schedule(scheduler_cfg, cfg.adamw_lr)
        muon = optax.contrib.muon(
            schedule, beta=cfg.momentum, weight_decay=cfg.weight_decay,
        )
        adamw = optax.adamw(adamw_schedule, weight_decay=cfg.weight_decay)
        opt = optax.multi_transform(
            {"muon": muon, "adamw": adamw},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, leaf: "muon" if _is_matrix(path, leaf) else "adamw", params
            ),
        )
    else:
        raise ValueError(f"unknown optimizer {cfg!r}")

    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(opt)
    return optax.chain(*chain), schedule
