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
import optax

from prime_rl_tpu.configs.shared import (
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
