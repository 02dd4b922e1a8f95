"""Loss math parity checks (reference: tests/unit/train/rl/test_loss.py role).

Hand-computed reference values use plain numpy re-implementations of the
documented formulas, NOT the packed-array code under test.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.configs.trainer import (
    DefaultLossConfig,
    IPOLossConfig,
    RatioLossConfig,
)
from prime_rl_tpu.trainer.rl import loss as L


def _np_default_loss(t, i, adv, mask, cfg):
    log_ratio = t - i
    ratio = np.exp(log_ratio)
    probs_diff = np.exp(t) - np.exp(i)
    is_masked = np.where(adv > 0, probs_diff > cfg.dppo_mask_high, probs_diff < -cfg.dppo_mask_low)
    keep = mask & ~is_masked
    pg = keep * (cfg.adv_tau * adv) * ratio
    kl = mask * log_ratio**2
    return float((-pg + cfg.kl_tau * kl).sum())


def test_default_loss_matches_reference_math():
    rng = np.random.default_rng(0)
    t = rng.normal(-1.5, 0.8, (2, 32)).astype(np.float32)
    i = rng.normal(-1.5, 0.8, (2, 32)).astype(np.float32)
    adv = rng.normal(0, 1, (2, 32)).astype(np.float32)
    mask = rng.random((2, 32)) > 0.3
    cfg = DefaultLossConfig()
    loss, metrics = L.default_loss(jnp.array(t), jnp.array(i), jnp.array(adv), jnp.array(mask), None, cfg)
    assert np.isclose(float(loss), _np_default_loss(t, i, adv, mask, cfg), rtol=1e-5)
    # mismatch KL is nonnegative
    assert float(metrics["mismatch_kl"].total) >= 0


def test_default_loss_trust_region_masks_positive_advantage_upmoves():
    # token prob rose a lot (probs_diff > 0.25) with positive advantage -> dropped from PG
    t = jnp.log(jnp.array([[0.9]]))
    i = jnp.log(jnp.array([[0.1]]))
    adv = jnp.array([[1.0]])
    mask = jnp.array([[True]])
    cfg = DefaultLossConfig(kl_tau=0.0)
    loss, metrics = L.default_loss(t, i, adv, mask, None, cfg)
    assert float(loss) == 0.0  # PG term fully masked
    assert float(metrics["is_masked"].mean) == 1.0
    # negative advantage on the same up-move is NOT masked
    loss2, m2 = L.default_loss(t, i, -adv, mask, None, cfg)
    assert float(loss2) != 0.0
    assert float(m2["is_masked"].mean) == 0.0


def test_ipo_loss_symmetric_mask():
    t = jnp.log(jnp.array([[0.9, 0.1]]))
    i = jnp.log(jnp.array([[0.1, 0.9]]))
    adv = jnp.array([[1.0, 1.0]])
    mask = jnp.array([[True, True]])
    loss, metrics = L.ipo_loss(t, i, adv, mask, None, IPOLossConfig(kl_tau=0.0))
    assert float(metrics["is_masked"].mean) == 1.0  # both moves exceed 0.25 abs
    assert float(loss) == 0.0


def test_ratio_loss_zero_at_unity_ratio():
    t = jnp.full((1, 8), -1.0)
    mask = jnp.ones((1, 8), bool)
    adv = jnp.ones((1, 8))
    loss, metrics = L.ratio_loss(t, t, adv, mask, None, RatioLossConfig())
    # ratio == 1 everywhere: loss = -sum(adv) (PG only, no clip active)
    assert np.isclose(float(loss), -8.0)
    assert float(metrics["is_clipped"].mean) == 0.0


def test_ref_kl_loss_requires_and_uses_ref():
    rng = np.random.default_rng(1)
    t = jnp.array(rng.normal(-1, 0.1, (1, 16)).astype(np.float32))
    ref = jnp.array(rng.normal(-1, 0.1, (1, 16)).astype(np.float32))
    mask = jnp.ones((1, 16), bool)
    loss, metrics = L.ref_kl_loss(t, t, ref, mask, None)
    # ratio = 1, keep = all: loss = -sum(ref_kl) + 0 regularizer
    assert np.isclose(float(loss), -float(jnp.sum(ref - t)), rtol=1e-5)


def test_ce_loss_masked_nll():
    t = jnp.array([[-1.0, -2.0, -3.0]])
    mask = jnp.array([[True, False, True]])
    loss, metrics = L.ce_loss(t, mask, None)
    assert np.isclose(float(loss), 4.0)
    assert np.isclose(float(metrics["nll"].mean), 2.0)


def test_compute_loss_component_routing_and_scales():
    n = 16
    rng = np.random.default_rng(2)
    t = jnp.array(rng.normal(-1, 0.1, (1, n)).astype(np.float32))
    i = t  # ratio 1
    adv = jnp.ones((1, n))
    mask = jnp.ones((1, n), bool)
    ce_w = jnp.zeros((1, n)).at[0, :4].set(2.0)
    total, metrics = L.compute_loss(
        trainer_logprobs=t, inference_logprobs=i, advantages=adv, loss_mask=mask,
        ref_logprobs=None, rl_weights=None, ce_weights=ce_w, ref_kl_weights=None,
        loss_cfg=DefaultLossConfig(kl_tau=0.0),
        rl_scale=jnp.float32(n), ce_scale=jnp.float32(4), ref_kl_scale=jnp.float32(1),
    )
    # rl: -sum(adv*1)/n = -1 ; ce: sum(2 * -t[:4]) / 4
    expect = -1.0 + float(jnp.sum(-t[0, :4] * 2.0)) / 4
    assert np.isclose(float(total), expect, rtol=1e-5)


def test_component_token_counts():
    mask = jnp.array([[True, True, False, True]])
    rl_w = jnp.array([[1.0, 0.0, 1.0, 1.0]])
    ce_w = jnp.array([[0.0, 1.0, 1.0, 0.0]])
    counts = L.component_token_counts(mask, rl_w, ce_w, None)
    assert int(counts["rl"]) == 2  # mask & rl_w!=0
    assert int(counts["ce"]) == 2
    assert int(counts["ref_kl"]) == 0


def test_masked_stat_accumulates_exactly():
    a = L.masked_stat(jnp.array([1.0, 2.0, 3.0]), jnp.array([True, True, False]))
    b = L.masked_stat(jnp.array([5.0]), jnp.array([True]))
    combined = L.MaskedStat(a.total + b.total, a.count + b.count)
    assert np.isclose(float(combined.mean), (1 + 2 + 5) / 3)
