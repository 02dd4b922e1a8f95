"""Strided remat policies (``ac.mode = "save_attn/K"``): every K-th layer
saves its attention outputs, the rest run full remat — the intermediate
memory/recompute points for contexts where plain save_attn OOMs
(VERDICT r4 next-round #6; reference analogue: act_offloading.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import debug_spec


@pytest.fixture(scope="module")
def setup():
    spec = debug_spec(num_layers=4, vocab_size=128)
    params = qwen3.init_params(spec, jax.random.key(0))
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1, 120, (2, 32)), jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32), (2, 32))
    return spec, params, ids, seg, pos


def _loss(spec, params, ids, seg, pos, remat):
    h = qwen3.forward(params, spec, ids, seg, pos, compute_dtype=jnp.float32,
                      attn_impl="xla", remat=remat)
    return jnp.sum(h * h) * 1e-3


@pytest.mark.parametrize("remat", ["save_attn/2", "save_attn/4"])
def test_strided_remat_value_and_grad_parity(setup, remat):
    spec, params, ids, seg, pos = setup
    ref_l, ref_g = jax.value_and_grad(
        lambda p: _loss(spec, p, ids, seg, pos, "full"))(params)
    got_l, got_g = jax.value_and_grad(
        lambda p: _loss(spec, p, ids, seg, pos, remat))(params)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    ref_flat = jax.tree_util.tree_leaves_with_path(ref_g)
    got_flat = dict((jax.tree_util.keystr(k), v)
                    for k, v in jax.tree_util.tree_leaves_with_path(got_g))
    for k, a in ref_flat:
        np.testing.assert_allclose(
            np.asarray(got_flat[jax.tree_util.keystr(k)]), np.asarray(a),
            rtol=2e-4, atol=1e-6, err_msg=jax.tree_util.keystr(k))


def test_stride_must_divide_layers(setup):
    spec, params, ids, seg, pos = setup
    with pytest.raises(ValueError, match="divide"):
        _loss(spec, params, ids, seg, pos, "save_attn/3")  # 3 does not divide 4


def test_stride_one_equals_plain(setup):
    spec, params, ids, seg, pos = setup
    a = _loss(spec, params, ids, seg, pos, "save_attn")
    b = _loss(spec, params, ids, seg, pos, "save_attn/1")
    np.testing.assert_allclose(float(a), float(b), rtol=1e-6)
