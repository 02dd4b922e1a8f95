"""Chunked fused LM head: value + gradient parity with the direct path."""

import jax
import jax.numpy as jnp
import numpy as np

from prime_rl_tpu.ops.lm_head import chunked_logprob_entropy


def direct(hidden, w, labels, temps):
    logits = (hidden @ w) / temps[..., None]
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    lp = jnp.take_along_axis(logprobs, labels[..., None], axis=-1)[..., 0]
    p = jax.nn.softmax(logits, axis=-1)
    ent = jax.nn.logsumexp(logits, axis=-1) - jnp.sum(p * logits, axis=-1)
    return lp, ent


def test_value_parity():
    rng = np.random.default_rng(0)
    b, l, d, v = 2, 20, 16, 64
    hidden = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (b, l)), jnp.int32)
    temps = jnp.asarray(rng.uniform(0.5, 1.5, (b, l)), jnp.float32)

    lp_c, ent_c = chunked_logprob_entropy(hidden, w, labels, temps, chunk_size=7)
    lp_d, ent_d = direct(hidden, w, labels, temps)
    np.testing.assert_allclose(np.asarray(lp_c), np.asarray(lp_d), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ent_c), np.asarray(ent_d), rtol=1e-5, atol=1e-5)


def test_gradient_parity():
    rng = np.random.default_rng(1)
    b, l, d, v = 1, 12, 8, 32
    hidden = jnp.asarray(rng.normal(size=(b, l, d)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(d, v)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, v, (b, l)), jnp.int32)

    def loss_chunked(h, w):
        lp, _ = chunked_logprob_entropy(h, w, labels, None, chunk_size=5)
        return -lp.sum()

    def loss_direct(h, w):
        lp, _ = direct(h, w, labels, jnp.ones((b, l), jnp.float32))
        return -lp.sum()

    gh_c, gw_c = jax.grad(loss_chunked, argnums=(0, 1))(hidden, w)
    gh_d, gw_d = jax.grad(loss_direct, argnums=(0, 1))(hidden, w)
    np.testing.assert_allclose(np.asarray(gh_c), np.asarray(gh_d), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw_c), np.asarray(gw_d), rtol=1e-4, atol=1e-5)


def test_entropy_has_no_gradient():
    rng = np.random.default_rng(2)
    hidden = jnp.asarray(rng.normal(size=(1, 8, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
    labels = jnp.zeros((1, 8), jnp.int32)

    def ent_sum(h):
        _, ent = chunked_logprob_entropy(h, w, labels, None, chunk_size=4)
        return ent.sum()

    g = jax.grad(ent_sum)(hidden)
    np.testing.assert_allclose(np.asarray(g), 0.0)


def test_softcapped_logprobs():
    """Gemma-style softcap: logprobs match a manual capped softmax."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prime_rl_tpu.ops.lm_head import chunked_logprob_entropy

    B, L, D, V, cap = 1, 8, 16, 32, 5.0
    ks = jax.random.split(jax.random.key(0), 2)
    hidden = jax.random.normal(ks[0], (B, L, D), jnp.float32) * 3
    w = jax.random.normal(ks[1], (D, V), jnp.float32)
    labels = jnp.arange(L)[None, :] % V
    lp, _ = chunked_logprob_entropy(hidden, w, labels, None, chunk_size=4, softcap=cap)
    logits = np.asarray(hidden) @ np.asarray(w)
    logits = cap * np.tanh(logits / cap)
    want = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    got = np.asarray(lp)
    for i in range(L):
        np.testing.assert_allclose(got[0, i], want[0, i, int(labels[0, i])], rtol=1e-4)
