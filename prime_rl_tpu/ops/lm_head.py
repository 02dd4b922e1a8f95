"""Sequence-chunked fused LM head: per-token target logprob + entropy without
materializing the full [N, vocab] logits.

TPU re-design of the reference's ``FusedOutputLinear`` /
``_SequenceChunkedLogProbEntropyFn`` (reference: models/layers/lm_head.py:37-287):
instead of a custom autograd Function, we ``lax.scan`` over sequence chunks
with ``jax.checkpoint`` on the chunk body, so the backward pass recomputes
each chunk's logits instead of saving them — peak memory is O(chunk × vocab)
rather than O(seq × vocab) in both passes.

Per-token temperature scales the logits before the softmax so the trainer's
logprobs match the sampling distribution they were drawn from.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chunk_logprob_entropy(
    hidden: jax.Array,  # [C, D]
    labels: jax.Array,  # [C] int32
    inv_temp: jax.Array,  # [C] float32
    w: jax.Array,  # [D, V]
    softcap: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    logits = jnp.dot(hidden, w, preferred_element_type=jnp.float32)  # [C, V]
    if softcap > 0:
        # gemma-style: cap * tanh(logits / cap), applied BEFORE temperature
        logits = softcap * jnp.tanh(logits / softcap)
    logits = logits * inv_temp[:, None]
    lse = jax.nn.logsumexp(logits, axis=-1)  # [C]
    target = jnp.take_along_axis(logits, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]
    logprob = target - lse
    # entropy is a monitoring stat: computed in the same pass, no gradient
    probs = jax.nn.softmax(jax.lax.stop_gradient(logits), axis=-1)
    entropy = jax.lax.stop_gradient(lse) - jnp.sum(probs * jax.lax.stop_gradient(logits), axis=-1)
    return logprob, entropy


def chunked_logprob_entropy(
    hidden: jax.Array,  # [B, L, D]
    lm_head: jax.Array,  # [D, V]
    labels: jax.Array,  # [B, L] int32 (already next-token aligned)
    temperatures: jax.Array | None = None,  # [B, L] float32
    chunk_size: int = 1024,
    softcap: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Returns (logprobs [B, L], entropy [B, L])."""
    b, l, d = hidden.shape
    n = b * l
    hidden = hidden.reshape(n, d)
    labels = labels.reshape(n)
    if temperatures is None:
        inv_temp = jnp.ones((n,), jnp.float32)
    else:
        temps = temperatures.reshape(n).astype(jnp.float32)
        inv_temp = jnp.where(temps > 0, 1.0 / jnp.maximum(temps, 1e-6), 1.0)

    if chunk_size <= 0 or chunk_size >= n:
        logprob, entropy = _chunk_logprob_entropy(hidden, labels, inv_temp, lm_head, softcap)
        return logprob.reshape(b, l), entropy.reshape(b, l)

    pad = (-n) % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad))
        inv_temp = jnp.pad(inv_temp, (0, pad), constant_values=1.0)
    num_chunks = (n + pad) // chunk_size
    hidden = hidden.reshape(num_chunks, chunk_size, d)
    labels = labels.reshape(num_chunks, chunk_size)
    inv_temp = inv_temp.reshape(num_chunks, chunk_size)

    body = jax.checkpoint(
        functools.partial(_chunk_logprob_entropy, softcap=softcap)
    )  # recompute chunk logits in backward

    def scan_body(carry, xs):
        h, lab, it = xs
        return carry, body(h, lab, it, lm_head)

    _, (logprob, entropy) = jax.lax.scan(scan_body, None, (hidden, labels, inv_temp))
    logprob = logprob.reshape(-1)[:n].reshape(b, l)
    entropy = entropy.reshape(-1)[:n].reshape(b, l)
    return logprob, entropy


def lm_head_logits(hidden: jax.Array, lm_head: jax.Array) -> jax.Array:
    """Plain logits path for the sampler (typically last-position only)."""
    return jnp.dot(hidden, lm_head, preferred_element_type=jnp.float32)
