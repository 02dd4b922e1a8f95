"""Token sampling: per-slot temperature / top-k / top-p with sampled-token
logprobs (the stream the RL importance ratios are computed against).

One jitted function over all slots; the filtering is exact (sort-based
top-p) and temperature==0 means greedy. Logprobs are reported under the
SAME transformed distribution the token was drawn from — the trainer
re-applies the temperature when recomputing its own logprobs
(reference contract: serving_tokens.py + trainer lm_head temperature scaling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def apply_top_k(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """Mask logits outside each row's top-k. top_k <= 0 disables."""
    v = logits.shape[-1]
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]  # desc
    k = jnp.where(top_k <= 0, v, jnp.minimum(top_k, v))
    threshold = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    return jnp.where(logits >= threshold, logits, NEG_INF)


def apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filtering. top_p >= 1 disables. Keeps the smallest prefix of
    the sorted distribution with cumulative prob >= top_p (the first token is
    always kept)."""
    sort_idx = jnp.argsort(-logits, axis=-1)
    sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep_sorted = (cum - probs) < top_p[:, None]  # token enters before p is reached
    keep_sorted = keep_sorted.at[:, 0].set(True)
    keep = jnp.zeros_like(keep_sorted).at[
        jnp.arange(logits.shape[0])[:, None], sort_idx
    ].set(keep_sorted)
    return jnp.where(keep, logits, NEG_INF)


def sample_tokens(
    logits: jax.Array,  # [S, V] f32
    temperature: jax.Array,  # [S]
    top_k: jax.Array,  # [S] int32 (<=0 disables)
    top_p: jax.Array,  # [S] (>=1 disables)
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Returns (tokens [S], logprobs [S]) — logprob of the sampled token under
    the temperature-scaled UNfiltered distribution (matching what a trainer
    recomputing logprobs from the weights will see)."""
    s, v = logits.shape
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp
    filtered = apply_top_k(scaled, top_k)
    filtered = apply_top_p(filtered, top_p)
    gumbel = jax.random.gumbel(key, (s, v), dtype=jnp.float32)
    sampled = jnp.argmax(filtered + gumbel, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)
    tokens = jnp.where(temperature <= 0, greedy, sampled).astype(jnp.int32)
    logprobs_all = jax.nn.log_softmax(scaled, axis=-1)
    logprobs = jnp.take_along_axis(logprobs_all, tokens[:, None], axis=-1)[:, 0]
    return tokens, logprobs
