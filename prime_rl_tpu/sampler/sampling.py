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


MAX_TOP_K = 64  # candidate window for filtered sampling (vLLM-on-TPU style)


def sample_tokens(
    logits: jax.Array,  # [S, V] f32
    temperature: jax.Array,  # [S]
    top_k: jax.Array,  # [S] int32 (<=0 disables)
    top_p: jax.Array,  # [S] (>=1 disables)
    key: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Returns (tokens [S], logprobs [S]) — logprob of the sampled token under
    the temperature-scaled UNfiltered distribution (matching what a trainer
    recomputing logprobs from the weights will see).

    Decode-hot-path design: NO full-vocab sort (a [S, V] sort dominates the
    whole decode step on TPU). Unfiltered sampling is exact gumbel-max over
    the full vocabulary; top-k/top-p filter within a ``MAX_TOP_K`` candidate
    window via one ``lax.top_k`` — exact for ``top_k <= 64`` and for any
    nucleus that fits the window (top-p mass outside the top-64 is clipped).
    """
    s, v = logits.shape
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp
    gumbel = jax.random.gumbel(key, (s, v), dtype=jnp.float32)

    # exact unfiltered categorical sample (gumbel-max) and greedy
    sampled_full = jnp.argmax(scaled + gumbel, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)

    # filtered path over the top-64 candidate window
    cand_vals, cand_idx = jax.lax.top_k(scaled, MAX_TOP_K)  # desc [S, K]
    ranks = jnp.arange(MAX_TOP_K)[None, :]
    keep = jnp.ones((s, MAX_TOP_K), bool)
    keep &= jnp.where(top_k[:, None] > 0, ranks < top_k[:, None], True)
    probs = jax.nn.softmax(cand_vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep &= ((cum - probs) < top_p[:, None]).at[:, 0].set(True)
    cand_gumbel = jnp.take_along_axis(gumbel, cand_idx, axis=-1)
    cand_scores = jnp.where(keep, cand_vals + cand_gumbel, NEG_INF)
    pick = jnp.argmax(cand_scores, axis=-1)
    sampled_filtered = jnp.take_along_axis(cand_idx, pick[:, None], axis=-1)[:, 0]

    filtering = (top_k > 0) | (top_p < 1.0)
    sampled = jnp.where(filtering, sampled_filtered, sampled_full)
    tokens = jnp.where(temperature <= 0, greedy, sampled).astype(jnp.int32)
    # logprob under the unfiltered temperature-scaled distribution, computed
    # without materializing log_softmax over [S, V]
    lse = jax.nn.logsumexp(scaled, axis=-1)
    target = jnp.take_along_axis(scaled, tokens[:, None], axis=-1)[:, 0]
    return tokens, target - lse
