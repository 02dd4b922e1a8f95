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

    Decode-hot-path design: NO full-vocab sort in the common case (a [S, V]
    sort dominates the whole decode step on TPU). Unfiltered sampling is
    exact gumbel-max over the full vocabulary; top-k/top-p filter within a
    ``MAX_TOP_K`` candidate window via one ``lax.top_k``. The window carries
    FULL-distribution probabilities, so the nucleus cutoff is exact whenever
    it fits; when a row's nucleus extends past the window (flat/high-temp
    distributions) or ``top_k > MAX_TOP_K``, a ``lax.cond`` falls back to the
    exact full-sort path for that step — correct always, fast almost always.
    """
    s, v = logits.shape
    temp = jnp.maximum(temperature, 1e-6)[:, None]
    scaled = logits / temp
    gumbel = jax.random.gumbel(key, (s, v), dtype=jnp.float32)
    lse = jax.nn.logsumexp(scaled, axis=-1)

    # exact unfiltered categorical sample (gumbel-max) and greedy
    sampled_full = jnp.argmax(scaled + gumbel, axis=-1)
    greedy = jnp.argmax(logits, axis=-1)

    # filtered path over the top-64 candidate window
    cand_vals, cand_idx = jax.lax.top_k(scaled, MAX_TOP_K)  # desc [S, K]
    ranks = jnp.arange(MAX_TOP_K)[None, :]
    keep = jnp.ones((s, MAX_TOP_K), bool)
    keep &= jnp.where(top_k[:, None] > 0, ranks < top_k[:, None], True)
    # full-distribution probabilities (not window-renormalized): the nucleus
    # rule below then matches exact top-p whenever the nucleus fits the window
    probs = jnp.exp(cand_vals - lse[:, None])
    cum = jnp.cumsum(probs, axis=-1)
    keep &= ((cum - probs) < top_p[:, None]).at[:, 0].set(True)
    cand_gumbel = jnp.take_along_axis(gumbel, cand_idx, axis=-1)
    cand_scores = jnp.where(keep, cand_vals + cand_gumbel, NEG_INF)
    pick = jnp.argmax(cand_scores, axis=-1)
    sampled_windowed = jnp.take_along_axis(cand_idx, pick[:, None], axis=-1)[:, 0]

    # rows whose nucleus escapes the window need the exact (sorted) path
    window_short = (top_p < 1.0) & (cum[:, -1] < top_p)
    bigk = top_k > MAX_TOP_K
    needs_exact = window_short | bigk

    def exact(_):
        filtered = apply_top_p(apply_top_k(scaled, top_k), top_p)
        return jnp.argmax(filtered + gumbel, axis=-1)

    sampled_exact = jax.lax.cond(
        jnp.any(needs_exact), exact, lambda _: sampled_windowed, operand=None
    )
    sampled_filtered = jnp.where(needs_exact, sampled_exact, sampled_windowed)

    filtering = (top_k > 0) | (top_p < 1.0)
    sampled = jnp.where(filtering, sampled_filtered, sampled_full)
    tokens = jnp.where(temperature <= 0, greedy, sampled).astype(jnp.int32)
    # logprob under the unfiltered temperature-scaled distribution, computed
    # without materializing log_softmax over [S, V]
    target = jnp.take_along_axis(scaled, tokens[:, None], axis=-1)[:, 0]
    return tokens, target - lse
