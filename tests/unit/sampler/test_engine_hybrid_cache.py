"""Hybrid-model (GDN / Mamba) chunked prefill + prefix caching.

vLLM disables prefix caching AND chunked prefill for recurrent-state models;
this engine supports both: attention layers page normally, recurrent layers
thread (conv window, state) between chunks, and a host-side state tier
checkpoints the boundary state so a shared prompt prefix is never
recomputed (reference behavior anchor: vLLM mamba cache restrictions,
SURVEY.md §2.4; reference leans on vLLM for all serving).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import get_family
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.sampler.cache import CacheConfig
from prime_rl_tpu.sampler.engine import Engine, SamplingParams


def _greedy(engine, prompt, n=6):
    sp = SamplingParams(max_tokens=n, temperature=0.0, ignore_eos=True)
    return engine.generate([prompt], [sp])[0]


def _build(name, **cache_kw):
    spec = get_spec(name)
    fam = get_family(spec)
    params = fam.init(spec, jax.random.PRNGKey(0))
    cfg = CacheConfig(num_pages=64, page_size=16, max_slots=2, max_seq_len=256,
                      **cache_kw)
    return Engine(params, spec, cfg, compute_dtype=jnp.float32)


@pytest.mark.parametrize("name", ["debug_qwen3_next", "debug_nemotron"])
def test_hybrid_chunked_prefill_matches_fused(name):
    """Cache-on serving routes hybrid prefills through the chunked path
    (state threading from zeros) — greedy output must match the fused
    single-shot prefill exactly."""
    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(1, 500, 45)]  # 2 full pages + tail
    fused = _build(name, enable_prefix_cache=False)
    chunked = _build(name, enable_prefix_cache=True, state_cache_mb=64,
                     prefill_chunk=16)  # multiple chunks per prefill
    r_f = _greedy(fused, prompt)
    r_c = _greedy(chunked, prompt)
    assert r_c.token_ids == r_f.token_ids
    assert chunked.stats["prefill_tokens_cached"] == 0  # first visit computes


@pytest.mark.parametrize("name", ["debug_qwen3_next", "debug_nemotron"])
def test_hybrid_prefix_cache_hit_exact_and_counted(name):
    """A second identical prompt must restore the boundary state + shared
    KV pages, skip the prefix, and decode identically."""
    rng = np.random.default_rng(1)
    prompt = [int(x) for x in rng.integers(1, 500, 40)]
    eng = _build(name, enable_prefix_cache=True, state_cache_mb=64)
    r1 = _greedy(eng, prompt)
    assert eng.stats.get("state_snapshots", 0) >= 1
    r2 = _greedy(eng, prompt)
    assert r2.token_ids == r1.token_ids
    assert eng.stats.get("state_restores", 0) >= 1
    # 2 full pages (32 tokens) of the 40-token prompt were reused
    assert eng.stats["prefill_tokens_cached"] == 32


def test_hybrid_long_prompt_chunked_prefill():
    """Prompts beyond the largest bucket now serve on hybrid models via
    chunked prefill (previously hard-rejected)."""
    name = "debug_qwen3_next"
    rng = np.random.default_rng(2)
    prompt = [int(x) for x in rng.integers(1, 500, 150)]
    small = _build(name, enable_prefix_cache=True, state_cache_mb=64)
    small.buckets = [64, 128]  # force: prompt 150 > largest bucket
    big = _build(name, enable_prefix_cache=False)
    r_small = _greedy(small, prompt)
    r_big = _greedy(big, prompt)
    assert r_small.token_ids == r_big.token_ids


def test_hybrid_partial_prefix_extension():
    """A prompt extending a cached prefix reuses the boundary checkpoint and
    computes only the new tail."""
    name = "debug_qwen3_next"
    rng = np.random.default_rng(3)
    base = [int(x) for x in rng.integers(1, 500, 33)]  # 2 full pages + 1
    eng = _build(name, enable_prefix_cache=True, state_cache_mb=64)
    _greedy(eng, base)
    ext = base[:32] + [int(x) for x in rng.integers(1, 500, 20)]
    ref = _build(name, enable_prefix_cache=False)
    r_ext = _greedy(eng, ext)
    r_ref = _greedy(ref, ext)
    assert r_ext.token_ids == r_ref.token_ids
    assert eng.stats["prefill_tokens_cached"] >= 32


def test_hybrid_cache_salt_isolation():
    """Different cache_salt must not share state checkpoints or pages."""
    name = "debug_qwen3_next"
    rng = np.random.default_rng(4)
    prompt = [int(x) for x in rng.integers(1, 500, 40)]
    eng = _build(name, enable_prefix_cache=True, state_cache_mb=64)
    sp_a = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                          cache_salt="a")
    sp_b = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True,
                          cache_salt="b")
    eng.generate([prompt], [sp_a])
    cached_before = eng.stats["prefill_tokens_cached"]
    eng.generate([prompt], [sp_b])
    assert eng.stats["prefill_tokens_cached"] == cached_before  # no cross-salt reuse


def test_hybrid_weight_update_flushes_state_tier():
    name = "debug_qwen3_next"
    spec = get_spec(name)
    fam = get_family(spec)
    params = fam.init(spec, jax.random.PRNGKey(0))
    cfg = CacheConfig(num_pages=64, page_size=16, max_slots=2, max_seq_len=256,
                      enable_prefix_cache=True, state_cache_mb=64)
    eng = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(1, 500, 40)]
    _greedy(eng, prompt)
    assert eng._state_tier
    new_params = jax.tree.map(lambda x: x * 1.5, fam.init(spec, jax.random.PRNGKey(7)))
    eng.update_params(new_params, version=1)
    assert not eng._state_tier  # stale state under old weights dropped
    cached_before = eng.stats["prefill_tokens_cached"]
    r = _greedy(eng, prompt)  # must recompute, not reuse stale state
    assert eng.stats["prefill_tokens_cached"] == cached_before
    assert len(r.token_ids) == 6
