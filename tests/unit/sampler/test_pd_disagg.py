"""P/D disaggregation: a prefill-role engine's extracted KV, injected into a
separate decode engine, must reproduce the monolithic engine's greedy output
token-for-token (reference: docs/inference.md optimized P/D deployment —
prefill/decode split with KV transfer)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.sampler.cache import CacheConfig
from prime_rl_tpu.sampler.engine import Engine, SamplingParams


@pytest.fixture(scope="module")
def setup():
    spec = debug_spec(num_layers=2, vocab_size=128)
    params = qwen3.init_params(spec, jax.random.key(0))
    params = jax.tree.map(lambda x: x * 3.0, params)  # decisive greedy argmax
    cfg = CacheConfig(num_pages=64, page_size=16, max_slots=4, max_seq_len=256)
    mono = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    prefill = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    decode = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    return spec, mono, prefill, decode


def test_pd_matches_monolithic_greedy(setup):
    spec, mono, prefill, decode = setup
    rng = np.random.default_rng(0)
    prompt = [int(x) for x in rng.integers(3, 120, size=21)]
    n_gen = 8
    sp = SamplingParams(max_tokens=n_gen, temperature=0.0, ignore_eos=True)

    want = mono.generate([prompt], [sp])[0]
    assert len(want.token_ids) == n_gen

    # prefill role: KV + first token out
    psp = SamplingParams(max_tokens=n_gen, temperature=0.0, ignore_eos=True,
                         extract_kv=True)
    pre = prefill.generate([prompt], [psp])[0]
    assert pre.kv is not None
    nl = spec.num_layers
    n_pages = -(-len(prompt) // 16)
    assert pre.kv["k"].shape[:3] == (nl, spec.num_kv_heads, n_pages)
    assert pre.token_ids[0] == want.token_ids[0]
    # prefill engine released its slot (no active work left)
    assert not prefill.has_work()

    # decode role: inject and continue
    fut = decode.submit(prompt, sp, inject={
        "k": pre.kv["k"], "v": pre.kv["v"],
        "first_token": pre.token_ids[0],
        "first_logprob": pre.logprobs[0] if pre.logprobs else 0.0,
        "pos_delta": pre.kv["pos_delta"],
    })
    decode.run_until_idle()
    got = fut.result()
    assert got.token_ids == want.token_ids
    np.testing.assert_allclose(got.logprobs, want.logprobs, rtol=1e-3, atol=1e-3)


def test_pd_single_token_inject(setup):
    """max_tokens=1: the injected first token IS the whole completion."""
    spec, mono, prefill, decode = setup
    prompt = list(range(5, 22))
    sp1 = SamplingParams(max_tokens=1, temperature=0.0, ignore_eos=True)
    want = mono.generate([prompt], [sp1])[0]
    pre = prefill.generate([prompt], [SamplingParams(
        max_tokens=1, temperature=0.0, ignore_eos=True, extract_kv=True)])[0]
    fut = decode.submit(prompt, sp1, inject={
        "k": pre.kv["k"], "v": pre.kv["v"], "first_token": pre.token_ids[0],
        "pos_delta": 0,
    })
    decode.run_until_idle()
    assert fut.result().token_ids == want.token_ids


def test_pd_page_size_mismatch_rejected(setup):
    spec, mono, prefill, decode = setup
    prompt = list(range(3, 20))
    pre = prefill.generate([prompt], [SamplingParams(
        max_tokens=1, temperature=0.0, extract_kv=True)])[0]
    bad_k = pre.kv["k"][:, :, :1]  # wrong page count
    fut = decode.submit(prompt, SamplingParams(max_tokens=2), inject={
        "k": bad_k, "v": pre.kv["v"][:, :, :1], "first_token": 7, "pos_delta": 0,
    })
    decode.run_until_idle()
    with pytest.raises(Exception, match="pages"):
        fut.result()


def _pd_roundtrip(spec, params, prompt, n_gen=6):
    """Monolithic greedy vs prefill-extract -> decode-inject."""
    cfg = CacheConfig(num_pages=64, page_size=16, max_slots=2, max_seq_len=256)
    mono = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    prefill = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    decode = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    sp = SamplingParams(max_tokens=n_gen, temperature=0.0, ignore_eos=True)
    want = mono.generate([prompt], [sp])[0]
    assert len(want.token_ids) == n_gen

    psp = SamplingParams(max_tokens=n_gen, temperature=0.0, ignore_eos=True,
                         extract_kv=True)
    pre = prefill.generate([prompt], [psp])[0]
    assert pre.kv is not None
    assert pre.token_ids[0] == want.token_ids[0]
    inject = {
        "k": pre.kv["k"], "v": pre.kv.get("v"),
        "first_token": pre.token_ids[0],
        "first_logprob": pre.logprobs[0] if pre.logprobs else 0.0,
        "pos_delta": pre.kv["pos_delta"],
    }
    if "r" in pre.kv:
        inject["r"] = pre.kv["r"]
    fut = decode.submit(prompt, sp, inject=inject)
    decode.run_until_idle()
    got = fut.result()
    assert got.token_ids == want.token_ids
    return pre


@pytest.mark.parametrize("name", ["debug_qwen3_next", "debug_nemotron"])
def test_pd_hybrid_recurrent_state_on_the_wire(name):
    """Hybrid (GDN / Mamba) P/D: attention-layer KV pages ship together with
    the per-layer recurrent rows (conv window + state); the decode engine
    seeds its slot state from them and must match monolithic greedy output
    (vLLM disables P/D for recurrent-state models entirely)."""
    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import get_spec

    spec = get_spec(name)
    fam = get_family(spec)
    params = jax.tree.map(lambda x: x * 2.0, fam.init(spec, jax.random.PRNGKey(1)))
    rng = np.random.default_rng(5)
    prompt = [int(x) for x in rng.integers(3, 120, size=23)]
    pre = _pd_roundtrip(spec, params, prompt)
    assert pre.kv.get("r") is not None
    assert any(r is not None for r in pre.kv["r"])


def test_pd_mla_latent_pages_on_the_wire():
    """MLA P/D: the compressed latent rows (k side) + DSA indexer pages (v
    side) move between engines; absorbed-query decode continues exactly."""
    from prime_rl_tpu.models.mla_moe import init_params
    from tests.unit.models.test_mla_moe import dsa_spec

    spec = dsa_spec(index_topk=64)
    params = jax.tree.map(lambda x: x * 2.0, init_params(spec, jax.random.key(3)))
    rng = np.random.default_rng(9)
    prompt = [int(x) for x in rng.integers(3, 200, size=21)]
    pre = _pd_roundtrip(spec, params, prompt)
    assert pre.kv["k"].shape[1] == 1  # latent rows, not per-head KV
    assert pre.kv.get("v") is not None  # DSA indexer keys ride the V pool
