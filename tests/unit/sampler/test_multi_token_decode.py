"""Multi-token decode (k on-device steps per dispatched program, VERDICT r3
next-round #1): parity across block sizes, in-program stopping, dispatch
amortization, and adaptive-k behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.sampler.cache import CacheConfig
from prime_rl_tpu.sampler.engine import Engine, SamplingParams


@pytest.fixture(scope="module")
def stack():
    spec = debug_spec(num_layers=2, vocab_size=128)
    params = qwen3.init_params(spec, jax.random.key(0))
    params = jax.tree.map(lambda x: x * 3.0, params)
    return spec, params


def _engine(spec, params, decode_block):
    cfg = CacheConfig(num_pages=64, page_size=16, max_slots=4, max_seq_len=256)
    return Engine(params, spec, cfg, compute_dtype=jnp.float32,
                  decode_block=decode_block)


def test_block_sizes_are_equivalent(stack):
    """Greedy output must be bit-identical for k=1/4/8 (the program is the
    same math, only the dispatch granularity changes)."""
    spec, params = stack
    rng = np.random.default_rng(11)
    prompts = [[int(x) for x in rng.integers(1, 100, n)] for n in (5, 21, 9)]
    sp = SamplingParams(max_tokens=13, temperature=0.0)
    want = _engine(spec, params, 1).generate(prompts, sp)
    for k in (4, 8):
        got = _engine(spec, params, k).generate(prompts, sp)
        for w, g in zip(want, got):
            assert g.token_ids == w.token_ids
            np.testing.assert_allclose(g.logprobs, w.logprobs, atol=1e-5)


def test_stop_token_mid_block(stack):
    """A stop hit inside a k-block must cut the completion at the stop token
    (host discards the in-program overshoot rows)."""
    spec, params = stack
    e = _engine(spec, params, 8)
    prompt = [5, 9, 23]
    base = e.generate([prompt], SamplingParams(max_tokens=12, temperature=0.0))[0]
    stop_at = base.token_ids[2]
    first_idx = base.token_ids.index(stop_at)
    r = e.generate([prompt], SamplingParams(max_tokens=12, temperature=0.0,
                                            stop_token_ids=[stop_at]))[0]
    assert r.finish_reason == "stop"
    assert r.token_ids == base.token_ids[: first_idx + 1]


def test_dispatch_count_amortized(stack):
    """The whole point: k=8 must dispatch ~1/8 the programs of k=1."""
    spec, params = stack
    prompt = [int(x) for x in np.random.default_rng(5).integers(1, 100, 10)]
    sp = SamplingParams(max_tokens=32, temperature=0.0, ignore_eos=True)
    e1 = _engine(spec, params, 1)
    e1.generate([prompt], sp)
    e8 = _engine(spec, params, 8)
    e8.generate([prompt], sp)
    assert e8._dispatch_seq * 4 <= e1._dispatch_seq


def test_adaptive_k_drops_while_pending(stack):
    """With requests waiting for admission, the engine dispatches k=1
    programs so the joiner is not stuck behind a k-token block."""
    spec, params = stack
    e = _engine(spec, params, 8)
    e.pending.append(object())  # blocked admission pressure
    try:
        assert e._pick_block([0]) == 2  # decode_block // 4
    finally:
        e.pending.clear()
    assert e._pick_block([0]) == 8  # stable batch: full block


def test_batched_prefill_engages_and_matches_single(stack):
    """An admission burst of same-bucket plain requests must prefill through
    ONE batched program (per-request prefill programs are dispatch-bound on
    remote runtimes), with greedy output identical to solo admission."""
    spec, params = stack
    e = _engine(spec, params, 8)
    rng = np.random.default_rng(21)
    prompts = [[int(x) for x in rng.integers(1, 100, 12)] for _ in range(5)]
    sp = SamplingParams(max_tokens=6, temperature=0.0)
    batch_results = e.generate(prompts, sp)
    # the (lpad, bsz) batched program was compiled and used: 4 + leftover 1
    assert any(isinstance(k, tuple) and k and k[0] == "batch"
               for k in e._prefill_fns)
    for p, r in zip(prompts, batch_results):
        solo = e.generate([p], sp)[0]
        assert r.token_ids == solo.token_ids


def test_warmup_precompiles_and_leaves_engine_clean(stack):
    """engine.warmup() must compile the hot programs (batched prefill +
    both decode blocks) and leave no slots, pages, or cache entries behind
    (dummy pages must never prefix-hit real traffic)."""
    spec, params = stack
    e = _engine(spec, params, 8)
    e.warmup(4, prompt_len=12)
    assert any(isinstance(k, tuple) and k and k[0] == "batch"
               for k in e._prefill_fns)
    assert (8, False) in e._decode_fns and (2, False) in e._decode_fns
    assert not e.active and not e.pending and not e._inflight
    assert len(e.slots.free_slots) == e.config.max_slots
    # real traffic still exact after warmup
    prompt = [5, 9, 23, 47]
    r = e.generate([prompt], SamplingParams(max_tokens=6, temperature=0.0))[0]
    r2 = _engine(spec, params, 8).generate(
        [prompt], SamplingParams(max_tokens=6, temperature=0.0))[0]
    assert r.token_ids == r2.token_ids


def test_many_stop_ids_beyond_device_window(stack):
    """More stop ids than MAX_STOP: host-side enforcement still exact."""
    spec, params = stack
    e = _engine(spec, params, 8)
    prompt = [5, 9, 23]
    base = e.generate([prompt], SamplingParams(max_tokens=12, temperature=0.0))[0]
    stop_at = base.token_ids[3]
    first_idx = base.token_ids.index(stop_at)
    # pad the stop list with ids that never fire, pushing the real one past
    # the in-program window
    decoys = [t for t in range(127, 0, -1)
              if t not in base.token_ids][: Engine.MAX_STOP]
    r = e.generate([prompt], SamplingParams(
        max_tokens=12, temperature=0.0, stop_token_ids=decoys + [stop_at]))[0]
    assert r.finish_reason == "stop"
    assert r.token_ids == base.token_ids[: first_idx + 1]
