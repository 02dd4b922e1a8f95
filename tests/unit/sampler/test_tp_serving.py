"""Tensor-parallel serving (reference: vLLM tensor_parallel_size,
docs/inference.md:66-77): the engine's params and KV pools shard over a
``tensor`` mesh axis, decode attention runs head-local under shard_map, and
the greedy output must equal the unsharded engine token-for-token."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it
from jax.sharding import Mesh, PartitionSpec as P

from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.sampler.cache import CacheConfig
from prime_rl_tpu.sampler.engine import Engine, SamplingParams


@pytest.fixture(scope="module")
def setup():
    spec = debug_spec(num_layers=2, vocab_size=128)
    params = jax.tree.map(lambda x: x * 3.0, qwen3.init_params(spec, jax.random.key(0)))
    cfg = CacheConfig(num_pages=64, page_size=16, max_slots=4, max_seq_len=256)
    return spec, params, cfg


def _mesh(tp: int) -> Mesh:
    import numpy as _np

    devs = _np.asarray(jax.devices()[:tp]).reshape(1, 1, 1, 1, tp)
    return Mesh(devs, ("replica", "fsdp", "expert", "context", "tensor"))


def test_tp2_greedy_parity(setup):
    spec, params, cfg = setup
    assert spec.num_kv_heads % 2 == 0, "debug spec must split across tp=2"
    ref = Engine(params, spec, cfg, compute_dtype=jnp.float32)
    tp = Engine(params, spec, cfg, compute_dtype=jnp.float32, mesh=_mesh(2))

    # weights are actually sharded: each device holds half the q projection
    q0 = tp.params["layers"][0]["q"]
    shard_shapes = {s.data.shape for s in q0.addressable_shards}
    assert shard_shapes == {(q0.shape[0], q0.shape[1] // 2)}, shard_shapes
    # KV pools shard the head axis
    k0 = tp.k_pool[0]
    assert {s.data.shape[0] for s in k0.addressable_shards} == {k0.shape[0] // 2}

    rng = np.random.default_rng(11)
    prompts = [[int(x) for x in rng.integers(1, 120, n)] for n in (7, 21, 40)]
    sp = SamplingParams(max_tokens=10, temperature=0.0, ignore_eos=True)
    want = ref.generate(prompts, sp)
    got = tp.generate(prompts, sp)
    for w, g in zip(want, got):
        assert g.token_ids == w.token_ids
        np.testing.assert_allclose(g.logprobs, w.logprobs, atol=5e-2)


def test_tp2_weight_update_and_prefix_cache(setup):
    spec, params, cfg = setup
    tp = Engine(params, spec, cfg, compute_dtype=jnp.float32, mesh=_mesh(2))
    prompt = [5, 9, 23, 47, 3, 11, 30, 2, 19, 44, 8, 61, 33, 27, 50, 12, 7, 40]
    sp = SamplingParams(max_tokens=6, temperature=0.0, ignore_eos=True)
    first = tp.generate([prompt], sp)[0]
    # prefix-cache hit stays sharded and exact
    second = tp.generate([prompt], sp)[0]
    assert second.token_ids == first.token_ids
    assert tp.stats["prefill_tokens_cached"] > 0
    # update_params reshards the new pytree
    new = jax.tree.map(lambda x: x * 2.5, qwen3.init_params(spec, jax.random.key(4)))
    tp.update_params(new, version=3)
    after = tp.generate([prompt], sp)[0]
    ref = Engine(new, spec, cfg, compute_dtype=jnp.float32)
    assert after.token_ids == ref.generate([prompt], sp)[0].token_ids
    assert after.policy_version == 3
