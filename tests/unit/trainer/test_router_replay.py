"""MoE router replay end-to-end: forced expert selection in the router,
self-replay invariance of the model forward, engine-side routing recording,
and the batch-packing stream (reference: routed_experts wire field +
models/layers/moe.py router replay)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.models import qwen3_moe
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.ops.moe import route_topk
from prime_rl_tpu.trainer.batch import prepare_batch
from prime_rl_tpu.transport.types import TrainingSample


def test_route_topk_forced_selection():
    rng = np.random.default_rng(0)
    T, D, E, K = 8, 16, 6, 2
    x = jnp.asarray(rng.standard_normal((T, D)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((D, E)), jnp.float32)

    own = route_topk(x, w, K)
    forced = np.tile(np.asarray([[1, 4]], np.int32), (T, 1))
    forced[3] = -1  # row 3 falls back to own routing
    out = route_topk(x, w, K, forced_experts=jnp.asarray(forced))

    ids = np.asarray(out.expert_ids)
    assert (ids[0] == [1, 4]).all() and (ids[7] == [1, 4]).all()
    np.testing.assert_array_equal(ids[3], np.asarray(own.expert_ids)[3])
    # weights come from THIS router's softmax probs at the forced experts
    probs = np.asarray(jax.nn.softmax(x @ w, axis=-1))
    want = probs[0, [1, 4]]
    want = want / want.sum()
    np.testing.assert_allclose(np.asarray(out.weights)[0], want, rtol=1e-5)


def test_forward_self_replay_is_identity():
    """Replaying the model's own routing must not change the output."""
    spec = get_spec("debug_moe")
    params = qwen3_moe.init_params(spec, jax.random.key(0))
    rng = np.random.default_rng(1)
    B, L = 2, 16
    ids = jnp.asarray(rng.integers(3, 500, size=(B, L)), jnp.int32)
    seg = jnp.ones((B, L), jnp.int32)
    pos = jnp.tile(jnp.arange(L), (B, 1)).astype(jnp.int32)

    base = qwen3_moe.forward(params, spec, ids, seg, pos, compute_dtype=jnp.float32,
                             attn_impl="xla", remat="none")

    # record the model's own routing by replaying per layer: recover it from
    # route_topk on the actual per-layer inputs is intrusive; instead check
    # (a) -1 replay == no replay and (b) a DIFFERENT forced routing changes out
    neg = jnp.full((B, L, spec.num_layers, spec.num_experts_per_tok), -1, jnp.int32)
    same = qwen3_moe.forward(params, spec, ids, seg, pos, compute_dtype=jnp.float32,
                             attn_impl="xla", remat="none", routed_experts=neg)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), rtol=1e-6)

    forced = jnp.zeros((B, L, spec.num_layers, spec.num_experts_per_tok), jnp.int32)
    diff = qwen3_moe.forward(params, spec, ids, seg, pos, compute_dtype=jnp.float32,
                             attn_impl="xla", remat="none", routed_experts=forced)
    assert not np.allclose(np.asarray(base), np.asarray(diff), atol=1e-4)
    assert np.isfinite(np.asarray(diff)).all()


def test_engine_collects_routed_experts():
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    spec = get_spec("debug_moe")
    params = qwen3_moe.init_params(spec, jax.random.key(0))
    engine = Engine(params, spec,
                    CacheConfig(num_pages=32, page_size=16, max_slots=2, max_seq_len=128),
                    compute_dtype=jnp.float32, collect_routed_experts=True)
    n_gen = 5
    res = engine.generate([[1, 2, 3, 4]],
                          [SamplingParams(max_tokens=n_gen, ignore_eos=True)])[0]
    r = res.routed_experts
    assert r is not None and r.shape == (n_gen, spec.num_layers, spec.num_experts_per_tok)
    # every recorded row is a valid expert id; the final token's row is -1
    assert (r[:-1] >= 0).all() and (r[:-1] < spec.num_experts).all()
    assert (r[-1] == -1).all()


def test_batch_packs_routed_stream():
    spec = get_spec("debug_moe")
    nl, k = spec.num_layers, spec.num_experts_per_tok
    rng = np.random.default_rng(2)

    def sample(n, with_routing):
        routed = None
        if with_routing:
            routed = rng.integers(0, spec.num_experts, size=(n, nl, k)).astype(np.int32)
            routed[: n // 2] = -1  # context half unrecorded
        return TrainingSample(
            token_ids=rng.integers(3, 500, size=n).astype(np.int32),
            mask=np.ones(n, bool),
            logprobs=np.zeros(n, np.float32),
            temperatures=np.ones(n, np.float32),
            advantages=np.ones(n, np.float32),
            routed_experts=routed,
        )

    s1, s2 = sample(10, True), sample(6, False)
    batch = prepare_batch([s1, s2], seq_len=16, micro_batch_rows=2, num_micro_batches=1)
    r = batch.routed_experts
    assert r is not None and r.shape == (1, 2, 16, nl, k)
    # row with no recording and padding positions are -1
    packed_all = r.reshape(-1, nl, k)
    assert (packed_all >= -1).all()
    # s1's recorded half survives somewhere in the batch
    assert (r >= 0).any()


@pytest.mark.parametrize("name,nl_key", [
    ("debug_laguna", "moe"),       # glm4-style split stacks (covers glm4/minimax/afmoe)
    ("debug_qwen3_next", "all"),   # hybrid: every layer runs the MoE MLP
])
def test_replay_identity_on_moe_families(name, nl_key):
    """-1 replay == no replay, and a forced routing changes the output —
    for the glm4-style and hybrid family forwards (the engine records these
    families' routing; the trainer must be able to replay it)."""
    from prime_rl_tpu.models import get_family

    spec = get_spec(name)
    fam = get_family(spec)
    params = fam.init(spec, jax.random.key(0))
    rng = np.random.default_rng(2)
    B, L = 1, 12
    ids = jnp.asarray(rng.integers(3, 500, size=(B, L)), jnp.int32)
    seg = jnp.ones((B, L), jnp.int32)
    pos = jnp.tile(jnp.arange(L), (B, 1)).astype(jnp.int32)
    kw = dict(compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    nl = spec.num_layers if nl_key == "all" else spec.num_layers - spec.first_k_dense_replace

    base = fam.forward(params, spec, ids, seg, pos, **kw)
    neg = jnp.full((B, L, nl, spec.num_experts_per_tok), -1, jnp.int32)
    same = fam.forward(params, spec, ids, seg, pos, routed_experts=neg, **kw)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), rtol=1e-6)
    forced = jnp.zeros((B, L, nl, spec.num_experts_per_tok), jnp.int32)
    diff = fam.forward(params, spec, ids, seg, pos, routed_experts=forced, **kw)
    assert not np.allclose(np.asarray(base), np.asarray(diff), atol=1e-4)
    assert np.isfinite(np.asarray(diff)).all()
