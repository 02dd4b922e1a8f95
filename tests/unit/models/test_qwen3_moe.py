"""MoE correctness: ragged-dispatch vs dense-oracle parity, training step,
HF conversion roundtrip, and engine decode parity
(reference roles: tests models/test_* MoE suites)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import get_family, qwen3_moe
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.ops.moe import moe_mlp, route_topk


def naive_moe(x, router_w, w_gate, w_up, w_down, top_k, norm):
    """Oracle: loop over experts with one-hot combine."""
    t, d = x.shape
    logits = x.astype(np.float64) @ np.asarray(router_w, np.float64)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)
    out = np.zeros((t, d))
    for i in range(t):
        top = np.argsort(-probs[i])[:top_k]
        w = probs[i][top]
        if norm:
            w = w / w.sum()
        for expert, weight in zip(top, w):
            g = x[i].astype(np.float64) @ np.asarray(w_gate[expert], np.float64)
            u = x[i].astype(np.float64) @ np.asarray(w_up[expert], np.float64)
            h = (g / (1 + np.exp(-g))) * u
            out[i] += weight * (h @ np.asarray(w_down[expert], np.float64))
    return out


def test_moe_mlp_matches_oracle():
    rng = np.random.default_rng(0)
    T, D, E, M, K = 16, 8, 4, 12, 2
    x = rng.normal(size=(T, D)).astype(np.float32)
    router = rng.normal(size=(D, E)).astype(np.float32)
    wg = rng.normal(size=(E, D, M)).astype(np.float32) * 0.3
    wu = rng.normal(size=(E, D, M)).astype(np.float32) * 0.3
    wd = rng.normal(size=(E, M, D)).astype(np.float32) * 0.3
    out, routing = moe_mlp(jnp.array(x), jnp.array(router), jnp.array(wg),
                           jnp.array(wu), jnp.array(wd), K, True)
    want = naive_moe(x, router, wg, wu, wd, K, True)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-3, atol=1e-3)
    # combine weights normalized
    np.testing.assert_allclose(np.asarray(routing.weights).sum(-1), 1.0, rtol=1e-5)


def test_route_topk_load_balance_bounds():
    rng = np.random.default_rng(1)
    x = jnp.array(rng.normal(size=(64, 8)), jnp.float32)
    router = jnp.array(rng.normal(size=(8, 4)), jnp.float32)
    out = route_topk(x, router, 2)
    # perfect balance would be 1.0; any routing is >= ~1
    assert float(out.load_balance_loss) >= 0.99


def test_moe_forward_and_grad():
    spec = get_spec("debug_moe")
    fam = get_family(spec)
    params = fam.init(spec, jax.random.key(0))
    ids = jnp.zeros((1, 64), jnp.int32).at[0, :8].set(jnp.arange(8))
    seg = jnp.ones((1, 64), jnp.int32)
    pos = jnp.broadcast_to(jnp.arange(64), (1, 64)).astype(jnp.int32)

    def loss(p):
        h = fam.forward(p, spec, ids, seg, pos, compute_dtype=jnp.float32,
                        attn_impl="xla", remat="none")
        return jnp.sum(h ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    # expert weights receive gradient
    g = np.asarray(grads["layers"]["expert_gate"])
    assert np.abs(g).sum() > 0
    # router receives gradient through the combine weights
    assert np.abs(np.asarray(grads["layers"]["router"])).sum() > 0


def test_moe_hf_roundtrip():
    spec = get_spec("debug_moe")
    params = jax.device_get(qwen3_moe.init_params(spec, jax.random.key(2)))
    state = qwen3_moe.params_to_hf_state_dict(params, spec)
    assert "model.layers.0.mlp.experts.0.gate_proj.weight" in state
    assert "model.layers.0.mlp.gate.weight" in state
    back = qwen3_moe.params_from_hf_state_dict(state, spec)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6),
        params, jax.device_get(back),
    )


def test_moe_train_step():
    from prime_rl_tpu.configs import MeshConfig, TrainerConfig
    from prime_rl_tpu.parallel.mesh import build_mesh
    from prime_rl_tpu.trainer import step as step_lib
    from prime_rl_tpu.trainer.optim import make_optimizer
    from prime_rl_tpu.trainer.rl.data import FakeDataLoader
    from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step

    cfg = TrainerConfig()
    cfg.model.attn.impl = "xla"
    cfg.model.lm_head_chunk_size = 0
    spec = get_spec("debug_moe")
    mesh_info = build_mesh(MeshConfig(fsdp=2, expert=2, tensor=2))
    opt, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    state = init_train_state(spec, mesh_info, opt, seed=0)
    # expert weights sharded over the expert axis
    eg = state.params["layers"]["expert_gate"]
    assert "expert" in str(eg.sharding.spec)
    ts = make_train_step(spec, cfg.model, cfg.loss, opt, mesh_info)
    loader = FakeDataLoader(spec.vocab_size, 128, 2, 2, seed=1)
    batch, counts = loader.next_batch()
    batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
    scales = Scales(jnp.float32(max(counts["rl"], 1)), jnp.float32(1), jnp.float32(1))
    state2, metrics = ts(state, batch, scales)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0


def test_moe_engine_greedy_parity():
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    spec = get_spec("debug_moe")
    fam = get_family(spec)
    params = jax.tree.map(lambda x: x * 2.0, fam.init(spec, jax.random.key(3)))
    engine = Engine(params, spec,
                    CacheConfig(num_pages=64, page_size=16, max_slots=2, max_seq_len=256),
                    compute_dtype=jnp.float32)
    prompt = [5, 9, 23, 47, 3]
    got = engine.generate([prompt], SamplingParams(max_tokens=8, temperature=0.0))[0]

    ids = list(prompt)
    want = []
    for _ in range(8):
        arr = jnp.asarray([ids], jnp.int32)
        h = fam.forward(params, spec, arr, jnp.ones_like(arr),
                        jnp.asarray([list(range(len(ids)))], jnp.int32),
                        compute_dtype=jnp.float32, attn_impl="xla", remat="none")
        tok = int(jnp.argmax(h[0, -1] @ fam.get_lm_head(params, spec)))
        want.append(tok)
        ids.append(tok)
        if tok == spec.eos_token_id:
            break
    assert got.token_ids == want[: len(got.token_ids)]
