"""Train-step integration: sharded init, one jitted step on an 8-device CPU
mesh, loss decreases on a fixed batch (reference role: rl trainer unit tests +
the FakeDataLoader debug path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.configs import MeshConfig, TrainerConfig
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.parallel.mesh import build_mesh
from prime_rl_tpu.trainer import step as step_lib
from prime_rl_tpu.trainer.optim import make_optimizer
from prime_rl_tpu.trainer.rl.data import FakeDataLoader
from prime_rl_tpu.trainer.step import Scales, TrainState, init_train_state, make_train_step


@pytest.fixture(scope="module")
def setup():
    cfg = TrainerConfig()
    cfg.model.attn.impl = "xla"
    cfg.model.lm_head_chunk_size = 64
    spec = debug_spec(num_layers=2)
    mesh_info = build_mesh(MeshConfig(replica=1, fsdp=2, context=2, tensor=2))
    optimizer, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    # donation invalidates a state after one step — hand each test a fresh one
    make_state = lambda: init_train_state(spec, mesh_info, optimizer, seed=0)
    train_step = make_train_step(spec, cfg.model, cfg.loss, optimizer, mesh_info)
    return cfg, spec, mesh_info, optimizer, make_state, train_step


def _batch(spec, mesh_info, seed=0):
    loader = FakeDataLoader(spec.vocab_size, seq_len=128, micro_batch_rows=2, num_micro_batches=2, seed=seed)
    batch, counts = loader.next_batch()
    batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
    scales = Scales(
        rl=jnp.float32(counts["rl"]), ce=jnp.float32(max(counts["ce"], 1)),
        ref_kl=jnp.float32(max(counts["ref_kl"], 1)),
    )
    return batch, scales


def test_step_runs_and_updates(setup):
    cfg, spec, mesh_info, optimizer, make_state, train_step = setup
    state = make_state()
    batch, scales = _batch(spec, mesh_info)
    before = jax.tree.leaves(state.params)[0]
    before = np.asarray(before)
    state2, metrics = train_step(state, batch, scales)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["grad_norm"]) > 0
    after = np.asarray(jax.tree.leaves(state2.params)[0])
    assert not np.allclose(before, after)
    # mismatch-KL metric finalizes to a finite nonnegative mean
    assert float(metrics["mismatch_kl"].mean) >= 0


def test_loss_decreases_on_repeated_batch(setup):
    cfg, spec, mesh_info, optimizer, _, _ = setup
    # fresh state with a hotter LR so 10 steps visibly reduce loss
    from prime_rl_tpu.configs.shared import AdamWConfig

    opt, _ = make_optimizer(AdamWConfig(lr=5e-3), cfg.scheduler, 1.0)
    state = init_train_state(spec, mesh_info, opt, seed=1)
    train_step = make_train_step(spec, cfg.model, cfg.loss, opt, mesh_info)
    batch, scales = _batch(spec, mesh_info, seed=3)
    losses = []
    for _ in range(8):
        state, metrics = train_step(state, batch, scales)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_entropy_metric_reasonable(setup):
    cfg, spec, mesh_info, optimizer, make_state, train_step = setup
    state = make_state()
    batch, scales = _batch(spec, mesh_info, seed=5)
    _, metrics = train_step(state, batch, scales)
    ent = float(metrics["entropy"].mean)
    assert 0.0 < ent <= np.log(spec.vocab_size) + 1e-3


def test_moe_aux_loss_and_freeze():
    """MoE load-balance aux joins the loss when moe_aux_coef > 0, and frozen
    param paths receive zero updates (reference: moe load_balance_coeff +
    trainer/model.py freeze helpers)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from prime_rl_tpu.configs import TrainerConfig
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.parallel.mesh import build_mesh
    from prime_rl_tpu.trainer import step as step_lib
    from prime_rl_tpu.trainer.optim import make_optimizer
    from prime_rl_tpu.trainer.rl.data import FakeDataLoader
    from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step

    cfg = TrainerConfig()
    cfg.model.attn.impl = "xla"
    cfg.model.lm_head_chunk_size = 0
    cfg.model.moe_aux_coef = 0.01
    cfg.model.freeze = [r"layers/router$", r"embed"]
    spec = get_spec("debug_moe")
    mesh_info = build_mesh(cfg.mesh.__class__(fsdp=4, expert=2))
    opt, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    state = init_train_state(spec, mesh_info, opt, seed=0)
    step = make_train_step(spec, cfg.model, cfg.loss, opt, mesh_info)
    batch, counts = FakeDataLoader(spec.vocab_size, 64, 1, 2).next_batch()
    batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
    scales = Scales(rl=jnp.float32(max(counts["rl"], 1)), ce=jnp.float32(1),
                    ref_kl=jnp.float32(1))
    router_before = np.asarray(state.params["layers"]["router"])
    embed_before = np.asarray(state.params["embed"])
    gate_before = np.asarray(state.params["layers"]["expert_gate"])
    new_state, metrics = step(state, batch, scales)
    assert "moe_load_balance" in metrics
    assert float(metrics["moe_load_balance"].mean) > 0
    np.testing.assert_array_equal(np.asarray(new_state.params["layers"]["router"]),
                                  router_before)  # frozen
    np.testing.assert_array_equal(np.asarray(new_state.params["embed"]), embed_before)
    assert not np.array_equal(np.asarray(new_state.params["layers"]["expert_gate"]),
                              gate_before)  # still training


def test_bf16_grad_accumulation_close_to_f32(setup):
    """grad_accum_dtype=bfloat16 halves grad memory; the resulting update
    must stay close to the f32-accumulated one (long-context HBM lever)."""
    cfg, spec, mesh_info, optimizer, make_state, train_step = setup
    cfg16 = cfg.model_copy(deep=True)
    cfg16.model.grad_accum_dtype = "bfloat16"
    step16 = make_train_step(spec, cfg16.model, cfg16.loss, optimizer, mesh_info)

    batch, scales = _batch(spec, mesh_info)
    s_f32, m_f32 = train_step(make_state(), batch, scales)
    batch, scales = _batch(spec, mesh_info)
    s_b16, m_b16 = step16(make_state(), batch, scales)
    assert np.isfinite(float(m_b16["loss"]))
    assert abs(float(m_b16["loss"]) - float(m_f32["loss"])) < 1e-3
    gn32, gn16 = float(m_f32["grad_norm"]), float(m_b16["grad_norm"])
    assert abs(gn16 - gn32) / max(gn32, 1e-6) < 0.05
    a = np.asarray(jax.tree.leaves(s_f32.params)[0], np.float32)
    b = np.asarray(jax.tree.leaves(s_b16.params)[0], np.float32)
    np.testing.assert_allclose(a, b, rtol=0.1, atol=2e-3)


def test_streamed_adamw_matches_fused_update(setup):
    """Leaf-streamed AdamW (host-offloaded state) must reproduce the optax
    chain(clip, adamw) update exactly (the long-context update path)."""
    import optax

    from prime_rl_tpu.configs.shared import AdamWConfig
    from prime_rl_tpu.trainer.optim import make_optimizer

    cfg, spec, mesh_info, optimizer, make_state, train_step = setup
    opt_cfg = cfg.optimizer if isinstance(cfg.optimizer, AdamWConfig) else AdamWConfig()
    optimizer2, schedule = make_optimizer(opt_cfg, cfg.scheduler, cfg.grad_clip)

    s_ref = make_state()
    batch, scales = _batch(spec, mesh_info)
    ref_step = make_train_step(spec, cfg.model, cfg.loss, optimizer2, mesh_info)
    s_ref2, m_ref = ref_step(s_ref, batch, scales)

    s_str = make_state()
    sos = jax.tree.map(lambda x: x.sharding, s_str)
    str_step = make_train_step(spec, cfg.model, cfg.loss, optimizer2, mesh_info,
                               state_out_shardings=sos, optimizer_cfg=opt_cfg,
                               schedule=schedule, grad_clip=cfg.grad_clip)
    batch, scales = _batch(spec, mesh_info)
    s_str2, m_str = str_step(s_str, batch, scales)

    # the two grad programs compile separately -> different fusion/summation
    # order; tolerances cover that float noise, not algorithmic drift
    np.testing.assert_allclose(float(m_str["grad_norm"]), float(m_ref["grad_norm"]),
                               rtol=1e-4)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_ref2.params),
        jax.tree_util.tree_leaves_with_path(s_str2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                                   atol=1e-5, err_msg=str(pa))
    from prime_rl_tpu.trainer.step import _find_adam

    a1, a2 = _find_adam(s_ref2.opt_state), _find_adam(s_str2.opt_state)
    assert int(a1.count) == int(a2.count) == 1
    mu1 = jax.tree_util.tree_leaves(a1.mu)[0]
    mu2 = jax.tree_util.tree_leaves(a2.mu)[0]
    np.testing.assert_allclose(np.asarray(mu1), np.asarray(mu2), rtol=1e-3, atol=2e-5)


def test_dispatched_micro_batches_match_scan(setup):
    """One-program-per-micro-batch accumulation (axon wall-time bound) must
    match the in-scan accumulation step for step."""
    cfg, spec, mesh_info, optimizer, make_state, train_step = setup
    d_step = make_train_step(spec, cfg.model, cfg.loss, optimizer, mesh_info,
                             dispatch_micro_batches=True)
    batch, scales = _batch(spec, mesh_info)
    s_ref, m_ref = train_step(make_state(), batch, scales)
    batch, scales = _batch(spec, mesh_info)
    s_d, m_d = d_step(make_state(), batch, scales)
    np.testing.assert_allclose(float(m_d["loss"]), float(m_ref["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_d["grad_norm"]), float(m_ref["grad_norm"]),
                               rtol=1e-4)
    a = np.asarray(jax.tree.leaves(s_ref.params)[0])
    b = np.asarray(jax.tree.leaves(s_d.params)[0])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5)
