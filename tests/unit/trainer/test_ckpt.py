"""Checkpoint/restore roundtrips (reference: tests test_checkpointing.py role)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.configs import MeshConfig, TrainerConfig
from prime_rl_tpu.configs.shared import CheckpointConfig, WeightCheckpointConfig
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.parallel.mesh import build_mesh
from prime_rl_tpu.trainer.ckpt import CheckpointManager, Progress, abstract_train_state
from prime_rl_tpu.trainer.optim import make_optimizer
from prime_rl_tpu.trainer.step import init_train_state
from prime_rl_tpu.trainer.weights import (
    WeightCheckpointManager,
    load_hf_weights,
    save_hf_weights,
)


@pytest.fixture(scope="module")
def state_and_spec():
    cfg = TrainerConfig()
    spec = debug_spec(num_layers=2)
    mesh_info = build_mesh(MeshConfig(fsdp=4, tensor=2))
    opt, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    state = init_train_state(spec, mesh_info, opt, seed=0)
    return state, spec, mesh_info


def test_sharded_ckpt_roundtrip(tmp_path, state_and_spec):
    state, spec, mesh_info = state_and_spec
    mgr = CheckpointManager(tmp_path, CheckpointConfig(keep_last=2))
    mgr.save(state, Progress(step=3, total_tokens=100))
    restored, progress = mgr.load(abstract_train_state(state), step=3)
    assert progress.step == 3 and progress.total_tokens == 100
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored keeps the sharded layout
    assert jax.tree.leaves(restored.params)[0].sharding == jax.tree.leaves(state.params)[0].sharding


def test_retention(tmp_path, state_and_spec):
    state, spec, _ = state_and_spec
    mgr = CheckpointManager(tmp_path, CheckpointConfig(keep_last=2, keep_interval=4))
    for s in range(1, 7):
        mgr.save(state, Progress(step=s))
    kept = mgr.latest_step()
    from prime_rl_tpu.utils.pathing import list_step_dirs

    steps = list_step_dirs(tmp_path / "checkpoints", stable_only=False)
    assert steps == [4, 5, 6]  # last 2 + interval multiple 4


def test_latest_resume(tmp_path, state_and_spec):
    state, spec, _ = state_and_spec
    mgr = CheckpointManager(tmp_path, CheckpointConfig())
    mgr.save(state, Progress(step=1))
    mgr.save(state, Progress(step=5))
    _, progress = mgr.load(abstract_train_state(state), step=-1)
    assert progress.step == 5


def test_hf_weights_roundtrip(tmp_path, state_and_spec):
    state, spec, _ = state_and_spec
    save_hf_weights(state.params, spec, tmp_path / "w")
    assert (tmp_path / "w" / "model.safetensors").exists()
    assert (tmp_path / "w" / "config.json").exists()
    restored = load_hf_weights(tmp_path / "w", spec)
    orig = jax.device_get(state.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b, np.float32), rtol=1e-2, atol=1e-2
        ),
        orig,
        restored,
    )


def test_weight_ckpt_retention(tmp_path, state_and_spec):
    state, spec, _ = state_and_spec
    mgr = WeightCheckpointManager(tmp_path, WeightCheckpointConfig(keep_last=1), spec)
    mgr.save(state.params, 1)
    mgr.save(state.params, 2)
    assert not (tmp_path / "weights" / "step_1").exists()
    assert (tmp_path / "weights" / "step_2" / "model.safetensors").exists()


def test_lowmem_optimizer_state_roundtrip(tmp_path):
    """adamw_8bit (int8 moment blocks) + bf16 masters survive an orbax
    checkpoint/restore bit-exactly — the production resume path for the
    round-4 memory-lever recipe."""
    cfg = TrainerConfig(optimizer={"type": "adamw_8bit", "lr": 1e-3,
                                   "master_dtype": "bfloat16"})
    spec = debug_spec(num_layers=2)
    mesh_info = build_mesh(MeshConfig(fsdp=4, tensor=2))
    opt, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    state = init_train_state(spec, mesh_info, opt, seed=0,
                             master_dtype="bfloat16")
    # one real update so the int8 blocks are non-trivial
    import optax

    grads = jax.tree.map(lambda x: jnp.ones_like(x, jnp.float32)
                         if jnp.issubdtype(x.dtype, jnp.floating) else x,
                         state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    from prime_rl_tpu.trainer.step import TrainState

    state = TrainState(params=state.params, opt_state=opt_state,
                       step=state.step + 1)
    mgr = CheckpointManager(tmp_path, CheckpointConfig(keep_last=2))
    mgr.save(state, Progress(step=1))
    restored, progress = mgr.load(abstract_train_state(state), step=1)
    for a, b in zip(jax.tree.leaves(state.opt_state),
                    jax.tree.leaves(restored.opt_state)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree.leaves(restored.params)[0].dtype == jnp.bfloat16
