"""LoRA: adapter-only training, identity at init, merge correctness
(reference roles: trainer/lora.py tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.configs import MeshConfig, TrainerConfig
from prime_rl_tpu.configs.shared import AdamWConfig, LoRAConfig
from prime_rl_tpu.models import qwen3
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.models.lora import init_lora, lora_scale, merge_lora, adapter_state_dict
from prime_rl_tpu.parallel.mesh import build_mesh
from prime_rl_tpu.trainer import step as step_lib
from prime_rl_tpu.trainer.optim import make_optimizer
from prime_rl_tpu.trainer.rl.data import FakeDataLoader
from prime_rl_tpu.trainer.step import (
    Scales,
    init_base_params,
    init_lora_train_state,
    make_train_step,
)


@pytest.fixture(scope="module")
def spec():
    return debug_spec(num_layers=2)


def test_lora_identity_at_init(spec):
    cfg = LoRAConfig(rank=4)
    base = qwen3.init_params(spec, jax.random.key(0))
    lora = init_lora(spec, cfg, jax.random.key(1))
    ids = jnp.arange(16)[None, :].astype(jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.arange(16)[None, :].astype(jnp.int32)
    h0 = qwen3.forward(base, spec, ids, seg, pos, compute_dtype=jnp.float32,
                       attn_impl="xla", remat="none")
    h1 = qwen3.forward(base, spec, ids, seg, pos, compute_dtype=jnp.float32,
                       attn_impl="xla", remat="none", lora=lora, lora_scale=lora_scale(cfg))
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    # B=0 -> merge is the identity
    merged = merge_lora(base, lora, cfg)
    np.testing.assert_allclose(np.asarray(merged["layers"]["q"]),
                               np.asarray(base["layers"]["q"]), atol=1e-7)


def test_merge_matches_runtime_adapter(spec):
    cfg = LoRAConfig(rank=4)
    base = qwen3.init_params(spec, jax.random.key(0))
    lora = init_lora(spec, cfg, jax.random.key(1))
    # make B nonzero so the adapter does something
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    ids = jnp.arange(16)[None, :].astype(jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.arange(16)[None, :].astype(jnp.int32)
    with_adapter = qwen3.forward(base, spec, ids, seg, pos, compute_dtype=jnp.float32,
                                 attn_impl="xla", remat="none",
                                 lora=lora, lora_scale=lora_scale(cfg))
    merged = merge_lora(base, lora, cfg)
    with_merged = qwen3.forward(merged, spec, ids, seg, pos, compute_dtype=jnp.float32,
                                attn_impl="xla", remat="none")
    np.testing.assert_allclose(np.asarray(with_adapter), np.asarray(with_merged),
                               atol=1e-4, rtol=1e-4)


def test_lora_train_step_only_updates_adapters(spec):
    cfg = TrainerConfig()
    cfg.model.attn.impl = "xla"
    cfg.model.lm_head_chunk_size = 0
    cfg.model.lora = LoRAConfig(rank=4)
    mesh_info = build_mesh(MeshConfig(fsdp=2, tensor=2, context=2))
    opt, _ = make_optimizer(AdamWConfig(lr=1e-2), cfg.scheduler, 1.0)
    base = init_base_params(spec, mesh_info, seed=0)
    base_before = np.asarray(jax.tree.leaves(base)[0]).copy()
    state = init_lora_train_state(spec, cfg.model.lora, mesh_info, opt, seed=0)
    ts = make_train_step(spec, cfg.model, cfg.loss, opt, mesh_info, base_params=base)
    loader = FakeDataLoader(spec.vocab_size, 128, 2, 2, seed=4)
    losses = []
    for _ in range(4):
        batch, counts = loader.next_batch()
        batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
        scales = Scales(jnp.float32(max(counts["rl"], 1)), jnp.float32(1), jnp.float32(1))
        state, metrics = ts(state, batch, scales)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    # adapters moved (B no longer zero)
    assert float(jnp.abs(state.params["layers"]["q_b"]).sum()) > 0
    # base untouched
    np.testing.assert_array_equal(np.asarray(jax.tree.leaves(base)[0]), base_before)


def test_adapter_export(spec):
    cfg = LoRAConfig(rank=4, target_modules=["q_proj", "v_proj"])
    lora = init_lora(spec, cfg, jax.random.key(2))
    state = adapter_state_dict(lora, spec, cfg)
    assert "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight" in state
    assert state["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"].shape == (4, spec.hidden_size)
    assert not any("gate_proj" in k for k in state)


@pytest.mark.parametrize("name", ["debug_moe", "debug_laguna", "debug_qwen3_next"])
def test_lora_active_on_moe_families(name):
    """Attention-projection LoRA must actually change the forward of the MoE
    family stacks (regression: the stacked adapter pytree was once passed
    un-sliced into the per-layer block, silently no-opping)."""
    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import get_spec

    spec = get_spec(name)
    fam = get_family(spec)
    cfg = LoRAConfig(rank=4)
    base = fam.init(spec, jax.random.key(0))
    lora = init_lora(spec, cfg, jax.random.key(1))
    # make the adapter non-trivial (B is zeros at init)
    lora = jax.tree.map(
        lambda x: x + 0.05 if x.ndim == 3 else x, lora)
    ids = jnp.arange(1, 17)[None, :].astype(jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.arange(16)[None, :].astype(jnp.int32)
    kw = dict(compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    h0 = fam.forward(base, spec, ids, seg, pos, **kw)
    h1 = fam.forward(base, spec, ids, seg, pos, lora=lora,
                     lora_scale=lora_scale(cfg), **kw)
    assert float(jnp.max(jnp.abs(h0 - h1))) > 1e-5
    # and zero-B adapters are exactly the identity
    lora0 = init_lora(spec, cfg, jax.random.key(2))
    h2 = fam.forward(base, spec, ids, seg, pos, lora=lora0,
                     lora_scale=lora_scale(cfg), **kw)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h2), atol=1e-6)


def test_lora_active_on_mla_family():
    """MLA latent-projection LoRA (q_b/kv_a/kv_b/o targets — generic q/k/v
    names map onto them): adapters change the forward; zero-B is identity;
    merge matches the runtime adapter."""
    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import debug_spec

    spec = debug_spec(
        num_layers=2, family="deepseek_v3", qk_norm=False, tie_embeddings=False,
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=64,
        n_shared_experts=1, first_k_dense_replace=1, router_sigmoid=True,
        q_lora_rank=48, kv_lora_rank=32, qk_rope_head_dim=8, qk_nope_head_dim=24,
        v_head_dim=16, head_dim=32, rope_interleave=True,
    )
    fam = get_family(spec)
    cfg = LoRAConfig(rank=4)
    base = fam.init(spec, jax.random.key(0))
    lora = init_lora(spec, cfg, jax.random.key(1))
    assert "q_b_a" in lora["layers"] and "kv_b_a" in lora["layers"]
    ids = jnp.arange(1, 17)[None, :].astype(jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.arange(16)[None, :].astype(jnp.int32)
    kw = dict(compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    h0 = fam.forward(base, spec, ids, seg, pos, **kw)
    # zero-B: identity
    h1 = fam.forward(base, spec, ids, seg, pos, lora=lora,
                     lora_scale=lora_scale(cfg), **kw)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    # non-trivial adapter changes the output, and merge == runtime adapter
    lora2 = jax.tree.map(lambda x: x + 0.03, lora)
    h2 = fam.forward(base, spec, ids, seg, pos, lora=lora2,
                     lora_scale=lora_scale(cfg), **kw)
    assert float(jnp.max(jnp.abs(h0 - h2))) > 1e-5
    merged = merge_lora(base, lora2, cfg)
    h3 = fam.forward(merged, spec, ids, seg, pos, **kw)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h3), rtol=2e-4, atol=2e-4)


def test_lora_active_on_nemotron_attention():
    """nemotron_h: attention-layer ('*') LoRA changes the forward; zero-B is
    identity (Mamba/MLP/MoE layers stay base)."""
    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import get_spec

    spec = get_spec("debug_nemotron")
    fam = get_family(spec)
    cfg = LoRAConfig(rank=4)
    base = fam.init(spec, jax.random.key(0))
    lora = init_lora(spec, cfg, jax.random.key(1))
    ids = jnp.arange(1, 17)[None, :].astype(jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.arange(16)[None, :].astype(jnp.int32)
    kw = dict(compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    h0 = fam.forward(base, spec, ids, seg, pos, **kw)
    h1 = fam.forward(base, spec, ids, seg, pos, lora=lora,
                     lora_scale=lora_scale(cfg), **kw)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    lora2 = jax.tree.map(lambda x: x + 0.05, lora)
    h2 = fam.forward(base, spec, ids, seg, pos, lora=lora2,
                     lora_scale=lora_scale(cfg), **kw)
    assert float(jnp.max(jnp.abs(h0 - h2))) > 1e-5
    merged = merge_lora(base, lora2, cfg, spec=spec)
    h3 = fam.forward(merged, spec, ids, seg, pos, **kw)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h3), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", ["debug_moe", "debug_laguna", "debug_qwen3_next",
                                  "debug_nemotron"])
def test_expert_lora(name):
    """Per-expert LoRA (lora.experts=true): gate/up/down targets apply inside
    the grouped-GEMM expert compute (two extra ragged_dots). Zero-B is the
    identity; non-trivial adapters change the forward; merge == runtime
    (reference analogue: PEFT targeting grouped expert weights — the
    reference itself ships attention-LoRA only via MultiLoRALinear)."""
    from prime_rl_tpu.models import get_family
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.models.lora import resolve_targets

    spec = get_spec(name)
    fam = get_family(spec)
    cfg = LoRAConfig(rank=4, experts=True,
                     target_modules=["gate_proj", "up_proj", "down_proj"])
    targets = resolve_targets(cfg, spec)
    assert "moe_up" in targets and "moe_down" in targets
    if name == "debug_nemotron":
        assert "moe_gate" not in targets  # LatentMoE experts are non-gated
    base = fam.init(spec, jax.random.key(0))
    lora = init_lora(spec, cfg, jax.random.key(1))
    assert lora["layers"]["moe_up_a"].shape == (
        spec.num_layers, spec.num_experts,
        getattr(spec, "moe_latent_size", 0) or spec.hidden_size, 4)
    ids = jnp.arange(1, 17)[None, :].astype(jnp.int32)
    seg = jnp.ones_like(ids)
    pos = jnp.arange(16)[None, :].astype(jnp.int32)
    kw = dict(compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    h0 = fam.forward(base, spec, ids, seg, pos, **kw)
    # zero-B: exact identity
    h1 = fam.forward(base, spec, ids, seg, pos, lora=lora,
                     lora_scale=lora_scale(cfg), **kw)
    np.testing.assert_allclose(np.asarray(h0), np.asarray(h1), atol=1e-6)
    # non-trivial adapters change the output; merge matches the runtime path
    lora2 = jax.tree.map(lambda x: x + 0.03, lora)
    h2 = fam.forward(base, spec, ids, seg, pos, lora=lora2,
                     lora_scale=lora_scale(cfg), **kw)
    assert float(jnp.max(jnp.abs(h0 - h2))) > 1e-5
    merged = merge_lora(base, lora2, cfg, spec=spec)
    h3 = fam.forward(merged, spec, ids, seg, pos, **kw)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h3), rtol=2e-4, atol=2e-4)


def test_expert_lora_adapter_roundtrip():
    """PEFT-style export/import of per-expert adapters (mlp.experts.{e}.*)."""
    from prime_rl_tpu.models.base import get_spec
    from prime_rl_tpu.models.lora import adapter_from_state_dict

    spec = get_spec("debug_moe")
    cfg = LoRAConfig(rank=4, experts=True)
    lora = init_lora(spec, cfg, jax.random.key(3))
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    state = adapter_state_dict(lora, spec, cfg)
    key = "base_model.model.model.layers.0.mlp.experts.0.up_proj.lora_A.weight"
    assert key in state and state[key].shape == (4, spec.hidden_size)
    back = adapter_from_state_dict(state, spec)
    for k in ("moe_gate_a", "moe_up_b", "moe_down_a"):
        np.testing.assert_allclose(np.asarray(back[k]),
                                   np.asarray(lora["layers"][k]), atol=1e-7)
