"""On-device kernel parity (run manually / by the driver on real TPU:
``JAX_PLATFORMS='' pytest tests/tpu -m tpu``). These checks caught a real
bug: the jax paged-attention kernel applies no softmax scale."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

requires_tpu = pytest.mark.skipif(
    jax.default_backend() in ("cpu",), reason="needs a TPU device"
)


@requires_tpu
def test_paged_decode_attention_parity():
    from prime_rl_tpu.sampler.model import _decode_attention

    S, NH, NKV, HD, NP, PS, P = 8, 4, 2, 128, 64, 64, 8
    ks = jax.random.split(jax.random.key(0), 4)
    q = jax.random.normal(ks[0], (S, NH, HD), jnp.bfloat16)
    k_pages = jax.random.normal(ks[1], (NKV, NP, PS, HD), jnp.bfloat16)
    v_pages = jax.random.normal(ks[2], (NKV, NP, PS, HD), jnp.bfloat16)
    lengths = jnp.array([5, 64, 65, 100, 128, 200, 300, 1], jnp.int32)
    page_table = jax.random.permutation(ks[3], NP)[: S * P].reshape(S, P).astype(jnp.int32)
    o_ref = np.asarray(_decode_attention(q, k_pages, v_pages, lengths, page_table, "xla"), np.float32)
    o_pal = np.asarray(_decode_attention(q, k_pages, v_pages, lengths, page_table, "pallas"), np.float32)
    np.testing.assert_allclose(o_pal, o_ref, atol=2e-2, rtol=2e-2)


@requires_tpu
def test_flash_attention_parity_tpu():
    from prime_rl_tpu.ops.attention import xla_attention
    from prime_rl_tpu.ops.flash_attention import flash_attention

    B, L, NH, NKV, HD = 1, 1024, 4, 2, 128
    ks = jax.random.split(jax.random.key(1), 3)
    q = jax.random.normal(ks[0], (B, L, NH, HD), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, L, NKV, HD), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, L, NKV, HD), jnp.bfloat16)
    seg = jnp.concatenate([jnp.full((B, L // 2), 1), jnp.full((B, L // 2), 2)], axis=1).astype(jnp.int32)
    o_ref = np.asarray(xla_attention(q, k, v, seg, seg), np.float32)
    o_pal = np.asarray(flash_attention(q, k, v, seg, block_q=256, block_kv=256), np.float32)
    np.testing.assert_allclose(o_pal, o_ref, atol=2e-2, rtol=2e-2)


@requires_tpu
def test_offloaded_optimizer_step():
    """Optimizer state in pinned host memory still trains (and frees HBM)."""
    import jax.numpy as jnp

    from prime_rl_tpu.configs import MeshConfig, TrainerConfig
    from prime_rl_tpu.models.base import debug_spec
    from prime_rl_tpu.parallel.mesh import build_mesh
    from prime_rl_tpu.trainer import step as step_lib
    from prime_rl_tpu.trainer.optim import make_optimizer
    from prime_rl_tpu.trainer.rl.data import FakeDataLoader
    from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step

    cfg = TrainerConfig()
    cfg.model.lm_head_chunk_size = 0
    spec = debug_spec(num_layers=2)
    mesh_info = build_mesh(MeshConfig(fsdp=1), jax.devices()[:1])
    opt, _ = make_optimizer(cfg.optimizer, cfg.scheduler, 1.0)
    state = init_train_state(spec, mesh_info, opt, offload_optimizer=True)
    # moment tensors (ndim >= 2) park on host; scalar counts stay on device
    mu_leaf = next(x for x in jax.tree.leaves(state.opt_state) if x.ndim >= 2)
    assert mu_leaf.sharding.memory_kind == "pinned_host"
    sos = jax.tree.map(lambda x: x.sharding, state)
    ts = make_train_step(spec, cfg.model, cfg.loss, opt, mesh_info, state_out_shardings=sos)
    batch, counts = FakeDataLoader(spec.vocab_size, 128, 2, 2).next_batch()
    batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
    state2, m = ts(state, batch, Scales(jnp.float32(max(counts["rl"], 1)), jnp.float32(1), jnp.float32(1)))
    mu2 = next(x for x in jax.tree.leaves(state2.opt_state) if x.ndim >= 2)
    assert mu2.sharding.memory_kind == "pinned_host"
    assert float(m["grad_norm"]) > 0


@requires_tpu
def test_fused_decode_attention_parity():
    """ops/decode_attention.decode_paged_attention (fused append + score,
    windows, sinks) vs the scatter + gathered-XLA oracle."""
    from prime_rl_tpu.sampler.model import _decode_attention_xla, _write_tokens
    from prime_rl_tpu.ops.decode_attention import decode_paged_attention

    S, NH, NKV, HD, NP, PS, P = 8, 4, 2, 128, 80, 64, 8
    ks = jax.random.split(jax.random.key(1), 6)
    q = jax.random.normal(ks[0], (S, NH, HD), jnp.bfloat16)
    k_new = jax.random.normal(ks[1], (S, NKV, HD), jnp.bfloat16)
    v_new = jax.random.normal(ks[2], (S, NKV, HD), jnp.bfloat16)
    k_pages = jax.random.normal(ks[3], (NKV, NP, PS, HD), jnp.bfloat16)
    v_pages = jax.random.normal(ks[4], (NKV, NP, PS, HD), jnp.bfloat16)
    # lengths BEFORE the new token; spans page boundaries and multi-block
    lengths = jnp.array([4, 63, 64, 100, 127, 200, 299, 0], jnp.int32)
    page_table = (jax.random.permutation(ks[5], NP - 1)[: S * P] + 1).reshape(S, P).astype(jnp.int32)
    sinks = jax.random.normal(jax.random.key(7), (NH,), jnp.float32)

    def oracle(window=0, use_sinks=False):
        flat = (jnp.take_along_axis(page_table, (lengths // PS)[:, None], 1)[:, 0]
                * PS + lengths % PS)
        k2 = _write_tokens(k_pages, k_new.transpose(1, 0, 2), flat)
        v2 = _write_tokens(v_pages, v_new.transpose(1, 0, 2), flat)
        o = _decode_attention_xla(q, k2, v2, lengths + 1, page_table,
                                  window=window, sinks=sinks if use_sinks else None)
        return o, k2, v2

    for window, use_sinks in ((0, False), (96, False), (0, True), (128, True)):
        o_ref, k_ref, v_ref = oracle(window, use_sinks)
        o, k2, v2 = decode_paged_attention(
            q, k_new, v_new, k_pages, v_pages, lengths, page_table,
            window=window, sinks=sinks if use_sinks else None)
        np.testing.assert_allclose(
            np.asarray(o, np.float32), np.asarray(o_ref, np.float32),
            atol=6e-3, rtol=6e-3, err_msg=f"window={window} sinks={use_sinks}")
        np.testing.assert_array_equal(np.asarray(k2), np.asarray(k_ref))
        np.testing.assert_array_equal(np.asarray(v2), np.asarray(v_ref))
        # the oracle consumed the donated pools' values; rebuild for next case
        k_pages = k2
        v_pages = v2
