"""Mamba-2 SSD op: parity vs HF Mamba2Mixer (torch CPU), packed-segment
resets, gradient sanity (reference: nemotron_h Triton
_mamba_chunk_scan_combined behavior)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

jnp = pytest.importorskip("jax.numpy")
import jax

from prime_rl_tpu.ops.mamba import causal_conv1d, mamba2_mixer, ssd_chunked

H, P, G, N, D_MODEL, K = 4, 16, 2, 8, 32, 4
INTER = H * P


def make_hf_mixer():
    torch = pytest.importorskip("torch")
    from transformers.models.mamba2.configuration_mamba2 import Mamba2Config
    from transformers.models.mamba2.modeling_mamba2 import Mamba2Mixer

    cfg = Mamba2Config(
        hidden_size=D_MODEL, expand=2, head_dim=P, num_heads=H, n_groups=G,
        state_size=N, conv_kernel=K, chunk_size=8, use_conv_bias=True,
        use_bias=False, time_step_limit=(0.0, float("inf")),
    )
    torch.manual_seed(0)
    mixer = Mamba2Mixer(cfg, layer_idx=0).eval()
    # randomize (defaults init some params to constants)
    gen = torch.Generator().manual_seed(1)
    sd = mixer.state_dict()
    for k, v in sd.items():
        if k in ("A_log", "dt_bias", "D"):
            sd[k] = torch.rand(v.shape, generator=gen) * 0.5 + 0.2
        elif v.dtype.is_floating_point:
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
    mixer.load_state_dict(sd)
    return mixer


def lp_from_hf(mixer):
    sd = {k: v.detach().float().numpy() for k, v in mixer.state_dict().items()}
    return {
        "in_proj": sd["in_proj.weight"].T,
        "in_proj_bias": sd.get("in_proj.bias"),
        "conv_w": sd["conv1d.weight"][:, 0, :],  # [conv_dim, K]
        "conv_b": sd.get("conv1d.bias"),
        "A_log": sd["A_log"],
        "D": sd["D"],
        "dt_bias": sd["dt_bias"],
        "ssm_norm": sd["norm.weight"],
        "out_proj": sd["out_proj.weight"].T,
    }


def run_ours(lp, x, seg=None):
    return np.asarray(mamba2_mixer(
        jnp.asarray(x), {k: (None if v is None else jnp.asarray(v)) for k, v in lp.items()},
        num_heads=H, head_dim=P, ssm_state_size=N, n_groups=G, chunk_size=8,
        segment_ids=None if seg is None else jnp.asarray(seg),
    ))


def test_mixer_parity_vs_hf():
    torch = pytest.importorskip("torch")
    mixer = make_hf_mixer()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 24, D_MODEL)).astype(np.float32) * 0.5
    with torch.no_grad():
        want = mixer.torch_forward(torch.tensor(x), None, None, None).numpy()
    got = run_ours(lp_from_hf(mixer), x)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_packed_equals_unpacked():
    """Two sequences packed into one row produce the same outputs as
    running them separately: conv taps AND ssm state reset at boundaries."""
    torch = pytest.importorskip("torch")
    mixer = make_hf_mixer()
    lp = lp_from_hf(mixer)
    rng = np.random.default_rng(1)
    a = rng.normal(size=(1, 11, D_MODEL)).astype(np.float32) * 0.5
    b = rng.normal(size=(1, 13, D_MODEL)).astype(np.float32) * 0.5
    packed = np.concatenate([a, b], axis=1)
    seg = np.concatenate([np.full((1, 11), 1), np.full((1, 13), 2)], axis=1).astype(np.int32)
    got = run_ours(lp, packed, seg)
    want_a = run_ours(lp, a, np.ones((1, 11), np.int32))
    want_b = run_ours(lp, b, np.ones((1, 13), np.int32))
    np.testing.assert_allclose(got[0, :11], want_a[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(got[0, 11:], want_b[0], rtol=1e-4, atol=1e-4)


def test_conv_segment_masking():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 10, 6)).astype(np.float32)
    w = rng.normal(size=(6, 4)).astype(np.float32)
    seg = np.asarray([[1, 1, 1, 2, 2, 2, 2, 3, 3, 3]], np.int32)
    out = np.asarray(causal_conv1d(jnp.asarray(x), jnp.asarray(w), None, jnp.asarray(seg)))
    # first position of segment 2 must only see its own tap
    np.testing.assert_allclose(out[0, 3], x[0, 3] * w[:, 3], rtol=1e-5)


def test_ssd_gradients_finite():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 16, H, P)).astype(np.float32))
    dt = jnp.asarray(rng.uniform(0.1, 1.0, size=(1, 16, H)).astype(np.float32))
    a_log = jnp.asarray(rng.uniform(0.2, 0.7, size=(H,)).astype(np.float32))
    b_in = jnp.asarray(rng.normal(size=(1, 16, G, N)).astype(np.float32))
    c_in = jnp.asarray(rng.normal(size=(1, 16, G, N)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(H,)).astype(np.float32))
    seg = jnp.asarray(np.concatenate([np.full((1, 7), 1), np.full((1, 9), 2)], axis=1))

    def loss(x, b_in, c_in, a_log):
        return jnp.sum(jnp.sin(ssd_chunked(x, dt, a_log, b_in, c_in, d,
                                           chunk_size=8, segment_ids=seg)))

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, b_in, c_in, a_log)
    for gr in grads:
        assert np.isfinite(np.asarray(gr)).all()
