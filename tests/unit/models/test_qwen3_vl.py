"""Qwen3-VL family: HF logits parity (vision tower + mRoPE + DeepStack end to
end), host-prep parity vs HF get_rope_index, conversion roundtrip, sharding
coverage (reference VLM composition: trainer/models/qwen3_5/modeling_qwen3_5.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models.base import ModelSpec, param_pspec, spec_from_hf_config
from prime_rl_tpu.models.qwen3_vl import (
    forward,
    init_params,
    params_from_hf_state_dict,
    params_to_hf_state_dict,
)
from prime_rl_tpu.models.vision import (
    VisionSpec,
    prep_image_slots,
    prep_mrope_position_ids,
    prep_patch_metadata,
)

IMAGE_TOKEN, VIDEO_TOKEN, VSTART = 250, 251, 249


def tiny_hf_config():
    from transformers.models.qwen3_vl import Qwen3VLConfig

    return Qwen3VLConfig(
        text_config=dict(
            vocab_size=256, hidden_size=64, intermediate_size=128,
            num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rms_norm_eps=1e-6, rope_theta=1e6, tie_word_embeddings=False,
            max_position_embeddings=512, attention_bias=False,
            rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            depth=4, hidden_size=32, intermediate_size=64, num_heads=4,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=64, num_position_embeddings=16,
            deepstack_visual_indexes=[1, 2], hidden_act="gelu_pytorch_tanh",
            initializer_range=0.02,
        ),
        image_token_id=IMAGE_TOKEN, video_token_id=VIDEO_TOKEN,
        vision_start_token_id=VSTART, tie_word_embeddings=False,
    )


@pytest.fixture(scope="module")
def hf_model():
    import torch
    from transformers.models.qwen3_vl import Qwen3VLForConditionalGeneration

    torch.manual_seed(0)
    model = Qwen3VLForConditionalGeneration(tiny_hf_config()).eval().float()
    return model


@pytest.fixture(scope="module")
def spec(hf_model) -> ModelSpec:
    return spec_from_hf_config(hf_model.config.to_dict() | {
        "architectures": ["Qwen3VLForConditionalGeneration"]})


@pytest.fixture(scope="module")
def params(hf_model, spec):
    state = {k: v.numpy() for k, v in hf_model.state_dict().items()}
    return params_from_hf_state_dict(state, spec)


def make_inputs(spec, grids, seed=0):
    """One packed [1, L] sample with one vision block per grid."""
    rng = np.random.default_rng(seed)
    vspec = spec.vision
    ids = list(rng.integers(3, 200, size=4))
    for t, h, w in grids:
        n = t * (h // vspec.spatial_merge_size) * (w // vspec.spatial_merge_size)
        ids += [VSTART] + [IMAGE_TOKEN] * n
    ids += list(rng.integers(3, 200, size=5))
    ids = np.asarray(ids, np.int32)
    grid_thw = np.asarray(grids, np.int64)
    P = int(grid_thw.prod(axis=1).sum())
    pixels = rng.standard_normal((P, vspec.patch_dim)).astype(np.float32)
    return ids, grid_thw, pixels


def build_mm(spec, ids, grid_thw, pixels, pad_patches=None):
    vspec = spec.vision
    meta = prep_patch_metadata(grid_thw, vspec, pad_to=pad_patches)
    P = meta["seg_ids"].shape[0]
    if P > pixels.shape[0]:
        pixels = np.pad(pixels, ((0, P - pixels.shape[0]), (0, 0)))
    mpos = prep_mrope_position_ids(
        ids, grid_thw, vspec.spatial_merge_size, spec.image_token_id,
        spec.video_token_id)
    slots = prep_image_slots(ids, spec.image_token_id, spec.video_token_id)
    return {
        "patches": jnp.asarray(pixels),
        "vis_seg_ids": jnp.asarray(meta["seg_ids"]),
        "vis_pos_idx": jnp.asarray(meta["pos_idx"]),
        "vis_pos_w": jnp.asarray(meta["pos_w"]),
        "vis_rope_coords": jnp.asarray(meta["rope_coords"]),
        "img_slot": jnp.asarray(slots)[None],
        "mm_position_ids": jnp.asarray(mpos)[:, None, :],
    }


def our_logits(params, spec, ids, mm):
    L = len(ids)
    h = forward(
        params, spec, jnp.asarray(ids)[None],
        jnp.ones((1, L), jnp.int32), jnp.arange(L, dtype=jnp.int32)[None],
        compute_dtype=jnp.float32, attn_impl="xla", remat="none", mm=mm,
    )
    head = params["lm_head"] if not spec.tie_embeddings else params["embed"].T
    return np.asarray(h @ head.astype(h.dtype))[0]


def hf_logits(hf_model, ids, grid_thw, pixels):
    import torch

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids, dtype=torch.long)[None],
            pixel_values=torch.tensor(pixels),
            image_grid_thw=torch.tensor(grid_thw),
        )
    return out.logits[0].numpy()


def test_mrope_position_ids_match_hf(hf_model, spec):
    import torch

    ids, grid_thw, _ = make_inputs(spec, [(1, 4, 4), (2, 2, 2)])
    ours = prep_mrope_position_ids(
        ids, grid_thw, spec.vision.spatial_merge_size,
        spec.image_token_id, spec.video_token_id)
    theirs, _ = hf_model.model.get_rope_index(
        torch.tensor(ids, dtype=torch.long)[None],
        image_grid_thw=torch.tensor(grid_thw),
    )
    np.testing.assert_array_equal(ours, theirs[:, 0].numpy())


def test_logits_parity_single_image(hf_model, spec, params):
    ids, grid_thw, pixels = make_inputs(spec, [(1, 4, 4)])
    ours = our_logits(params, spec, ids, build_mm(spec, ids, grid_thw, pixels))
    theirs = hf_logits(hf_model, ids, grid_thw, pixels)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_logits_parity_multi_image_padded(hf_model, spec, params):
    """Two images (one multi-frame), patch buffer padded past the real count."""
    ids, grid_thw, pixels = make_inputs(spec, [(1, 4, 4), (2, 2, 2)], seed=1)
    mm = build_mm(spec, ids, grid_thw, pixels, pad_patches=64)
    ours = our_logits(params, spec, ids, mm)
    theirs = hf_logits(hf_model, ids, grid_thw, pixels)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-3)


def test_text_only_forward_plain_rope(params, spec):
    """mm=None must behave as a plain qwen3 text model (no NaNs, right shape)."""
    ids = np.arange(1, 9, dtype=np.int32)[None]
    h = forward(params, spec, jnp.asarray(ids), jnp.ones_like(ids),
                jnp.arange(8, dtype=jnp.int32)[None],
                compute_dtype=jnp.float32, attn_impl="xla", remat="none")
    assert h.shape == (1, 8, spec.hidden_size)
    assert np.isfinite(np.asarray(h)).all()


def test_conversion_roundtrip(params, spec):
    state = params_to_hf_state_dict(params, spec)
    assert "model.visual.patch_embed.proj.weight" in state
    assert "model.language_model.layers.0.self_attn.q_proj.weight" in state
    back = params_from_hf_state_dict(state, spec)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(back)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   err_msg=str(pa))


def test_sharding_rules_cover_all_params(spec):
    from prime_rl_tpu.models.base import _iter_paths

    p = init_params(spec, jax.random.key(0))
    for path, _ in _iter_paths(p):
        param_pspec(path)  # raises KeyError on a missing rule


def test_gradients_flow_to_vision(params, spec):
    ids, grid_thw, pixels = make_inputs(spec, [(1, 4, 4)])
    mm = build_mm(spec, ids, grid_thw, pixels)

    def loss(p):
        h = forward(p, spec, jnp.asarray(ids)[None],
                    jnp.ones((1, len(ids)), jnp.int32),
                    jnp.arange(len(ids), dtype=jnp.int32)[None],
                    compute_dtype=jnp.float32, attn_impl="xla", remat="full", mm=mm)
        return jnp.sum(h**2)

    g = jax.grad(loss)(params)
    for leaf_path in (("vision", "patch_w"), ("vision", "pos_embed")):
        leaf = g
        for k in leaf_path:
            leaf = leaf[k]
        assert float(jnp.abs(leaf).sum()) > 0, leaf_path
    assert float(jnp.abs(g["vision"]["blocks"]["qkv_w"]).sum()) > 0
    assert float(jnp.abs(g["vision"]["ds_mergers"]["fc1_w"]).sum()) > 0
