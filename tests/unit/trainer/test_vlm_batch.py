"""VLM data-plane wiring: TrainingSample.mm_kwargs → prepare_batch mm streams
→ jitted train step. Covers the multi-sample offset bookkeeping (vision
segment bases, merged-buffer slot bases), text/VLM mixing (sequential mRoPE
default), and vision-gradient flow through the step (reference: the
end-to-end VLM path trajectories.py mm_kwargs → trainer/batch.py collation →
qwen3_5 model forward)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.configs import MeshConfig, TrainerConfig
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.models.vision import VisionSpec
from prime_rl_tpu.parallel.mesh import build_mesh
from prime_rl_tpu.trainer import step as step_lib
from prime_rl_tpu.trainer.batch import prepare_batch, token_counts
from prime_rl_tpu.trainer.optim import make_optimizer
from prime_rl_tpu.trainer.step import Scales, init_train_state, make_train_step
from prime_rl_tpu.transport.types import TrainingSample

IMG, VID, VSTART = 250, 251, 249


@pytest.fixture(scope="module")
def spec():
    return debug_spec(
        vocab_size=256,
        family="qwen3_vl",
        qk_norm=True,
        mrope_section=(4, 2, 2),
        image_token_id=IMG,
        video_token_id=VID,
        vision_start_token_id=VSTART,
        vision=VisionSpec(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=64, num_position_embeddings=16,
            deepstack_visual_indexes=(0,),
        ),
    )


def vlm_sample(spec, grids, n_text=6, seed=0):
    rng = np.random.default_rng(seed)
    vspec = spec.vision
    ids = list(rng.integers(3, 200, size=n_text))
    for t, h, w in grids:
        n = t * (h // vspec.spatial_merge_size) * (w // vspec.spatial_merge_size)
        ids += [VSTART] + [IMG] * n
    ids += list(rng.integers(3, 200, size=4))
    L = len(ids)
    grid = np.asarray(grids, np.int64)
    P = int(grid.prod(axis=1).sum())
    return TrainingSample(
        token_ids=np.asarray(ids, np.int32),
        mask=np.ones(L, bool),
        logprobs=rng.standard_normal(L).astype(np.float32),
        temperatures=np.ones(L, np.float32),
        advantages=np.ones(L, np.float32),
        mm_kwargs={
            "pixel_values": rng.standard_normal((P, vspec.patch_dim)).astype(np.float32),
            "image_grid_thw": grid,
        },
    )


def text_sample(n, seed=1):
    rng = np.random.default_rng(seed)
    return TrainingSample(
        token_ids=rng.integers(3, 200, size=n).astype(np.int32),
        mask=np.ones(n, bool),
        logprobs=rng.standard_normal(n).astype(np.float32),
        temperatures=np.ones(n, np.float32),
        advantages=np.ones(n, np.float32),
    )


def test_prepare_batch_mm_streams(spec):
    samples = [vlm_sample(spec, [(1, 4, 4)]), text_sample(10), text_sample(7, seed=2)]
    batch = prepare_batch(samples, seq_len=64, micro_batch_rows=2,
                          num_micro_batches=2, vlm_spec=spec)
    N, B, L = batch.input_ids.shape
    assert (N, B, L) == (2, 2, 64)
    assert batch.mm_patches.shape == (2, 256, spec.vision.patch_dim)
    assert batch.mm_position_ids.shape == (2, 3, 2, 64)
    assert batch.mm_img_slot.shape == (2, 2, 64)
    # text positions are sequential and equal across the three mrope dims
    for n in range(N):
        for b in range(B):
            seg = batch.segment_ids[n, b]
            ids = batch.input_ids[n, b]
            text = (seg > 0) & (ids != IMG) & (ids != VID)
            pos = batch.mm_position_ids[n, :, b]
            assert (pos[0][text] == pos[1][text]).all()
            assert (pos[1][text] == pos[2][text]).all()


def test_packed_vlm_parity_with_direct_forward(spec):
    """Two VLM samples packed in one row: the packed mm path must reproduce
    each sample's standalone forward (exercises seg/slot base offsets)."""
    from prime_rl_tpu.models.qwen3_vl import forward, init_params
    from prime_rl_tpu.models.vision import (
        prep_image_slots, prep_mrope_position_ids, prep_patch_metadata,
    )

    s1 = vlm_sample(spec, [(1, 4, 4)], seed=3)
    s2 = vlm_sample(spec, [(2, 2, 2)], n_text=3, seed=4)
    params = init_params(spec, jax.random.key(0))
    L = len(s1) + len(s2)
    batch = prepare_batch([s1, s2], seq_len=L, micro_batch_rows=1,
                          num_micro_batches=1, vlm_spec=spec)
    mb = jax.tree.map(lambda x: x[0], batch)
    packed = forward(
        params, spec, jnp.asarray(mb.input_ids), jnp.asarray(mb.segment_ids),
        jnp.asarray(mb.position_ids), compute_dtype=jnp.float32,
        attn_impl="xla", remat="none",
        mm={
            "patches": jnp.asarray(mb.mm_patches),
            "vis_seg_ids": jnp.asarray(mb.mm_vis_seg_ids),
            "vis_pos_idx": jnp.asarray(mb.mm_vis_pos_idx),
            "vis_pos_w": jnp.asarray(mb.mm_vis_pos_w),
            "vis_rope_coords": jnp.asarray(mb.mm_vis_rope_coords),
            "img_slot": jnp.asarray(mb.mm_img_slot),
            "mm_position_ids": jnp.asarray(mb.mm_position_ids),
        },
    )
    packed = np.asarray(packed)[0]

    # order in the packed row follows pack_rows (longest first)
    order = sorted([s1, s2], key=len, reverse=True)
    cursor = 0
    for s in order:
        grid = s.mm_kwargs["image_grid_thw"]
        meta = prep_patch_metadata(grid, spec.vision)
        n = len(s)
        solo = forward(
            params, spec, jnp.asarray(s.token_ids)[None],
            jnp.ones((1, n), jnp.int32), jnp.arange(n, dtype=jnp.int32)[None],
            compute_dtype=jnp.float32, attn_impl="xla", remat="none",
            mm={
                "patches": jnp.asarray(s.mm_kwargs["pixel_values"]),
                "vis_seg_ids": jnp.asarray(meta["seg_ids"]),
                "vis_pos_idx": jnp.asarray(meta["pos_idx"]),
                "vis_pos_w": jnp.asarray(meta["pos_w"]),
                "vis_rope_coords": jnp.asarray(meta["rope_coords"]),
                "img_slot": jnp.asarray(prep_image_slots(
                    s.token_ids, spec.image_token_id, spec.video_token_id))[None],
                "mm_position_ids": jnp.asarray(prep_mrope_position_ids(
                    s.token_ids, grid, spec.vision.spatial_merge_size,
                    spec.image_token_id, spec.video_token_id))[:, None, :],
            },
        )
        np.testing.assert_allclose(
            packed[cursor:cursor + n], np.asarray(solo)[0], rtol=2e-4, atol=2e-4)
        cursor += n


def test_vlm_train_step(spec):
    """One jitted step on a 2-device mesh: finite loss, vision params move."""
    cfg = TrainerConfig()
    cfg.model.attn.impl = "xla"
    cfg.model.lm_head_chunk_size = 64
    mesh_info = build_mesh(MeshConfig(replica=2, fsdp=2, context=1, tensor=2))
    optimizer, _ = make_optimizer(cfg.optimizer, cfg.scheduler, cfg.grad_clip)
    state = init_train_state(spec, mesh_info, optimizer, seed=0)
    train_step = make_train_step(spec, cfg.model, cfg.loss, optimizer, mesh_info)

    samples = [vlm_sample(spec, [(1, 4, 4)]), text_sample(12)]
    batch = prepare_batch(samples, seq_len=48, micro_batch_rows=2,
                          num_micro_batches=1, vlm_spec=spec)
    counts = token_counts(batch)
    batch = step_lib.put_batch(jax.tree.map(jnp.asarray, batch), mesh_info)
    scales = Scales(rl=jnp.float32(counts["rl"]), ce=jnp.float32(1.0),
                    ref_kl=jnp.float32(1.0))
    before = np.asarray(state.params["vision"]["patch_w"])
    state2, metrics = train_step(state, batch, scales)
    assert np.isfinite(float(metrics["loss"]))
    assert not np.allclose(before, np.asarray(state2.params["vision"]["patch_w"]))
