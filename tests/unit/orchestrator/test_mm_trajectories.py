"""Multimodal rollout plumbing: Trace.mm_kwargs -> TrainingSample.mm_kwargs
-> packed VLM micro-batch, plus robustness against image-placeholder ids the
policy SAMPLED (which have no pixels behind them and must remain plain text
— reference contract: trajectories.py:35-66 mm_kwargs; HF processors only
insert placeholders for provided images)."""

import numpy as np

from prime_rl_tpu.envs.types import Episode, Trace
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.models.vision import prep_image_slots, prep_mrope_position_ids
from prime_rl_tpu.orchestrator.trajectories import episode_to_samples
from prime_rl_tpu.trainer.batch import prepare_batch


def _mm(n_patches=16, patch_dim=96):
    return {"pixel_values": np.random.default_rng(0).standard_normal(
        (n_patches, patch_dim)).astype(np.float32),
        "image_grid_thw": np.asarray([[1, 4, 4]], np.int64)}


def _trace(ids, mm=None):
    n = len(ids)
    return Trace(token_ids=list(ids), sampled_mask=[False] * (n - 2) + [True] * 2,
                 logprobs=[0.0] * n, temperatures=[1.0] * n, reward=1.0,
                 mm_kwargs=mm)


def test_mm_kwargs_ride_trace_to_sample():
    spec = get_spec("debug_vlm")
    ids = [10, 11, 300] + [301] * 4 + [12, 13]
    ep = Episode(traces=[_trace(ids, _mm())], reward=1.0)
    samples = episode_to_samples(ep, "dominant_color")
    assert samples[0].mm_kwargs is not None
    assert samples[0].mm_kwargs["pixel_values"].shape == (16, 96)

    batch = prepare_batch(samples, seq_len=32, micro_batch_rows=1,
                          num_micro_batches=1, vlm_spec=spec, max_mm_patches=32)
    # 16 real patches in the padded buffer; the 4 image tokens got slots 0-3
    assert int((batch.mm_vis_seg_ids > 0).sum()) == 16
    slots = batch.mm_img_slot[batch.input_ids == 301]
    assert sorted(slots.tolist()) == [0, 1, 2, 3]
    # every non-vision position is -1 (no spurious injection)
    assert (batch.mm_img_slot[batch.input_ids != 301] == -1).all()


def test_sampled_image_tokens_stay_text():
    """A completion containing the image placeholder id (the random policy
    can sample it) must not consume a slot or blow up mRoPE prep."""
    ids = np.asarray([10, 300] + [301] * 4 + [12, 301, 301, 13], np.int32)
    grid = np.asarray([[1, 4, 4]], np.int64)
    slots = prep_image_slots(ids, 301, 302, max_slots=4)
    assert slots[2:6].tolist() == [0, 1, 2, 3]
    assert slots[7] == -1 and slots[8] == -1  # sampled placeholders: no slot
    pos = prep_mrope_position_ids(ids, grid, 2, 301, 302)
    assert pos.shape == (3, len(ids))
    # text resumes sequentially after the real vision block; the sampled
    # placeholders take ordinary text positions (all three dims equal)
    tail = pos[:, 6:]
    assert (tail[0] == tail[1]).all() and (tail[1] == tail[2]).all()
    assert (np.diff(tail[0]) == 1).all()


def test_text_only_sample_on_vlm_spec():
    spec = get_spec("debug_vlm")
    ep = Episode(traces=[_trace([5, 6, 7, 8])], reward=0.0)
    samples = episode_to_samples(ep, "x")
    assert samples[0].mm_kwargs is None
    batch = prepare_batch(samples, seq_len=16, micro_batch_rows=1,
                          num_micro_batches=1, vlm_spec=spec, max_mm_patches=8)
    assert (batch.mm_img_slot == -1).all()
    assert int((batch.mm_vis_seg_ids > 0).sum()) == 0
