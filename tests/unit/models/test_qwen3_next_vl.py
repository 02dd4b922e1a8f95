"""qwen3_next_vl (reference qwen3_5: GatedDeltaNet hybrid + vision tower):
mm forward sanity, conversion roundtrip, engine-vs-training greedy parity
with an image prompt (vision prefill + hybrid recurrent decode + mRoPE
pos_delta continuation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import get_family
from prime_rl_tpu.models.base import get_spec
from prime_rl_tpu.models.vision import (
    prep_image_slots,
    prep_mrope_position_ids,
    prep_patch_metadata,
)

SPEC = get_spec("debug_qwen3_next_vl")
IMG, VID, VSTART = SPEC.image_token_id, SPEC.video_token_id, SPEC.vision_start_token_id


@pytest.fixture(scope="module")
def params():
    fam = get_family(SPEC)
    return jax.tree.map(lambda x: x * 2.0, fam.init(SPEC, jax.random.PRNGKey(0)))


def make_mm_prompt(grids, seed=0):
    rng = np.random.default_rng(seed)
    vspec = SPEC.vision
    ids = list(rng.integers(3, 200, size=5))
    for t, h, w in grids:
        n = t * (h // vspec.spatial_merge_size) * (w // vspec.spatial_merge_size)
        ids += [VSTART] + [IMG] * n
    ids += list(rng.integers(3, 200, size=4))
    grid = np.asarray(grids, np.int64)
    p = int(grid.prod(axis=1).sum())
    pixels = rng.standard_normal((p, vspec.patch_dim)).astype(np.float32)
    return ids, {"pixel_values": pixels, "image_grid_thw": grid}


def training_forward(params, ids, mm_raw):
    fam = get_family(SPEC)
    vspec = SPEC.vision
    ids_np = np.asarray(ids, np.int32)
    grid = mm_raw["image_grid_thw"]
    meta = prep_patch_metadata(grid, vspec)
    mpos = prep_mrope_position_ids(ids_np, grid, vspec.spatial_merge_size, IMG, VID)
    mm = {
        "patches": jnp.asarray(mm_raw["pixel_values"]),
        "vis_seg_ids": jnp.asarray(meta["seg_ids"]),
        "vis_pos_idx": jnp.asarray(meta["pos_idx"]),
        "vis_pos_w": jnp.asarray(meta["pos_w"]),
        "vis_rope_coords": jnp.asarray(meta["rope_coords"]),
        "img_slot": jnp.asarray(prep_image_slots(ids_np, IMG, VID))[None],
        "mm_position_ids": jnp.asarray(mpos)[:, None, :],
    }
    length = len(ids)
    return fam.forward(
        params, SPEC, jnp.asarray(ids_np)[None], jnp.ones((1, length), jnp.int32),
        jnp.arange(length, dtype=jnp.int32)[None], compute_dtype=jnp.float32,
        attn_impl="xla", remat="none", mm=mm,
    )


def test_mm_forward_finite_and_image_dependent(params):
    ids, mm = make_mm_prompt([(1, 4, 4)])
    h = training_forward(params, ids, mm)
    assert bool(jnp.all(jnp.isfinite(h)))
    mm2 = dict(mm, pixel_values=mm["pixel_values"] + 1.0)
    h2 = training_forward(params, ids, mm2)
    assert float(jnp.max(jnp.abs(h - h2))) > 1e-4  # pixels reach the logits


def test_conversion_roundtrip(params):
    fam = get_family(SPEC)
    back = fam.from_hf(fam.to_hf(params, SPEC), SPEC)
    flat_b = {jax.tree_util.keystr(p): v
              for p, v in jax.tree_util.tree_leaves_with_path(back)}
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = jax.tree_util.keystr(path)
        np.testing.assert_allclose(np.asarray(leaf), np.asarray(flat_b[key]),
                                   err_msg=key, rtol=1e-6, atol=1e-6)


def test_engine_greedy_matches_training_forward(params):
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine, SamplingParams

    fam = get_family(SPEC)
    cache_cfg = CacheConfig(num_pages=64, page_size=16, max_slots=2, max_seq_len=256)
    engine = Engine(params, SPEC, cache_cfg, compute_dtype=jnp.float32)

    prompt, mm = make_mm_prompt([(1, 4, 4)], seed=5)
    # oracle greedy rollout through the training forward (mm prep per step)
    ids = list(prompt)
    want = []
    for _ in range(5):
        h = training_forward(params, ids, mm)
        tok = int(jnp.argmax(h[0, -1] @ fam.get_lm_head(params, SPEC)))
        want.append(tok)
        ids.append(tok)
    got = engine.generate([prompt],
                          SamplingParams(max_tokens=5, temperature=0.0,
                                         ignore_eos=True),
                          mm=[mm])[0]
    assert got.token_ids == want
