"""VLM serving path: engine prefill with vision tower + mRoPE + DeepStack
must reproduce the training-path forward token-for-token — prompt
logprobs, greedy decode continuation (pos_delta mRoPE offset), and
text-prompt regression on a VLM engine (reference role: vLLM multimodal
serving for the qwen3_5 families)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavy parity suite: full run covers it

from prime_rl_tpu.models import qwen3_vl
from prime_rl_tpu.models.base import debug_spec
from prime_rl_tpu.models.vision import (
    VisionSpec,
    prep_image_slots,
    prep_mrope_position_ids,
    prep_patch_metadata,
)
from prime_rl_tpu.sampler.cache import CacheConfig
from prime_rl_tpu.sampler.engine import Engine, SamplingParams

IMG, VID, VSTART = 250, 251, 249


@pytest.fixture(scope="module")
def setup():
    spec = debug_spec(
        vocab_size=256, num_layers=3, family="qwen3_vl", qk_norm=True,
        mrope_section=(4, 2, 2), image_token_id=IMG, video_token_id=VID,
        vision_start_token_id=VSTART, tie_embeddings=False,
        vision=VisionSpec(
            depth=2, hidden_size=32, intermediate_size=64, num_heads=4,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=64,
            num_position_embeddings=16, deepstack_visual_indexes=(0,),
        ),
    )
    params = qwen3_vl.init_params(spec, jax.random.key(0))
    params = jax.tree.map(lambda x: x * 2.0, params)
    cache_cfg = CacheConfig(num_pages=64, page_size=16, max_slots=4, max_seq_len=256)
    engine = Engine(params, spec, cache_cfg, compute_dtype=jnp.float32)
    return spec, params, engine


def make_mm_prompt(spec, grids, seed=0):
    rng = np.random.default_rng(seed)
    vspec = spec.vision
    ids = list(rng.integers(3, 200, size=5))
    for t, h, w in grids:
        n = t * (h // vspec.spatial_merge_size) * (w // vspec.spatial_merge_size)
        ids += [VSTART] + [IMG] * n
    ids += list(rng.integers(3, 200, size=4))
    grid = np.asarray(grids, np.int64)
    P = int(grid.prod(axis=1).sum())
    pixels = rng.standard_normal((P, vspec.patch_dim)).astype(np.float32)
    return ids, {"pixel_values": pixels, "image_grid_thw": grid}


def training_logprobs(params, spec, ids, mm_raw):
    """Oracle: training-path forward over the whole sequence, full mm prep."""
    vspec = spec.vision
    ids_np = np.asarray(ids, np.int32)
    grid = mm_raw["image_grid_thw"]
    meta = prep_patch_metadata(grid, vspec)
    mpos = prep_mrope_position_ids(ids_np, grid, vspec.spatial_merge_size,
                                   spec.image_token_id, spec.video_token_id)
    mm = {
        "patches": jnp.asarray(mm_raw["pixel_values"]),
        "vis_seg_ids": jnp.asarray(meta["seg_ids"]),
        "vis_pos_idx": jnp.asarray(meta["pos_idx"]),
        "vis_pos_w": jnp.asarray(meta["pos_w"]),
        "vis_rope_coords": jnp.asarray(meta["rope_coords"]),
        "img_slot": jnp.asarray(prep_image_slots(
            ids_np, spec.image_token_id, spec.video_token_id))[None],
        "mm_position_ids": jnp.asarray(mpos)[:, None, :],
    }
    L = len(ids)
    h = qwen3_vl.forward(
        params, spec, jnp.asarray(ids_np)[None], jnp.ones((1, L), jnp.int32),
        jnp.arange(L, dtype=jnp.int32)[None], compute_dtype=jnp.float32,
        attn_impl="xla", remat="none", mm=mm,
    )
    logits = h[0] @ params["lm_head"].astype(h.dtype)
    return np.asarray(jax.nn.log_softmax(logits, axis=-1))  # [L, V]


def test_vlm_prefill_prompt_logprobs_parity(setup):
    spec, params, engine = setup
    ids, mm = make_mm_prompt(spec, [(1, 4, 4)])
    sp = SamplingParams(max_tokens=0, temperature=1.0, prompt_logprobs=True)
    res = engine.generate([ids], [sp], mm=[mm])[0]
    lp_oracle = training_logprobs(params, spec, ids, mm)
    got = np.asarray(res.prompt_logprobs)
    want = np.array([lp_oracle[i - 1, ids[i]] for i in range(1, len(ids))])
    np.testing.assert_allclose(got[1:], want, rtol=2e-3, atol=2e-3)


def test_vlm_greedy_decode_matches_oracle(setup):
    """Greedy continuation: decode runs with the mRoPE pos_delta; the oracle
    re-runs the training forward over the growing sequence."""
    spec, params, engine = setup
    ids, mm = make_mm_prompt(spec, [(2, 2, 2)], seed=1)
    n_gen = 6
    sp = SamplingParams(max_tokens=n_gen, temperature=0.0, ignore_eos=True)
    res = engine.generate([ids], [sp], mm=[mm])[0]
    assert len(res.token_ids) == n_gen

    cur = list(ids)
    for step in range(n_gen):
        lp = training_logprobs(params, spec, cur, mm)
        want_tok = int(np.argmax(lp[len(cur) - 1]))
        assert res.token_ids[step] == want_tok, f"step {step}"
        cur.append(want_tok)


def test_text_prompt_on_vlm_engine(setup):
    """No images: the engine must behave as a plain text model (plain rope,
    pos_delta 0) — and mixing text + vlm requests in one batch works."""
    spec, params, engine = setup
    text_ids = list(range(3, 20))
    vlm_ids, _vlm_mm = make_mm_prompt(spec, [(1, 4, 4)], seed=2)
    sp = SamplingParams(max_tokens=4, temperature=0.0, ignore_eos=True)
    f1 = engine.submit(text_ids, sp)
    f2 = engine.submit(vlm_ids, sp, mm=_vlm_mm)
    engine.run_until_idle()
    r1, r2 = f1.result(), f2.result()
    assert len(r1.token_ids) == 4 and len(r2.token_ids) == 4
    assert r1.finish_reason == "length"


def test_mm_rejected_on_text_family():
    from prime_rl_tpu.models import qwen3

    spec = debug_spec(num_layers=1, vocab_size=64)
    params = qwen3.init_params(spec, jax.random.key(0))
    engine = Engine(params, spec,
                    CacheConfig(num_pages=16, page_size=16, max_slots=2, max_seq_len=128),
                    compute_dtype=jnp.float32)
    fut = engine.submit([1, 2, 3], SamplingParams(max_tokens=2),
                        mm={"pixel_values": np.zeros((4, 96), np.float32),
                            "image_grid_thw": np.asarray([[1, 2, 2]])})
    engine.run_until_idle()
    with pytest.raises(Exception, match="multimodal"):
        fut.result()
