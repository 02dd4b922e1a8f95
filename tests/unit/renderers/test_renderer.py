"""Renderer extension property + trace building (reference: renderers dep
tests, docs/algorithms.md:516-543)."""

import pytest

from prime_rl_tpu.renderers.renderer import ChatMLRenderer, TraceBuilder, create_renderer
from prime_rl_tpu.renderers.tokenizer import ByteTokenizer


@pytest.fixture
def renderer():
    return ChatMLRenderer(ByteTokenizer())


def test_render_parse_roundtrip(renderer):
    msgs = [{"role": "user", "content": "hello"}]
    ids = renderer.render_ids(msgs, add_generation_prompt=True)
    tok = renderer.tokenizer
    text = tok.decode(ids, skip_special_tokens=False)
    assert text.endswith("<|im_start|>assistant\n")
    completion = tok.encode("hi there") + [tok.eos_token_id]
    msg = renderer.parse_response(completion)
    assert msg == {"role": "assistant", "content": "hi there"}


def test_extension_property_terminated(renderer):
    """Incremental build == from-scratch render when completions terminate."""
    tok = renderer.tokenizer
    builder = TraceBuilder(renderer)
    builder.add_context([{"role": "user", "content": "Say cat"}])
    completion = tok.encode("cat") + [tok.eos_token_id]
    builder.add_completion(completion, [0.0] * len(completion), 1.0)
    builder.add_context([{"role": "user", "content": "again"}])
    want = renderer.render_ids(
        [
            {"role": "user", "content": "Say cat"},
            {"role": "assistant", "content": "cat"},
            {"role": "user", "content": "again"},
        ],
        add_generation_prompt=True,
    )
    assert builder.token_ids == want


def test_truncated_completion_gets_closed(renderer):
    tok = renderer.tokenizer
    builder = TraceBuilder(renderer)
    builder.add_context([{"role": "user", "content": "go"}])
    completion = tok.encode("unfinished")  # no eos: truncated by max_tokens
    builder.add_completion(completion, [0.0] * len(completion), 1.0)
    n = len(builder.token_ids)
    builder.add_context([{"role": "user", "content": "next"}])
    # glue inserted: im_end + newline before the next block
    assert builder.token_ids[n] == tok.eos_token_id
    assert not builder.sampled_mask[n]  # the glue is context, not sampled


def test_masks_and_streams_aligned(renderer):
    tok = renderer.tokenizer
    builder = TraceBuilder(renderer)
    p1 = builder.add_context([{"role": "user", "content": "x"}])
    c1 = tok.encode("y") + [tok.eos_token_id]
    builder.add_completion(c1, [-0.5] * len(c1), 0.7)
    trace = builder.to_trace(reward=1.0)
    assert len(trace.token_ids) == len(trace.sampled_mask) == len(trace.logprobs) == len(trace.temperatures)
    assert trace.num_sampled == len(c1)
    # sampled span carries its temperature; context is 1.0
    sampled_temps = [t for t, m in zip(trace.temperatures, trace.sampled_mask) if m]
    assert set(sampled_temps) == {0.7}


def test_bridge_prefix_check(renderer):
    msgs = [{"role": "user", "content": "a"}]
    ids = renderer.render_ids(msgs, add_generation_prompt=False)
    turn = renderer.bridge_to_next_turn(ids, msgs + [{"role": "user", "content": "b"}],
                                        add_generation_prompt=False)
    assert ids + turn.token_ids == renderer.render_ids(
        msgs + [{"role": "user", "content": "b"}], add_generation_prompt=False
    )
    with pytest.raises(ValueError):
        renderer.bridge_to_next_turn([9999], msgs, add_generation_prompt=False)


def test_create_renderer_registry():
    assert isinstance(create_renderer(family="qwen3"), ChatMLRenderer)
    with pytest.raises(ValueError):
        create_renderer(family="nope")
