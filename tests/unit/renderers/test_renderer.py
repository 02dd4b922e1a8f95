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


def test_template_families_extension_property():
    """Every hand-coded family: incremental rendering (continuation_ids around
    verbatim sampled spans) reconstructs exactly the full render — the
    invariant importance ratios depend on (reference: docs/algorithms.md
    renderers section)."""
    from prime_rl_tpu.renderers.renderer import TEMPLATE_FAMILIES, TemplateRenderer
    from prime_rl_tpu.renderers.tokenizer import ByteTokenizer

    for family, spec in TEMPLATE_FAMILIES.items():
        r = TemplateRenderer(spec, ByteTokenizer())
        msgs1 = [{"role": "system", "content": "be good"},
                 {"role": "user", "content": "hi"}]
        prompt = r.render_ids(msgs1, add_generation_prompt=True)
        completion_text = "hello there"
        completion = r.tokenizer.encode(completion_text) + r.tokenizer.encode(
            r.spec.turn_suffix("assistant"))
        msgs2 = msgs1 + [{"role": "assistant", "content": completion_text},
                         {"role": "user", "content": "more"}]
        glue = r.continuation_ids([{"role": "user", "content": "more"}],
                                  add_generation_prompt=True,
                                  after_completion=True, completion_terminated=True)
        incremental = prompt + completion + glue
        full = r.render_ids(msgs2, add_generation_prompt=True)
        assert incremental == full, family


def test_template_parse_think_and_tools():
    from prime_rl_tpu.renderers.renderer import create_renderer
    from prime_rl_tpu.renderers.tokenizer import ByteTokenizer

    r = create_renderer(ByteTokenizer(), "llama3")
    text = ('<think>let me think</think>I will call a tool'
            '<tool_call>{"name": "add", "arguments": {"a": 1}}</tool_call>')
    msg = r.parse_response(r.tokenizer.encode(text))
    assert msg["reasoning_content"] == "let me think"
    assert msg["content"] == "I will call a tool"
    assert msg["tool_calls"][0]["function"]["name"] == "add"


def test_auto_family_detection():
    from prime_rl_tpu.renderers.renderer import detect_family

    class Tok:
        name_or_path = ""

    for name, fam in (("Qwen/Qwen3-0.6B", "chatml"),
                      ("meta-llama/Llama-3.1-8B", "llama3"),
                      ("zai-org/GLM-4.5-Air", "glm4"),
                      ("openai/gpt-oss-20b", "gpt_oss"),
                      ("deepseek-ai/DeepSeek-V3", "deepseek3"),
                      ("moonshotai/Kimi-K2", "kimi_k2")):
        t = Tok()
        t.name_or_path = name
        assert detect_family(t) == fam, name
