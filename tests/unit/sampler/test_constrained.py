"""Constrained (guided) decoding: DFA compiler + in-jit token masking
(VERDICT r4 next-round #8; reference bar: the vLLM guided-decoding stack the
reference leans on via inference/patches.py).

Engine contract under test: a request with ``json_schema``/``regex`` set
produces output that PARSES under the schema, EOS fires only in accepting
states, and unconstrained traffic never compiles or runs the masked decode
program (zero throughput impact on the hot path)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prime_rl_tpu.sampler.constrain import (
    CompiledConstraint,
    build_token_tables,
    compile_regex,
    host_allowed_mask,
    json_schema_to_regex,
)


# -- compiler ----------------------------------------------------------------


def _accepts(dfa, s: str) -> bool:
    st = dfa.walk_bytes(0, s.encode())
    return st >= 0 and bool(dfa.accept[st])


def test_regex_basics():
    dfa = compile_regex(r"ab+c?")
    assert _accepts(dfa, "ab") and _accepts(dfa, "abbbc")
    assert not _accepts(dfa, "a") and not _accepts(dfa, "abcc")
    dfa = compile_regex(r"(?:foo|ba[rz]){2}")
    assert _accepts(dfa, "foobar") and _accepts(dfa, "bazbaz")
    assert not _accepts(dfa, "foo")
    dfa = compile_regex(r"[a-c]{1,3}")
    assert _accepts(dfa, "a") and _accepts(dfa, "abc")
    assert not _accepts(dfa, "abca") and not _accepts(dfa, "d")
    dfa = compile_regex(r"[^0-9]+")
    assert _accepts(dfa, "xy!") and not _accepts(dfa, "x1")


def test_schema_integer_and_number():
    for t, good, bad in [
        ("integer", ["0", "-7", "123"], ["01", "1.5", "x", "-"]),
        ("number", ["0", "-1.25", "2e10", "3.5E-2"], ["01", ".5", "1."]),
    ]:
        dfa = compile_regex(json_schema_to_regex({"type": t}))
        for g in good:
            assert _accepts(dfa, g), (t, g)
        for b in bad:
            assert not _accepts(dfa, b), (t, b)


def test_schema_object_roundtrip():
    schema = {
        "type": "object",
        "properties": {
            "op": {"enum": ["add", "del"]},
            "count": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"},
                     "maxItems": 2},
            "note": {"type": "string"},
        },
        "required": ["op", "count", "tags"],
    }
    dfa = compile_regex(json_schema_to_regex(schema))
    ok = json.dumps({"op": "add", "count": 3, "tags": ["a", "b"]})
    ok2 = json.dumps({"op": "del", "count": -1, "tags": [], "note": "hi"})
    assert _accepts(dfa, ok) and _accepts(dfa, ok2)
    assert not _accepts(dfa, json.dumps({"op": "mul", "count": 3, "tags": []}))
    assert not _accepts(dfa, json.dumps({"op": "add", "count": "3", "tags": []}))


def test_host_mask_semantics():
    token_bytes = [bytes([i]) for i in range(128)] + [b"true", b"null", b"x" * 40]
    chars, lens = build_token_tables(token_bytes)
    cc = CompiledConstraint.from_params({"type": "boolean"}, None)
    m = host_allowed_mask(cc.dfa, 0, chars, lens, eos_id=0)
    assert m[ord("t")] and m[ord("f")] and m[128]
    assert not m[ord("x")] and not m[130]  # >16-byte token never allowed
    st = cc.dfa.walk_bytes(0, b"true")
    m2 = host_allowed_mask(cc.dfa, st, chars, lens, eos_id=0)
    assert m2[0]  # accepting -> EOS allowed
    assert not m2[ord("t")]
    # dead end -> EOS force-allowed
    m3 = host_allowed_mask(cc.dfa, -1, chars, lens, eos_id=0)
    assert m3[0]


def test_regex_fuzz_against_python_re():
    """Property check: on a random sample of strings, the byte DFA accepts
    exactly the strings Python's `re.fullmatch` accepts, for a pile of
    patterns covering the supported grammar."""
    import re

    rng = np.random.default_rng(7)
    patterns = [
        r"abc", r"a*b+c?", r"(?:ab|cd)+", r"[a-f0-9]{2,4}", r"[^ab]c*",
        r"a.c", r"(?:x[yz]){1,3}w?", r"\d+\.\d{2}", r"\w+@\w+",
        r"-?(?:0|[1-9][0-9]*)", r"[ \t]{0,2}ok[ \t]{0,2}",
    ]
    alphabet = "abcdefxyz0123456789.@-\t w"
    for pat in patterns:
        dfa = compile_regex(pat)
        probes = {"", "a", "ab", "abc", "abcd"}
        for _ in range(120):
            n = int(rng.integers(0, 8))
            probes.add("".join(rng.choice(list(alphabet), n)))
        for s in probes:
            want = re.fullmatch(pat, s) is not None
            st = dfa.walk_bytes(0, s.encode())
            got = st >= 0 and bool(dfa.accept[st])
            assert got == want, (pat, s, got, want)


def test_string_pattern_anchors_stripped():
    """JSON-schema convention anchors (^...$) must not become literal bytes."""
    dfa = compile_regex(json_schema_to_regex(
        {"type": "string", "pattern": "^[a-z]{1,4}$"}))
    assert _accepts(dfa, '"abc"')
    assert not _accepts(dfa, '"^abc$"')


def test_optional_first_required_later_never_dangles_commas():
    """required properties are emitted first (objects are unordered), so an
    optional-first schema can't produce '{,\"b\":1}'."""
    schema = {"type": "object",
              "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
              "required": ["b"]}
    dfa = compile_regex(json_schema_to_regex(schema))
    assert _accepts(dfa, '{"b": 1}')
    assert _accepts(dfa, '{"b": 1, "a": 2}')
    assert not _accepts(dfa, '{,"b": 1}')
    assert not _accepts(dfa, '{"a": 2}')  # required b missing
    # all-optional object: any single property works, no dangling commas
    schema2 = {"type": "object", "required": [],
               "properties": {"x": {"type": "integer"}, "y": {"type": "boolean"}}}
    d2 = compile_regex(json_schema_to_regex(schema2))
    assert _accepts(d2, "{}") and _accepts(d2, '{"x": 1}')
    assert _accepts(d2, '{"y": true}') and _accepts(d2, '{"x": 1, "y": false}')
    assert not _accepts(d2, '{, "y": true}')


def test_json_object_regex_depth_bound():
    from prime_rl_tpu.sampler.constrain import json_object_regex

    dfa = compile_regex(json_object_regex())
    assert dfa.num_states < 2048
    for ok in ('{}', '{"a": 1}', '{"a": {"b": [1, "x", true]}}',
               '{ "k" : [1, 2.5, null], "m": {"n": "s"} }'):
        assert _accepts(dfa, ok), ok
    for bad in ('[1]', '{"a": }', '{"a": {"b": {"c": {"d": 1}}}}'):
        assert not _accepts(dfa, bad), bad


def test_schema_samples_roundtrip_fuzz():
    """Documents SAMPLED from the schema are accepted; simple type/enum
    mutations are rejected."""
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string", "pattern": "[a-z]{1,6}"},
            "n": {"type": "integer"},
            "ok": {"type": "boolean"},
            "mode": {"enum": ["fast", "slow", None]},
        },
        "required": ["name", "n", "ok", "mode"],
    }
    dfa = compile_regex(json_schema_to_regex(schema))
    rng = np.random.default_rng(3)
    for _ in range(40):
        doc = {
            "name": "".join(rng.choice(list("abcdef"), int(rng.integers(1, 6)))),
            "n": int(rng.integers(-100, 100)),
            "ok": bool(rng.integers(0, 2)),
            "mode": ["fast", "slow", None][int(rng.integers(0, 3))],
        }
        s = json.dumps(doc)
        st = dfa.walk_bytes(0, s.encode())
        assert st >= 0 and dfa.accept[st], s
        bad = json.dumps({**doc, "n": str(doc["n"])})  # wrong type
        stb = dfa.walk_bytes(0, bad.encode())
        assert stb < 0 or not dfa.accept[stb], bad
        bad2 = json.dumps({**doc, "mode": "medium"})  # not in enum
        stb2 = dfa.walk_bytes(0, bad2.encode())
        assert stb2 < 0 or not dfa.accept[stb2], bad2


# -- engine integration ------------------------------------------------------


@pytest.fixture(scope="module")
def engine():
    from prime_rl_tpu.models import qwen3
    from prime_rl_tpu.models.base import debug_spec
    from prime_rl_tpu.sampler.cache import CacheConfig
    from prime_rl_tpu.sampler.engine import Engine

    spec = debug_spec(num_layers=2, vocab_size=128)
    params = qwen3.init_params(spec, jax.random.key(0))
    params = jax.tree.map(lambda x: x * 3.0, params)
    cache_cfg = CacheConfig(num_pages=64, page_size=16, max_slots=4,
                            max_seq_len=256)
    token_bytes = [bytes([i]) if 9 <= i < 127 else b"" for i in range(128)]
    return Engine(params, spec, cache_cfg, compute_dtype=jnp.float32,
                  token_bytes=token_bytes, decode_block=4)


def _gen(engine, schema=None, regex=None, n=1, max_tokens=48, temperature=1.0):
    from prime_rl_tpu.sampler.engine import SamplingParams

    sp = SamplingParams(max_tokens=max_tokens, temperature=temperature,
                        json_schema=schema, regex=regex)
    prompts = [[5, 9, 23 + i, 47, 3] for i in range(n)]
    return engine.generate(prompts, sp)


def _text(engine, res) -> str:
    ids = [t for t in res.token_ids if t != engine.spec.eos_token_id]
    return bytes(ids).decode("utf-8", errors="replace")


@pytest.mark.slow
def test_constrained_boolean(engine):
    for res in _gen(engine, schema={"type": "boolean"}, n=3):
        assert _text(engine, res) in ("true", "false"), _text(engine, res)
        assert res.finish_reason == "stop"


@pytest.mark.slow
def test_constrained_json_object_parses(engine):
    schema = {
        "type": "object",
        "properties": {
            "op": {"enum": ["add", "del"]},
            "n": {"type": "integer"},
        },
        "required": ["op", "n"],
    }
    for res in _gen(engine, schema=schema, n=3, max_tokens=64):
        text = _text(engine, res)
        obj = json.loads(text)
        assert obj["op"] in ("add", "del") and isinstance(obj["n"], int), text


@pytest.mark.slow
def test_constrained_regex(engine):
    import re

    for res in _gen(engine, regex=r"[ab]{3}[0-9]", n=2):
        assert re.fullmatch(r"[ab]{3}[0-9]", _text(engine, res))


@pytest.mark.slow
def test_mixed_constrained_and_free(engine):
    """A constrained and an unconstrained request share one decode batch;
    the free request is NOT masked."""
    from prime_rl_tpu.sampler.engine import SamplingParams

    f1 = engine.submit([5, 9, 23], SamplingParams(
        max_tokens=24, temperature=1.0, json_schema={"type": "boolean"}))
    f2 = engine.submit([7, 11, 13], SamplingParams(
        max_tokens=24, temperature=0.0))
    engine.run_until_idle()
    r1, r2 = f1.result(), f2.result()
    assert _text(engine, r1) in ("true", "false")
    assert len(r2.token_ids) >= 1  # free request unaffected, ran to length/stop
    # bank row released after finish
    assert engine._cons_active == 0
    assert all(r == 0 for r in engine._cons_bank_refs)


@pytest.mark.slow
def test_unconstrained_path_never_compiles_masked_decode(engine):
    engine._decode_fns.clear()
    _gen(engine, n=2, max_tokens=8)
    assert all(not constrained for (_, constrained) in engine._decode_fns)


@pytest.mark.slow
def test_slot_reuse_clears_stale_constraint(engine):
    """Code-review regression: a constrained request finishing must not
    leave its DFA masking the NEXT (unconstrained) request in that slot
    while another constrained slot keeps the masked program live."""
    from prime_rl_tpu.sampler.engine import SamplingParams

    # long-running constrained request keeps use_cons True...
    f_long = engine.submit([5, 9, 23], SamplingParams(
        max_tokens=40, temperature=1.0, json_schema={
            "type": "array", "items": {"type": "integer"}, "minItems": 5}))
    # ...short constrained request finishes fast, freeing its slot
    f_short = engine.submit([7, 11], SamplingParams(
        max_tokens=24, temperature=1.0, json_schema={"type": "boolean"}))
    # give the short one time to finish, then admit an UNCONSTRAINED request
    # (likely reusing the freed slot)
    import time as _t

    deadline = _t.time() + 120
    while not f_short.done() and _t.time() < deadline:
        engine.step()
    free = [engine.submit([13 + i, 17], SamplingParams(
        max_tokens=12, temperature=0.0, ignore_eos=True)) for i in range(3)]
    engine.run_until_idle()
    f_long.result(timeout=60)
    _text(engine, f_short.result(timeout=60))
    for f in free:
        r = f.result(timeout=60)
        # unconstrained + ignore_eos must generate its full budget — a stale
        # mask would force EOS/boolean tokens instead
        assert len(r.token_ids) == 12, r.token_ids
    assert engine._cons_active == 0


@pytest.mark.slow
def test_bad_regex_rejects_without_killing_the_engine(engine):
    from prime_rl_tpu.sampler.engine import SamplingParams

    f_bad = engine.submit([5, 9], SamplingParams(max_tokens=8, regex="(unclosed"))
    f_ok = engine.submit([7, 11], SamplingParams(max_tokens=4, temperature=0.0))
    engine.run_until_idle()
    with pytest.raises(ValueError):
        f_bad.result(timeout=30)
    assert len(f_ok.result(timeout=30).token_ids) >= 1  # engine kept serving
