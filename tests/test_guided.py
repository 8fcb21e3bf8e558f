"""Guided (grammar-constrained) decoding (serving/guided.py + paged engine).

The regex subset's acceptance is pinned against Python ``re`` on random
strings; engine-level tests assert the hard guarantee: a guided request's
decoded output fully matches the pattern when it stops on eos, and is a
valid prefix when cut by max_tokens — for greedy and seeded-sampled rows,
without perturbing plain batchmates. Beyond-reference serving extension.
"""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from grasp_tpu.configs import GraspConfig, ModelConfig
from grasp_tpu.core.engine import GraspEngine
from grasp_tpu.data.tokenizer import ByteTokenizer
from grasp_tpu.models import init_params
from grasp_tpu.serving import ServingEngine
from grasp_tpu.serving.guided import (
    CompiledGrammar,
    _dfa_of,
    json_regex,
    token_bytes_of,
)

PS = 8


@pytest.fixture(scope="module")
def compressed():
    # vocab 300 so ByteTokenizer (bytes 0-255 + bos/eos/pad) fits
    config = ModelConfig.tiny(num_hidden_layers=3, vocab_size=300)
    engine = GraspEngine(init_params(jax.random.PRNGKey(0), config), config)
    rng = np.random.default_rng(7)
    batches = [{
        "input_ids": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
        "labels": jnp.asarray(rng.integers(0, config.vocab_size, (1, 16))),
    }]
    engine.run(batches, GraspConfig(num_prune_layers=1, compression_ratio=0.4))
    return config, engine.params, engine.plan


def _engine(compressed, **kw):
    config, params, plan = compressed
    kw.setdefault("num_pages", 32)
    kw.setdefault("page_size", PS)
    kw.setdefault("max_batch", 2)
    kw.setdefault("max_pages_per_seq", 8)
    kw.setdefault("tokenizer", ByteTokenizer(config.vocab_size))
    kw.setdefault("eos_token_id", 257)
    return ServingEngine(params, config, plan, **kw)


def _accepts(trans, acc, start, data: bytes):
    s = start
    for b in data:
        s = trans[s, b]
        if s < 0:
            return False
    return bool(acc[s])


# ---------------------------------------------------------------------------
# grammar layer: acceptance pinned against Python re
# ---------------------------------------------------------------------------

PATTERNS = [
    r"abc", r"a*b+c?", r"(ab|cd)+", r"[a-f0-9]{2,4}", r"\d+\.\d{2}",
    r"-?(0|[1-9][0-9]*)", r'"([^"\\]|\\.)*"', r"a.c", r"(foo|ba[rz]){1,3}",
    r"\w+@\w+\.(com|org)", r"x{3}", r"[^a-z]+", r"[\x41-\x43]+", r"\x61b",
]


def test_dfa_matches_python_re():
    import re

    rng = np.random.default_rng(0)
    alphabet = b'abcdefgh019."\\@xyzABCforBZ -'
    for pat in PATTERNS:
        trans, acc, start = _dfa_of(pat)
        cre = re.compile(pat)
        for _ in range(300):
            s = bytes(rng.choice(list(alphabet),
                                 size=rng.integers(0, 9)).tolist())
            want = cre.fullmatch(s.decode("latin1")) is not None
            assert _accepts(trans, acc, start, s) == want, (pat, s)


def test_json_grammar():
    trans, acc, start = _dfa_of(json_regex(2))
    for s in ['{"a": 1, "b": [true, null, "x\\n"]}', '[1, 2.5e3, {"k": "v"}]',
              '"hi"', "-0.5", "true", "{}", "[]", '{"a": {"b": 1}}']:
        json.loads(s)  # sanity: the positive cases are real JSON
        assert _accepts(trans, acc, start, s.encode()), s
    for s in ['{', '{"a" 1}', "tru", "01", '["a",]', '"\\q"',
              '{"a": {"b": {"c": 1}}}']:  # depth 3 > bound 2
        assert not _accepts(trans, acc, start, s.encode()), s


def test_dead_state_pruning_and_empty_pattern():
    # after 'a', only 'b' can still reach acceptance — 'x' must be pruned
    trans, acc, start = _dfa_of(r"ab")
    s = trans[start, ord("a")]
    assert s >= 0 and trans[s, ord("x")] == -1 and trans[s, ord("b")] >= 0
    with pytest.raises(ValueError, match="matches nothing"):
        _dfa_of(r"a[^\x00-\xff]b")  # the empty class makes it unsatisfiable


def test_token_lift_byte_tokenizer():
    tb = token_bytes_of(ByteTokenizer(300), 300)
    g = CompiledGrammar(r"(yes|no)", tb)
    s = g.start
    assert g.allowed[s, ord("y")] and g.allowed[s, ord("n")]
    assert not g.allowed[s, ord("x")]
    s2 = g.token_trans[s, ord("y")]
    assert g.allowed[s2, ord("e")] and not g.allowed[s2, ord("o")]
    # after "yes": accepting, no continuation allowed
    s3 = g.token_trans[g.token_trans[s2, ord("e")], ord("s")]
    assert g.accepting[s3] and not g.allowed[s3].any()


# ---------------------------------------------------------------------------
# engine level: outputs obey the grammar
# ---------------------------------------------------------------------------

def _prompt(config, rng, n):
    return rng.integers(1, 256, size=(n,)).astype(np.int32)


def test_guided_greedy_bounded_pattern(compressed, rng):
    """A bounded pattern forces eos at the end: the output fully matches."""
    config, params, plan = compressed
    tok = ByteTokenizer(config.vocab_size)
    srv = _engine(compressed)
    rid = srv.submit(_prompt(config, rng, 6), 16, guided_regex=r"(yes|no)")
    while srv.has_work():
        srv.step()
    done = {r.rid: r for r in srv.collect_requests()}
    text = tok.decode(done[rid].out)
    assert text in ("yes", "no")
    assert done[rid].finish == "eos"


def test_guided_sampled_fullmatch(compressed, rng):
    import re

    config, params, plan = compressed
    tok = ByteTokenizer(config.vocab_size)
    pat = r"[ab]{3}[0-9]"
    srv = _engine(compressed)
    r1 = srv.submit(_prompt(config, rng, 5), 16, temperature=1.0, seed=11,
                    guided_regex=pat)
    out1 = srv.run()[r1]
    assert re.fullmatch(pat, tok.decode(out1))


def test_guided_seeded_determinism(compressed, rng):
    config, params, plan = compressed
    prompt = _prompt(config, rng, 5)
    pat = r"[ab]{3}[0-9]"
    outs = []
    for _ in range(2):
        srv = _engine(compressed)
        rid = srv.submit(prompt, 16, temperature=1.0, seed=11, guided_regex=pat)
        outs.append(srv.run()[rid])
    assert outs[0] == outs[1]


def test_guided_json_object(compressed, rng):
    """response-format JSON: the emitted text parses whenever eos fired."""
    config, params, plan = compressed
    tok = ByteTokenizer(config.vocab_size)
    # bounded JSON so the grammar forces termination within max_new
    pat = r'\{"k": [0-9]\}'
    srv = _engine(compressed)
    rid = srv.submit(_prompt(config, rng, 4), 24, guided_regex=pat,
                     temperature=0.9, seed=3)
    while srv.has_work():
        srv.step()
    done = {r.rid: r for r in srv.collect_requests()}
    obj = json.loads(tok.decode(done[rid].out))
    assert set(obj) == {"k"} and 0 <= obj["k"] <= 9


def test_guided_prefix_valid_when_length_capped(compressed, rng):
    config, params, plan = compressed
    tok = ByteTokenizer(config.vocab_size)
    pat = r"[0-9]{10}"
    srv = _engine(compressed)
    rid = srv.submit(_prompt(config, rng, 4), 4, guided_regex=pat)  # cut early
    out = srv.run()[rid]
    assert len(out) == 4
    assert all(48 <= t <= 57 for t in out)  # digits: a valid prefix


def test_guided_plain_batchmate_unchanged(compressed, rng):
    config, params, plan = compressed
    p_plain = _prompt(config, rng, 7)
    solo = _engine(compressed)
    r = solo.submit(p_plain, 6, temperature=0.9, top_k=8, seed=3)
    want = solo.run()[r]

    srv = _engine(compressed)
    r1 = srv.submit(p_plain, 6, temperature=0.9, top_k=8, seed=3)
    r2 = srv.submit(_prompt(config, rng, 5), 8, guided_regex=r"(yes|no)")
    got = srv.run()
    assert got[r1] == want


def test_guided_validation(compressed):
    config, params, plan = compressed
    no_tok = ServingEngine(params, config, plan, num_pages=16, page_size=PS,
                           max_batch=2, max_pages_per_seq=4, eos_token_id=257)
    with pytest.raises(ValueError, match="tokenizer"):
        no_tok.submit([1, 2], 4, guided_regex=r"a+")
    no_eos = ServingEngine(params, config, plan, num_pages=16, page_size=PS,
                           max_batch=2, max_pages_per_seq=4,
                           tokenizer=ByteTokenizer(config.vocab_size))
    with pytest.raises(ValueError, match="eos"):
        no_eos.submit([1, 2], 4, guided_regex=r"a+")
    srv = _engine(compressed)
    with pytest.raises(ValueError):
        srv.submit([1, 2], 4, guided_regex=r"(((")

    from grasp_tpu.serving.spec_paged import SpeculativeServingEngine

    spec = SpeculativeServingEngine(params, config, params, config, plan=plan,
                                    draft_plan=plan, num_pages=16, page_size=PS,
                                    max_batch=2, max_pages_per_seq=4)
    with pytest.raises(ValueError, match="guided_regex"):
        spec.submit([1, 2], 4, guided_regex=r"a+")


# ---------------------------------------------------------------------------
# JSON-Schema-constrained decoding (schema -> regex -> the same DFA stack)
# ---------------------------------------------------------------------------

def test_schema_regex_semantics():
    """schema_regex compiles a schema subset to a pattern whose acceptance
    (checked via BOTH Python re and our DFA) enforces required properties,
    declaration order, item enums, integer-vs-number, and min/maxItems."""
    import re

    from grasp_tpu.serving.guided import schema_regex

    def accepts(pat, s):
        trans, acc, start = _dfa_of(pat)
        st = start
        for b in s.encode():
            st = trans[st, b]
            if st < 0:
                return False
        return bool(acc[st])

    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"enum": ["a", "b", "c"]},
                     "maxItems": 3},
            "active": {"type": "boolean"},
        },
        "required": ["name", "age"],
    }
    pat = schema_regex(schema)
    cre = re.compile(pat)
    good = ['{"name": "bob", "age": 3}',
            '{"name": "x", "age": 0, "tags": ["a", "c"], "active": true}',
            '{"name": "x", "age": 12, "tags": []}']
    bad = ['{"age": 3}', '{}', '{"age": 3, "name": "bob"}',
           '{"name": "bob", "age": 3.5}',
           '{"name": "bob", "age": 3, "tags": ["z"]}',
           '{"name": "bob", "age": 3, "extra": 1}']
    for s in good:
        json.loads(s)
        assert cre.fullmatch(s) and accepts(pat, s), s
    for s in bad:
        assert not cre.fullmatch(s) and not accepts(pat, s), s

    # nested objects, minItems, anyOf/const/pattern, unsupported -> error
    p2 = schema_regex({"type": "object", "properties": {
        "m": {"type": "object", "properties": {"k": {"type": "number"}}},
        "v": {"type": "array", "items": {"type": "number"}, "minItems": 2}},
        "required": []})
    for s in ['{}', '{"m": {"k": -1.5e2}}', '{"m": {"k": 1}, "v": [0, 1]}']:
        assert accepts(p2, s), s
    assert not accepts(p2, '{"v": [1]}')
    p3 = schema_regex({"anyOf": [{"type": "null"}, {"const": "hi"},
                                 {"type": "string", "pattern": "[a-c]{2}"}]})
    for s, ok in [("null", True), ('"hi"', True), ('"ab"', True),
                  ('"abc"', False), ("true", False)]:
        assert accepts(p3, s) == ok, s
    with pytest.raises(ValueError):
        schema_regex({"type": "object", "properties": {"a": {"type": "string"}},
                      "required": ["b"]})
    with pytest.raises(ValueError):
        schema_regex({"type": "frobnicate"})


def test_schema_guided_generation(compressed, rng):
    """End-to-end: a schema-constrained request emits JSON that parses AND
    conforms (required keys present, types right) whenever eos fired."""
    from grasp_tpu.serving.guided import schema_regex

    config, params, plan = compressed
    tok = ByteTokenizer(config.vocab_size)
    schema = {"type": "object",
              "properties": {"n": {"type": "integer"},
                             "ok": {"type": "boolean"}},
              "required": ["n", "ok"]}
    srv = _engine(compressed)
    rid = srv.submit(_prompt(config, rng, 4), 48, temperature=0.8, seed=6,
                     guided_regex=schema_regex(schema))
    while srv.has_work():
        srv.step()
    done = {r.rid: r for r in srv.collect_requests()}
    req = done[rid]
    if req.finish == "eos":  # bounded-integer grammar: extremely likely
        obj = json.loads(tok.decode(req.out))
        assert set(obj) == {"n", "ok"}
        assert isinstance(obj["n"], int) and isinstance(obj["ok"], bool)
    else:  # length-capped: still a valid prefix of the grammar
        assert req.gstate >= 0
