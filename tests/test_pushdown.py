"""Pushdown (recursive) grammar engine — full-CFG constrained decoding
(VERDICT r1 item 3; reference capability: xgrammar_backend.py:45 compiles
recursive EBNF/JSON-schema). Covers: byte-level PDA acceptance on
recursive grammars at depths far beyond any regex expansion, the
schema->GBNF compiler for recursive $refs and unbounded any-values, the
token-mask suffix memoization, and end-to-end constrained generation."""

import json

import numpy as np
import pytest

from iaas_sglang_tpu.constrained.pushdown import PushdownAutomaton


def pda_match(grammar: str, text: str) -> bool:
    pda = PushdownAutomaton(grammar)
    cfg = pda.start_config
    for b in text.encode():
        cfg = pda.step_byte(cfg, b)
        if not cfg:
            return False
    return pda.accepts_eos(cfg)


BALANCED = 'root ::= "x" | "(" root ")"'


def test_pda_balanced_parens_deep():
    for depth in (0, 1, 3, 100):
        s = "(" * depth + "x" + ")" * depth
        assert pda_match(BALANCED, s), depth
    assert not pda_match(BALANCED, "((x)")
    assert not pda_match(BALANCED, "(x))")
    assert not pda_match(BALANCED, "")
    assert not pda_match(BALANCED, "(()")


def test_pda_json_value_grammar():
    from iaas_sglang_tpu.constrained.json_schema import (
        build_ebnf_from_schema,
    )

    g = build_ebnf_from_schema({})     # unconstrained value -> recursive
    deep = json.dumps(
        {"a": [{"b": [{"c": [1, 2, {"d": "x"}]}]}] * 2, "e": None},
        separators=(",", ":"))
    assert pda_match(g, deep)
    # depth 40 nesting — impossible for the old depth-2 regex expansion
    nested = "[" * 40 + "1" + "]" * 40
    assert pda_match(g, nested)
    assert pda_match(g, '"hi"')
    assert pda_match(g, "-12.5e3")
    assert not pda_match(g, "{")
    assert not pda_match(g, '{"a":}')
    assert not pda_match(g, "[1,]")


def test_pda_mixed_repetition():
    g = '''
root ::= item ("," item)*
item ::= "n" | "[" root "]"
'''
    assert pda_match(g, "n,n,[n,[n]],n")
    assert not pda_match(g, "n,,n")
    assert not pda_match(g, "[n")


def test_schema_to_ebnf_recursive_ref():
    from iaas_sglang_tpu.constrained.json_schema import (
        build_ebnf_from_schema,
    )

    schema = {
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"type": "integer"},
                    "kids": {"type": "array",
                             "items": {"$ref": "#/$defs/node"}},
                },
                "required": ["v", "kids"],
            }
        },
        "$ref": "#/$defs/node",
    }
    g = build_ebnf_from_schema(schema)
    ok = json.dumps(
        {"v": 1, "kids": [{"v": 2, "kids": []},
                          {"v": 3, "kids": [{"v": 4, "kids": []}]}]},
        separators=(",", ":"))
    assert pda_match(g, ok)
    assert not pda_match(g, '{"v":1}')
    assert not pda_match(g, '{"v":1,"kids":[{"v":2}]}')


def test_token_mask_suffix_memo(tmp_path_factory):
    """Masks computed at one nesting depth are reused at other depths
    with the same stack suffix — and stay correct for multi-pop tokens."""
    from transformers import AutoTokenizer

    from iaas_sglang_tpu.constrained.pushdown import (
        PushdownGrammar,
        PushdownTokenMask,
    )
    from iaas_sglang_tpu.constrained.token_fsm import TokenVocab
    from tests.server_utils import make_tiny_model_dir

    d = make_tiny_model_dir(str(tmp_path_factory.mktemp("m") / "tok"))
    tok = AutoTokenizer.from_pretrained(d)
    vocab = TokenVocab.get(tok)
    pda = PushdownAutomaton(BALANCED)
    index = PushdownTokenMask(pda, vocab)
    g = PushdownGrammar(index)

    def tid(text):
        ids = tok.encode(text, add_special_tokens=False)
        assert len(ids) == 1, (text, ids)
        return ids[0]

    # walk to depth 8, collecting masks
    masks = []
    for _ in range(8):
        m = g.allowed_tokens()
        masks.append(m.copy())
        assert m[tid("(")] and m[tid("x")]
        assert not m[tid(")")]
        g.accept_token(tid("("))
    # at depth >= 2 the suffix (one open frame) is identical -> same mask
    assert (masks[3] == masks[7]).all()
    g.accept_token(tid("x"))
    for _ in range(8):
        m = g.allowed_tokens()
        assert m[tid(")")] and not m[tid("(")] and not m[tid("x")]
        g.accept_token(tid(")"))
    assert g.is_terminated() or g.allowed_tokens()[
        vocab.eos_token_id]


@pytest.fixture(scope="module")
def text_engine(tmp_path_factory):
    from transformers import AutoTokenizer

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs
    from tests.server_utils import SERVER_TINY_LLAMA, make_tiny_model_dir

    d = make_tiny_model_dir(str(tmp_path_factory.mktemp("m") / "tok"))
    tok = AutoTokenizer.from_pretrained(d)
    sa = ServerArgs(
        model_path="test://tiny-tok", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, device="cpu",
        max_running_requests=8, max_prefill_tokens=128,
        chunked_prefill_size=64, random_seed=0, skip_tokenizer_init=True,
    )
    return Engine(sa, hf_config_override=SERVER_TINY_LLAMA, tokenizer=tok)


def _balanced(s: str) -> bool:
    depth = 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                return False
        elif c == "x":
            if i != len(s) - 1 - depth:
                pass
    return depth == 0


def test_recursive_ebnf_generation(text_engine):
    out = text_engine.generate(
        prompt="go: ",
        sampling_params={"max_new_tokens": 30, "temperature": 1.2,
                         "ebnf": BALANCED},
    )
    t = out["text"]
    assert t and _balanced(t) and t.replace("(", "").replace(
        ")", "") == "x", t


def test_bounded_array_commas():
    """Regression: {m,n} repetition on a GROUP must keep the group's full
    span — ("," item){0,1} once lost its comma to a clobbered atom-start
    offset, accepting [x x] and rejecting [x,x]."""
    from iaas_sglang_tpu.constrained.json_schema import (
        build_ebnf_from_schema,
    )

    g = build_ebnf_from_schema(
        {"type": "array", "maxItems": 3, "minItems": 1,
         "items": {"enum": [1, 2]}})
    assert pda_match(g, "[1,2,1]")
    assert pda_match(g, "[2]")
    assert not pda_match(g, "[1 2]")
    assert not pda_match(g, "[1,2,1,2]")
    assert not pda_match(g, "[]")
    assert not pda_match(g, "[12]")
    g2 = 'root ::= ("a" | "b" "c"){2,3}'
    assert pda_match(g2, "bcbca") and pda_match(g2, "aa")
    assert not pda_match(g2, "a") and not pda_match(g2, "aaaa")


def test_recursive_json_schema_generation(text_engine):
    schema = json.dumps({
        "$defs": {
            "node": {
                "type": "object",
                "properties": {
                    "v": {"enum": [1, 2]},
                    "kids": {"type": "array", "maxItems": 2,
                             "items": {"$ref": "#/$defs/node"}},
                },
                "required": ["v", "kids"],
            }
        },
        "$ref": "#/$defs/node",
    })
    out = text_engine.generate(
        prompt="tree: ",
        sampling_params={"max_new_tokens": 400, "temperature": 1.0,
                         "json_schema": schema},
    )
    try:
        parsed = json.loads(out["text"])
    except json.JSONDecodeError:
        # an unbounded-depth recursive schema can legitimately hit the
        # token budget mid-tree; the grammar guarantee is then that every
        # emitted byte is a valid PREFIX of the language
        fin = out["meta_info"]["finish_reason"] or {}
        assert fin.get("type") == "length", (fin, out["text"])
        from iaas_sglang_tpu.constrained.json_schema import (
            build_ebnf_from_schema,
        )

        g = build_ebnf_from_schema(json.loads(schema))
        pda = PushdownAutomaton(g)
        cfg = pda.start_config
        for b in out["text"].encode():
            cfg = pda.step_byte(cfg, b)
            assert cfg, out["text"]
        return

    def check(n):
        assert n["v"] in (1, 2)
        assert isinstance(n["kids"], list) and len(n["kids"]) <= 2
        for k in n["kids"]:
            check(k)

    check(parsed)
