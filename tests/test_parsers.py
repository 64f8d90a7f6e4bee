"""Reasoning parser + function-call detector tests
(mirrors the reference's reasoning_parser / function_call unit tests)."""

import json

import pytest

from iaas_sglang_tpu.function_call import FunctionCallParser
from iaas_sglang_tpu.reasoning_parser import ReasoningParser


def test_reasoning_non_stream():
    p = ReasoningParser("qwen3")
    r = p.parse_non_stream("<think>step 1 and 2</think>the answer is 4")
    assert r.reasoning_text == "step 1 and 2"
    assert r.normal_text == "the answer is 4"


def test_reasoning_forced_thinking():
    # DeepSeek-R1 templates start inside <think>
    p = ReasoningParser("deepseek-r1")
    r = p.parse_non_stream("chain of thought</think>final")
    assert r.reasoning_text == "chain of thought"
    assert r.normal_text == "final"


def test_reasoning_stream_split_tag():
    p = ReasoningParser("qwen3")
    reasoning, normal = "", ""
    # tag split across chunks
    for chunk in ["<thi", "nk>abc", " def</th", "ink>ghi", " jkl"]:
        r = p.parse_stream_chunk(chunk)
        reasoning += r.reasoning_text
        normal += r.normal_text
    assert reasoning == "abc def"
    assert normal == "ghi jkl"


def test_reasoning_stream_no_think():
    p = ReasoningParser("qwen3")
    out = "".join(p.parse_stream_chunk(c).normal_text for c in ["hel", "lo!"])
    assert out == "hello!"


def test_llama32_tool_call():
    p = FunctionCallParser("llama32")
    text = '<|python_tag|>{"name": "get_weather", "parameters": {"city": "Paris"}}'
    normal, calls = p.parse_non_stream(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Paris"}


def test_qwen25_tool_call():
    p = FunctionCallParser("qwen25")
    text = ('I will check.\n<tool_call>\n'
            '{"name": "search", "arguments": {"q": "tpu"}}\n</tool_call>')
    normal, calls = p.parse_non_stream(text)
    assert normal == "I will check."
    assert calls[0].name == "search"
    assert json.loads(calls[0].parameters) == {"q": "tpu"}


def test_mistral_tool_call():
    p = FunctionCallParser("mistral")
    text = '[TOOL_CALLS] [{"name": "add", "arguments": {"a": 1, "b": 2}}]'
    _, calls = p.parse_non_stream(text)
    assert calls[0].name == "add"
    assert json.loads(calls[0].parameters) == {"a": 1, "b": 2}


def test_pythonic_tool_call():
    p = FunctionCallParser("pythonic")
    text = '[get_weather(city="Oslo", days=3)]'
    _, calls = p.parse_non_stream(text)
    assert calls[0].name == "get_weather"
    assert json.loads(calls[0].parameters) == {"city": "Oslo", "days": 3}


def test_no_tool_call_passthrough():
    p = FunctionCallParser("qwen25")
    normal, calls = p.parse_non_stream("just a plain answer")
    assert normal == "just a plain answer" and calls == []


def test_file_connector_roundtrip(tmp_path):
    import numpy as np

    from iaas_sglang_tpu.connector import create_remote_connector

    conn = create_remote_connector(f"file://{tmp_path}/store")
    conn.set("kv/abc", b"hello")
    assert conn.get("kv/abc") == b"hello"
    assert conn.get("kv/missing") is None
    np.savez(f"{tmp_path}/store/w0.npz",
             **{"embed": np.ones((4, 4), np.float32)})
    names = dict(conn.weight_iterator())
    assert "embed" in names and names["embed"].shape == (4, 4)


def test_chat_template_registry_renders():
    """Named conversation templates (reference lang/chat_template.py)."""
    from iaas_sglang_tpu.conversation import (chat_template_names,
                                              get_chat_template)

    msgs = [{"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello"},
            {"role": "user", "content": "bye"}]
    for name in chat_template_names():
        out = get_chat_template(name).render(msgs)
        assert "hi" in out and "bye" in out
    chatml = get_chat_template("chatml").render(msgs)
    assert chatml.endswith("<|im_start|>assistant\n")
    assert "<|im_start|>system\nbe brief<|im_end|>" in chatml
    l3 = get_chat_template("llama-3").render(msgs[:2])
    assert l3.endswith("<|start_header_id|>assistant<|end_header_id|>\n\n")
    # default system injected when absent
    vic = get_chat_template("vicuna_v1.1").render(
        [{"role": "user", "content": "q"}])
    assert "curious user" in vic


def test_fim_completion_templates():
    """FIM registry semantics vs the reference code_completion_parser:
    middle-position (deepseek) and end-position (starcoder/qwen) layouts,
    JSON-file custom templates, and passthrough when inactive."""
    import json as _json

    from iaas_sglang_tpu import code_completion as cc

    cc.load_completion_template("deepseek_coder")
    assert cc.is_completion_template_defined()
    out = cc.apply_fim("PRE", "SUF")
    assert out == "<｜fim▁begin｜>PRE<｜fim▁hole｜>SUF<｜fim▁end｜>"

    cc.load_completion_template("qwen_coder")
    assert cc.apply_fim("PRE", "SUF") == \
        "<|fim_prefix|>PRE<|fim_suffix|>SUF<|fim_middle|>"

    # no suffix -> passthrough
    assert cc.apply_fim("PRE", None) == "PRE"
    assert cc.apply_fim("PRE", "") == "PRE"

    # custom template from a json file
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "tmpl.json")
        with open(path, "w") as f:
            _json.dump({"name": "custom", "fim_begin_token": "<B>",
                        "fim_middle_token": "<M>", "fim_end_token": "<E>",
                        "fim_position": "middle"}, f)
        cc.load_completion_template(path)
        assert cc.apply_fim("a", "b") == "<B>a<M>b<E>"

    try:
        cc.load_completion_template("nope")
        raise AssertionError("unknown template must raise")
    except ValueError:
        pass
    cc.load_completion_template(None)
    assert not cc.is_completion_template_defined()
