"""Tool/function-call detectors
(analog of sglang srt/function_call/function_call_parser.py:21 +
per-format detectors base_format_detector.py:89).

Formats:
    llama32   -- bare JSON {"name": ..., "parameters": {...}} (optionally
                 after `<|python_tag|>`), `;`-separated for parallel calls
    qwen25    -- <tool_call>{"name":..., "arguments":{...}}</tool_call>
    mistral   -- [TOOL_CALLS] [{"name":..., "arguments":{...}}, ...]
    pythonic  -- [foo(a=1, b="x"), bar()]
"""

from __future__ import annotations

import ast
import json
import re
from dataclasses import dataclass
from typing import List, Optional, Tuple


@dataclass
class ToolCallItem:
    name: str
    parameters: str    # JSON-encoded arguments
    tool_index: int = 0


def _json_args(obj: dict) -> str:
    args = obj.get("arguments", obj.get("parameters", {}))
    return json.dumps(args, ensure_ascii=False)


class BaseDetector:
    def has_tool_call(self, text: str) -> bool:
        raise NotImplementedError

    def detect_and_parse(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        """Returns (normal_text, calls)."""
        raise NotImplementedError


class Llama32Detector(BaseDetector):
    def has_tool_call(self, text: str) -> bool:
        return "<|python_tag|>" in text or text.lstrip().startswith('{"name"')

    def detect_and_parse(self, text: str):
        if "<|python_tag|>" in text:
            normal, _, payload = text.partition("<|python_tag|>")
        else:
            normal, payload = "", text
        calls: List[ToolCallItem] = []
        for i, piece in enumerate(payload.split(";")):
            piece = piece.strip()
            if not piece:
                continue
            try:
                obj = json.loads(piece)
                calls.append(ToolCallItem(
                    name=obj["name"], parameters=_json_args(obj), tool_index=i))
            except (json.JSONDecodeError, KeyError):
                normal += piece
        return normal.strip(), calls


class Qwen25Detector(BaseDetector):
    TAG = re.compile(r"<tool_call>\s*(.*?)\s*</tool_call>", re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return "<tool_call>" in text

    def detect_and_parse(self, text: str):
        calls = []
        for i, m in enumerate(self.TAG.finditer(text)):
            try:
                obj = json.loads(m.group(1))
                calls.append(ToolCallItem(
                    name=obj["name"], parameters=_json_args(obj), tool_index=i))
            except (json.JSONDecodeError, KeyError):
                pass
        normal = self.TAG.sub("", text).strip()
        return normal, calls


class MistralDetector(BaseDetector):
    MARK = "[TOOL_CALLS]"

    def has_tool_call(self, text: str) -> bool:
        return self.MARK in text

    def detect_and_parse(self, text: str):
        normal, _, payload = text.partition(self.MARK)
        calls = []
        try:
            arr = json.loads(payload.strip())
            for i, obj in enumerate(arr if isinstance(arr, list) else [arr]):
                calls.append(ToolCallItem(
                    name=obj["name"], parameters=_json_args(obj), tool_index=i))
        except (json.JSONDecodeError, KeyError):
            pass
        return normal.strip(), calls


class PythonicDetector(BaseDetector):
    PAT = re.compile(r"\[[A-Za-z_][\w.]*\(.*\)(?:\s*,\s*[A-Za-z_][\w.]*\(.*\))*\]",
                     re.DOTALL)

    def has_tool_call(self, text: str) -> bool:
        return bool(self.PAT.search(text))

    def detect_and_parse(self, text: str):
        m = self.PAT.search(text)
        if not m:
            return text, []
        calls = []
        try:
            tree = ast.parse(m.group(0), mode="eval")
            for i, call in enumerate(tree.body.elts):
                if not isinstance(call, ast.Call):
                    continue
                args = {
                    kw.arg: ast.literal_eval(kw.value) for kw in call.keywords
                }
                calls.append(ToolCallItem(
                    name=call.func.id if isinstance(call.func, ast.Name)
                    else ast.unparse(call.func),
                    parameters=json.dumps(args, ensure_ascii=False),
                    tool_index=i,
                ))
        except (SyntaxError, ValueError):
            return text, []
        normal = (text[: m.start()] + text[m.end():]).strip()
        return normal, calls


class FunctionCallParser:
    DETECTORS = {
        "llama3": Llama32Detector,
        "llama32": Llama32Detector,
        "qwen25": Qwen25Detector,
        "qwen": Qwen25Detector,
        "mistral": MistralDetector,
        "pythonic": PythonicDetector,
    }

    def __init__(self, format: str):
        if format not in self.DETECTORS:
            raise ValueError(
                f"unknown tool-call format {format!r}; "
                f"known: {sorted(self.DETECTORS)}")
        self.detector = self.DETECTORS[format]()

    def has_tool_call(self, text: str) -> bool:
        return self.detector.has_tool_call(text)

    def parse_non_stream(self, text: str) -> Tuple[str, List[ToolCallItem]]:
        if not self.detector.has_tool_call(text):
            return text, []
        return self.detector.detect_and_parse(text)
