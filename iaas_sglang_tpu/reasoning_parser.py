"""Reasoning-content parser: splits `<think>...</think>` blocks from model
output (analog of sglang srt/reasoning_parser.py:113-178 — DeepSeek-R1,
Qwen3, Kimi styles), with incremental streaming support."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple


@dataclass
class ParseResult:
    reasoning_text: str
    normal_text: str


class ReasoningParser:
    """think_start may already be emitted by the chat template
    (DeepSeek-R1 starts generations inside <think>)."""

    MARKS = {
        "deepseek-r1": ("<think>", "</think>", True),
        "qwen3": ("<think>", "</think>", False),
        "kimi": ("◁think▷", "◁/think▷", False),
    }

    def __init__(self, model_type: str = "deepseek-r1",
                 stream_reasoning: bool = True):
        key = model_type.lower()
        if key not in self.MARKS:
            raise ValueError(f"unknown reasoning style {model_type!r}")
        self.start_tag, self.end_tag, self.force_thinking = self.MARKS[key]
        self.stream_reasoning = stream_reasoning
        self._in_reasoning = self.force_thinking
        self._buffer = ""

    # ------------------------------------------------------------- one-shot

    def parse_non_stream(self, text: str) -> ParseResult:
        in_reasoning = self._in_reasoning or self.start_tag in text
        if not in_reasoning:
            return ParseResult("", text)
        text = text.replace(self.start_tag, "")
        if self.end_tag in text:
            reasoning, normal = text.split(self.end_tag, 1)
            return ParseResult(reasoning.strip(), normal.strip())
        return ParseResult(text.strip(), "")

    # ------------------------------------------------------------ streaming

    def parse_stream_chunk(self, delta: str) -> ParseResult:
        """Feed an incremental delta; returns the reasoning/normal parts that
        became definite with this chunk."""
        self._buffer += delta
        buf = self._buffer

        if not self._in_reasoning:
            if self.start_tag in buf:
                pre, rest = buf.split(self.start_tag, 1)
                self._in_reasoning = True
                self._buffer = rest
                more = self.parse_stream_chunk("")
                return ParseResult(more.reasoning_text, pre + more.normal_text)
            if self._could_be_tag_prefix(buf, self.start_tag):
                return ParseResult("", "")
            self._buffer = ""
            return ParseResult("", buf)

        if self.end_tag in buf:
            reasoning, rest = buf.split(self.end_tag, 1)
            self._in_reasoning = False
            self._buffer = ""
            return ParseResult(reasoning if self.stream_reasoning else reasoning,
                               rest)
        if self._could_be_tag_prefix(buf, self.end_tag):
            return ParseResult("", "")
        self._buffer = ""
        return ParseResult(buf if self.stream_reasoning else "", "")

    @staticmethod
    def _could_be_tag_prefix(buf: str, tag: str) -> bool:
        """Tail of buf might be the start of tag (hold it back)."""
        for i in range(1, len(tag)):
            if buf.endswith(tag[:i]):
                return True
        return False
