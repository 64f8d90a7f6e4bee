"""OpenAI-compatible protocol models
(analog of sglang srt/entrypoints/openai/protocol.py:30-350, trimmed to the
implemented surface: chat completions, completions, models)."""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, Dict, List, Optional, Union

from pydantic import BaseModel, Field


def structured_fields(response_format: Optional[Dict[str, Any]],
                      regex: Optional[str] = None,
                      ebnf: Optional[str] = None) -> dict:
    """Map the OpenAI `response_format` object (+ sglang's regex/ebnf
    extensions) onto internal sampling-param grammar fields (analog of
    reference entrypoints/openai/serving_chat.py response_format handling)."""
    out: Dict[str, Any] = {}
    if regex:
        out["regex"] = regex
    if ebnf:
        out["ebnf"] = ebnf
    if response_format:
        t = response_format.get("type")
        if t == "json_object":
            out["json_schema"] = '{"type": "object"}'
        elif t == "json_schema":
            js = response_format.get("json_schema") or {}
            out["json_schema"] = json.dumps(js.get("schema", js))
        elif t == "structural_tag":
            out["structural_tag"] = json.dumps({
                "structures": response_format.get("structures", []),
                "triggers": response_format.get("triggers", []),
            })
    return out


class UsageInfo(BaseModel):
    prompt_tokens: int = 0
    completion_tokens: int = 0
    total_tokens: int = 0


class FunctionSpec(BaseModel):
    name: str
    description: Optional[str] = None
    parameters: Optional[Dict[str, Any]] = None


class ToolSpec(BaseModel):
    type: str = "function"
    function: FunctionSpec


class FunctionCallOut(BaseModel):
    name: str
    arguments: str


class ToolCall(BaseModel):
    id: str
    type: str = "function"
    function: FunctionCallOut


class ChatMessage(BaseModel):
    role: str
    content: Optional[Union[str, List[Dict[str, Any]]]] = None
    reasoning_content: Optional[str] = None
    tool_calls: Optional[List[ToolCall]] = None


class ChatCompletionRequest(BaseModel):
    model: str = ""
    messages: List[ChatMessage]
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    max_tokens: Optional[int] = None
    max_completion_tokens: Optional[int] = None
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    logit_bias: Optional[Dict[str, float]] = None
    user: Optional[str] = None
    tools: Optional[List[ToolSpec]] = None
    tool_choice: Optional[Union[str, Dict[str, Any]]] = "auto"
    # extensions (mirror sglang's)
    top_k: int = -1
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    separate_reasoning: bool = False
    reasoning_style: str = "qwen3"
    tool_call_format: str = "qwen25"
    # structured output: OpenAI response_format (json_object / json_schema /
    # structural_tag) + sglang's raw regex/ebnf extensions
    response_format: Optional[Dict[str, Any]] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None

    def to_sampling_params(self) -> dict:
        return {
            "temperature": self.temperature,
            "top_p": self.top_p,
            "top_k": self.top_k,
            "min_p": self.min_p,
            "max_new_tokens": self.max_completion_tokens or self.max_tokens or 128,
            "stop": self.stop,
            "presence_penalty": self.presence_penalty,
            "frequency_penalty": self.frequency_penalty,
            "repetition_penalty": self.repetition_penalty,
            "ignore_eos": self.ignore_eos,
            "skip_special_tokens": self.skip_special_tokens,
            **structured_fields(self.response_format, self.regex, self.ebnf),
        }


class ChatCompletionResponseChoice(BaseModel):
    index: int
    message: ChatMessage
    finish_reason: Optional[str] = None


class ChatCompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{uuid.uuid4().hex}")
    object: str = "chat.completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionResponseChoice]
    usage: UsageInfo = Field(default_factory=UsageInfo)


class DeltaMessage(BaseModel):
    role: Optional[str] = None
    content: Optional[str] = None


class ChatCompletionStreamChoice(BaseModel):
    index: int
    delta: DeltaMessage
    finish_reason: Optional[str] = None


class ChatCompletionStreamResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"chatcmpl-{uuid.uuid4().hex}")
    object: str = "chat.completion.chunk"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[ChatCompletionStreamChoice]


class CompletionRequest(BaseModel):
    model: str = ""
    prompt: Union[str, List[str], List[int], List[List[int]]]
    max_tokens: int = 16
    temperature: float = 1.0
    top_p: float = 1.0
    n: int = 1
    stop: Optional[Union[str, List[str]]] = None
    stream: bool = False
    echo: bool = False
    # FIM: completion after `prompt` and before `suffix` (rewritten via
    # --completion-template; reference code_completion_parser.py)
    suffix: Optional[str] = None
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # extensions
    top_k: int = -1
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    ignore_eos: bool = False
    response_format: Optional[Dict[str, Any]] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    json_schema: Optional[str] = None

    def to_sampling_params(self) -> dict:
        out = {
            "temperature": self.temperature,
            "top_p": self.top_p,
            "top_k": self.top_k,
            "min_p": self.min_p,
            "max_new_tokens": self.max_tokens,
            "stop": self.stop,
            "presence_penalty": self.presence_penalty,
            "frequency_penalty": self.frequency_penalty,
            "repetition_penalty": self.repetition_penalty,
            "ignore_eos": self.ignore_eos,
            **structured_fields(self.response_format, self.regex, self.ebnf),
        }
        if self.json_schema:
            out["json_schema"] = self.json_schema
        return out


class CompletionResponseChoice(BaseModel):
    index: int
    text: str
    finish_reason: Optional[str] = None


class CompletionResponse(BaseModel):
    id: str = Field(default_factory=lambda: f"cmpl-{uuid.uuid4().hex}")
    object: str = "text_completion"
    created: int = Field(default_factory=lambda: int(time.time()))
    model: str = ""
    choices: List[CompletionResponseChoice]
    usage: UsageInfo = Field(default_factory=UsageInfo)


class ModelCard(BaseModel):
    id: str
    object: str = "model"
    created: int = Field(default_factory=lambda: int(time.time()))
    owned_by: str = "iaas-sglang-tpu"


class ModelList(BaseModel):
    object: str = "list"
    data: List[ModelCard]


def map_finish_reason(reason: Optional[dict]) -> Optional[str]:
    if reason is None:
        return None
    t = reason.get("type")
    if t == "length":
        return "length"
    if t == "abort":
        return "abort"
    return "stop"
