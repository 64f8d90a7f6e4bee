"""Named chat-template registry (analog of reference
python/sglang/lang/chat_template.py + srt/conversation.py).

The OpenAI chat endpoint prefers the tokenizer's own jinja template;
`--chat-template <name>` (or a tokenizer without one) selects a named
template here instead. Each template renders messages to a prompt string
with an open assistant turn.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


@dataclass
class ChatTemplate:
    name: str
    # role -> (prefix, suffix)
    roles: Dict[str, Tuple[str, str]]
    assistant_prefix: str
    system_default: str = ""
    stop: tuple = ()
    sep: str = ""

    def render(self, messages: List[dict]) -> str:
        out = []
        has_system = any(m.get("role") == "system" for m in messages)
        if self.system_default and not has_system:
            pre, suf = self.roles.get("system", ("", ""))
            out.append(pre + self.system_default + suf)
        for m in messages:
            role = m.get("role", "user")
            pre, suf = self.roles.get(role, self.roles["user"])
            out.append(pre + (m.get("content") or "") + suf)
        out.append(self.assistant_prefix)
        return self.sep.join(out)


_registry: Dict[str, ChatTemplate] = {}


def register_chat_template(t: ChatTemplate) -> None:
    _registry[t.name] = t


def get_chat_template(name: str) -> ChatTemplate:
    if name not in _registry:
        raise ValueError(
            f"unknown chat template {name!r}; known: {sorted(_registry)}")
    return _registry[name]


def chat_template_names() -> List[str]:
    return sorted(_registry)


register_chat_template(ChatTemplate(
    name="chatml",
    roles={"system": ("<|im_start|>system\n", "<|im_end|>\n"),
           "user": ("<|im_start|>user\n", "<|im_end|>\n"),
           "assistant": ("<|im_start|>assistant\n", "<|im_end|>\n")},
    assistant_prefix="<|im_start|>assistant\n",
    stop=("<|im_end|>",),
))

register_chat_template(ChatTemplate(
    name="llama-2",
    roles={"system": ("[INST] <<SYS>>\n", "\n<</SYS>>\n\n"),
           "user": ("[INST] ", " [/INST]"),
           "assistant": (" ", " </s>")},
    assistant_prefix=" ",
))

register_chat_template(ChatTemplate(
    name="llama-3",
    roles={"system": ("<|start_header_id|>system<|end_header_id|>\n\n",
                      "<|eot_id|>"),
           "user": ("<|start_header_id|>user<|end_header_id|>\n\n",
                    "<|eot_id|>"),
           "assistant": ("<|start_header_id|>assistant<|end_header_id|>"
                         "\n\n", "<|eot_id|>")},
    assistant_prefix="<|start_header_id|>assistant<|end_header_id|>\n\n",
    stop=("<|eot_id|>",),
))

register_chat_template(ChatTemplate(
    name="vicuna_v1.1",
    roles={"system": ("", " "),
           "user": ("USER: ", " "),
           "assistant": ("ASSISTANT: ", "</s>")},
    assistant_prefix="ASSISTANT:",
    system_default=("A chat between a curious user and an artificial "
                    "intelligence assistant. The assistant gives helpful, "
                    "detailed, and polite answers to the user's questions."),
))

register_chat_template(ChatTemplate(
    name="gemma-it",
    roles={"user": ("<start_of_turn>user\n", "<end_of_turn>\n"),
           "assistant": ("<start_of_turn>model\n", "<end_of_turn>\n"),
           "system": ("<start_of_turn>user\n", "<end_of_turn>\n")},
    assistant_prefix="<start_of_turn>model\n",
    stop=("<end_of_turn>",),
))

register_chat_template(ChatTemplate(
    name="mistral",
    roles={"system": ("[INST] ", "\n"),
           "user": ("[INST] ", " [/INST]"),
           "assistant": ("", "</s>")},
    assistant_prefix="",
))

register_chat_template(ChatTemplate(
    name="deepseek-v3",
    roles={"system": ("", "\n"),
           "user": ("<｜User｜>", ""),
           "assistant": ("<｜Assistant｜>", "<｜end▁of▁sentence｜>")},
    assistant_prefix="<｜Assistant｜>",
    stop=("<｜end▁of▁sentence｜>",),
))
