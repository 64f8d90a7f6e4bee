"""FIM (fill-in-the-middle) completion templates for code models.

TPU-framework analog of the reference's code-completion template registry
(/root/reference/python/sglang/srt/code_completion_parser.py:27-133 +
entrypoints/openai/serving_completions.py:57): `/v1/completions` requests
carrying a `suffix` are rewritten into the model's FIM prompt format so
code-completion models (DeepSeek-Coder, StarCoder, Qwen-Coder, ...) serve
the OpenAI suffix API idiomatically. Selected with `--completion-template
<name>` (or a JSON file defining a custom template).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

# position of the fim middle token: "middle" => begin+prompt+middle+suffix
# +end (DeepSeek style); "end" => begin+prompt+end+suffix+middle
# (StarCoder/Qwen style: the model generates after the middle token)


@dataclasses.dataclass
class CompletionTemplate:
    name: str
    fim_begin_token: str
    fim_middle_token: str
    fim_end_token: str
    fim_position: str = "end"      # "middle" | "end"


completion_templates: dict[str, CompletionTemplate] = {}

# the template selected by --completion-template (None = suffix ignored,
# plain completion)
_active: Optional[str] = None


def register_completion_template(t: CompletionTemplate,
                                 override: bool = False) -> None:
    if not override:
        assert t.name not in completion_templates, \
            f"{t.name} has been registered"
    completion_templates[t.name] = t


def completion_template_exists(name: str) -> bool:
    return name in completion_templates


def load_completion_template(arg: str) -> None:
    """Activate a registered template by name, or load a custom one from a
    JSON file {"name": ..., "fim_begin_token": ..., "fim_middle_token": ...,
    "fim_end_token": ..., "fim_position": "middle"|"end"}."""
    global _active
    if arg is None:
        _active = None
        return
    if not completion_template_exists(arg):
        if not (arg.endswith(".json") and os.path.exists(arg)):
            raise ValueError(
                f"unknown completion template {arg!r} (registered: "
                f"{sorted(completion_templates)}; or pass a .json file)")
        with open(arg) as f:
            spec = json.load(f)
        t = CompletionTemplate(
            name=spec.get("name", os.path.basename(arg)),
            fim_begin_token=spec["fim_begin_token"],
            fim_middle_token=spec["fim_middle_token"],
            fim_end_token=spec["fim_end_token"],
            fim_position=spec.get("fim_position", "end"),
        )
        register_completion_template(t, override=True)
        _active = t.name
        return
    _active = arg


def is_completion_template_defined() -> bool:
    return _active is not None


def generate_completion_prompt(prompt: str, suffix: str,
                               name: Optional[str] = None) -> str:
    t = completion_templates[name or _active]
    if t.fim_position == "middle":
        return (f"{t.fim_begin_token}{prompt}{t.fim_middle_token}"
                f"{suffix}{t.fim_end_token}")
    return (f"{t.fim_begin_token}{prompt}{t.fim_end_token}"
            f"{suffix}{t.fim_middle_token}")


def apply_fim(prompt: str, suffix: Optional[str]) -> str:
    """Rewrite (prompt, suffix) into the active FIM format; passthrough
    when no suffix or no active template."""
    if not suffix or not is_completion_template_defined():
        return prompt
    return generate_completion_prompt(prompt, suffix)


register_completion_template(CompletionTemplate(
    name="deepseek_coder",
    fim_begin_token="<｜fim▁begin｜>",
    fim_middle_token="<｜fim▁hole｜>",
    fim_end_token="<｜fim▁end｜>",
    fim_position="middle",
))

register_completion_template(CompletionTemplate(
    name="star_coder",
    fim_begin_token="<fim_prefix>",
    fim_middle_token="<fim_middle>",
    fim_end_token="<fim_suffix>",
    fim_position="end",
))

register_completion_template(CompletionTemplate(
    name="qwen_coder",
    fim_begin_token="<|fim_prefix|>",
    fim_middle_token="<|fim_middle|>",
    fim_end_token="<|fim_suffix|>",
    fim_position="end",
))
