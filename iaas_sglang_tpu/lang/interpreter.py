"""Compact synchronous interpreter for the frontend DSL.

The reference implements this as an IR + async StreamExecutor with
speculative role tracing (lang/ir.py:138, lang/interpreter.py:250). This
re-design executes eagerly against a backend: every `s += ...` either
appends prompt text or triggers a generation; `select` is implemented as
a grammar-constrained generation over the alternation of the choices
(served by our own regex engine — the constrained-decoding analog of
lang/choices.py scoring), which shares the radix-cached prefix across
choices by construction.
"""

from __future__ import annotations

import copy
import functools
import re
import threading
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Union


# ------------------------------------------------------------- primitives


@dataclass
class SglGen:
    name: Optional[str] = None
    max_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1
    stop: Optional[Union[str, List[str]]] = None
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ignore_eos: bool = False


@dataclass
class SglSelect:
    name: Optional[str]
    choices: List[str]
    choices_method: Optional[str] = None  # lang/choices.py scoring method


@dataclass
class SglRole:
    role: str
    parts: List[Any]  # str | SglGen | SglSelect


def gen(name: Optional[str] = None, *, max_tokens: int = 128,
        temperature: float = 1.0, top_p: float = 1.0, top_k: int = -1,
        stop=None, regex=None, json_schema=None, ignore_eos=False) -> SglGen:
    return SglGen(name, max_tokens, temperature, top_p, top_k, stop,
                  regex, json_schema, ignore_eos)


def select(name: Optional[str] = None, *, choices: List[str],
           choices_method: Optional[str] = None) -> SglSelect:
    """choices_method: None (constrained generation, default) or one of
    lang/choices.py CHOICES_SAMPLING_METHODS for likelihood scoring."""
    return SglSelect(name, list(choices), choices_method)


def _role(role: str):
    def tag(*parts) -> SglRole:
        return SglRole(role, list(parts))

    return tag


system = _role("system")
user = _role("user")
assistant = _role("assistant")


# --------------------------------------------------------------- backends


class EngineBackend:
    """Runs programs directly against an embedded Engine."""

    def __init__(self, engine):
        self.engine = engine

    def generate(self, prompt: str, sp: dict) -> str:
        out = self.engine.generate(prompt=prompt, sampling_params=sp)
        return out["text"]

    def _prompt_logprobs(self, text: str) -> List[float]:
        out = self.engine.generate(
            prompt=text, sampling_params={"max_new_tokens": 0},
            return_logprob=True, logprob_start_len=0)
        return [lp for lp, _tok in out["meta_info"]["input_token_logprobs"]]

    def score_choices(self, prompt: str, choices: List[str],
                      unconditional: bool = False):
        """Per-choice token logprobs via prompt-scoring requests
        (max_new_tokens=0 + return_logprob; the radix cache dedups the
        shared prompt across the per-choice scoring passes — the analog
        of the reference RuntimeEndpoint.select logprob calls)."""
        n_prompt = len(self._prompt_logprobs(prompt))
        cond = [self._prompt_logprobs(prompt + c)[n_prompt:] for c in choices]
        uncond = ([self._prompt_logprobs(c) or [0.0] for c in choices]
                  if unconditional else None)
        return cond, uncond


class RuntimeEndpoint:
    """Runs programs against a live HTTP server
    (analog of lang/backend/runtime_endpoint.py)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def _post(self, payload: dict) -> dict:
        import requests

        r = requests.post(f"{self.base_url}/generate", json=payload,
                          timeout=600)
        r.raise_for_status()
        return r.json()

    def generate(self, prompt: str, sp: dict) -> str:
        return self._post({"text": prompt, "sampling_params": sp})["text"]

    def _prompt_logprobs(self, text: str) -> List[float]:
        out = self._post({
            "text": text, "sampling_params": {"max_new_tokens": 0},
            "return_logprob": True, "logprob_start_len": 0})
        return [lp for lp, _tok in out["meta_info"]["input_token_logprobs"]]

    def score_choices(self, prompt: str, choices: List[str],
                      unconditional: bool = False):
        n_prompt = len(self._prompt_logprobs(prompt))
        cond = [self._prompt_logprobs(prompt + c)[n_prompt:] for c in choices]
        uncond = ([self._prompt_logprobs(c) or [0.0] for c in choices]
                  if unconditional else None)
        return cond, uncond


_default_backend: Optional[Any] = None


def set_default_backend(backend) -> None:
    global _default_backend
    _default_backend = backend


# ----------------------------------------------------------- program state


ROLE_TEMPLATES = {
    "system": ("system: ", "\n"),
    "user": ("user: ", "\n"),
    "assistant": ("assistant: ", "\n"),
}


class ProgramState:
    def __init__(self, backend, chat_template=None):
        self.backend = backend
        self.text = ""
        self.vars: Dict[str, str] = {}
        self.role_templates = chat_template or ROLE_TEMPLATES

    # `s += part` drives execution (interpreter.py StreamExecutor analog)
    def __iadd__(self, part) -> "ProgramState":
        self._exec(part)
        return self

    def _exec(self, part) -> None:
        if isinstance(part, str):
            self.text += part
        elif isinstance(part, SglGen):
            self._run_gen(part)
        elif isinstance(part, SglSelect):
            self._run_select(part)
        elif isinstance(part, SglRole):
            prefix, suffix = self.role_templates[part.role]
            self.text += prefix
            for p in part.parts:
                self._exec(p)
            self.text += suffix
        elif isinstance(part, (list, tuple)):
            for p in part:
                self._exec(p)
        else:
            raise TypeError(f"cannot execute {type(part)} in a program")

    def _run_gen(self, g: SglGen) -> None:
        sp = {
            "max_new_tokens": g.max_tokens,
            "temperature": g.temperature,
            "top_p": g.top_p,
            "top_k": g.top_k,
            "stop": g.stop,
            "ignore_eos": g.ignore_eos,
        }
        if g.regex:
            sp["regex"] = g.regex
        if g.json_schema:
            sp["json_schema"] = g.json_schema
        out = self.backend.generate(self.text, sp)
        if g.name:
            self.vars[g.name] = out
        self.text += out

    def _run_select(self, s: SglSelect) -> None:
        if s.choices_method and hasattr(self.backend, "score_choices"):
            from iaas_sglang_tpu.lang.choices import CHOICES_SAMPLING_METHODS

            method = CHOICES_SAMPLING_METHODS[s.choices_method]
            cond, uncond = self.backend.score_choices(
                self.text, s.choices,
                unconditional=method.requires_unconditional_logprobs)
            decision = method(s.choices, cond, uncond)
            if s.name:
                self.vars[s.name] = decision.decision
                self.vars[f"{s.name}__meta"] = decision.meta_info
            self.text += decision.decision
            return
        pattern = "(?:" + "|".join(re.escape(c) for c in s.choices) + ")"
        out = self.backend.generate(self.text, {
            "max_new_tokens": max(len(c) for c in s.choices) + 8,
            "temperature": 0.0,
            "regex": pattern,
        })
        # constrained decoding guarantees out is one of the choices
        pick = next((c for c in s.choices if out.startswith(c)), out)
        if s.name:
            self.vars[s.name] = pick
        self.text += pick

    def fork(self, n: int) -> List["ProgramState"]:
        """n independent continuations sharing this prefix (the radix cache
        dedups the shared prompt server-side — lang/ir.py SglFork analog).
        The backend handle is shared, not copied."""
        out = []
        for _ in range(n):
            st = ProgramState(self.backend, self.role_templates)
            st.text = self.text
            st.vars = dict(self.vars)
            out.append(st)
        return out

    def __getitem__(self, name: str) -> str:
        return self.vars[name]

    def __contains__(self, name: str) -> bool:
        return name in self.vars


# ---------------------------------------------------------------- function


class SglFunction:
    def __init__(self, func: Callable):
        self.func = func
        functools.update_wrapper(self, func)

    def run(self, *args, backend=None, **kwargs) -> ProgramState:
        backend = backend or _default_backend
        assert backend is not None, "no backend: pass backend= or set_default_backend"
        state = ProgramState(backend)
        self.func(state, *args, **kwargs)
        return state

    def run_batch(self, arg_list: List[dict], backend=None,
                  max_workers: int = 8) -> List[ProgramState]:
        from concurrent.futures import ThreadPoolExecutor

        backend = backend or _default_backend
        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            return list(ex.map(
                lambda kw: self.run(backend=backend, **kw), arg_list))

    def __call__(self, *args, **kwargs):
        return self.run(*args, **kwargs)


def function(func: Callable) -> SglFunction:
    return SglFunction(func)
