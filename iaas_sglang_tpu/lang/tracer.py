"""Frontend program tracing (analog of sglang lang/tracer.py:29,54,75
extract_prefix_by_tracing / trace_program / TracerProgramState + the
lang/compiler.py prefix precomputation).

A program is executed with a TRACING state: no backend calls happen;
`gen`/`select` record their op and substitute a symbolic placeholder for
the variable, so text built after them stays traceable. The recorded op
list gives (a) the static shared prefix before the first generation —
which callers can pre-warm into the radix cache — and (b) the program
skeleton for batch planning.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional

from iaas_sglang_tpu.lang.interpreter import (
    ProgramState,
    SglFunction,
    SglGen,
    SglRole,
    SglSelect,
)


@dataclass
class ProgramTrace:
    ops: List[tuple] = field(default_factory=list)  # ("text"|"gen"|"select", payload)
    prefix: str = ""              # static text before the first generation

    def gen_names(self) -> List[str]:
        return [p.name for k, p in self.ops if k in ("gen", "select")
                and p.name is not None]


class TracerProgramState(ProgramState):
    """ProgramState that records ops instead of calling a backend."""

    def __init__(self, chat_template=None):
        super().__init__(backend=None, chat_template=chat_template)
        self.trace = ProgramTrace()
        self._prefix_closed = False

    def _append_text(self, text: str) -> None:
        self.text += text
        if self.trace.ops and self.trace.ops[-1][0] == "text":
            self.trace.ops[-1] = ("text", self.trace.ops[-1][1] + text)
        else:
            self.trace.ops.append(("text", text))
        if not self._prefix_closed:
            self.trace.prefix += text

    def _exec(self, part) -> None:
        if isinstance(part, str):
            self._append_text(part)
        elif isinstance(part, SglGen):
            self.trace.ops.append(("gen", part))
            self._prefix_closed = True
            placeholder = f"__gen:{part.name or len(self.trace.ops)}__"
            if part.name:
                self.vars[part.name] = placeholder
            self.text += placeholder
        elif isinstance(part, SglSelect):
            self.trace.ops.append(("select", part))
            self._prefix_closed = True
            placeholder = f"__select:{part.name or len(self.trace.ops)}__"
            if part.name:
                self.vars[part.name] = placeholder
            self.text += placeholder
        elif isinstance(part, SglRole):
            prefix, suffix = self.role_templates[part.role]
            self._append_text(prefix)
            for p in part.parts:
                self._exec(p)
            self._append_text(suffix)
        elif isinstance(part, (list, tuple)):
            for p in part:
                self._exec(p)
        else:
            raise TypeError(f"cannot trace {type(part)} in a program")


def trace_program(fn: SglFunction, *args, chat_template=None,
                  **kwargs) -> ProgramTrace:
    state = TracerProgramState(chat_template=chat_template)
    fn.func(state, *args, **kwargs)
    return state.trace


def extract_prefix_by_tracing(fn: SglFunction, *args, **kwargs) -> str:
    """The static text every run of the program shares — worth pre-warming
    into the server's radix cache before a run_batch fan-out."""
    return trace_program(fn, *args, **kwargs).prefix
