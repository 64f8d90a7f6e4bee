"""EBNF (GBNF-style) grammar -> regex for the from-scratch engine.

The reference compiles EBNF with xgrammar (srt/constrained/
xgrammar_backend.py); neither xgrammar nor llguidance exists in this
image. Non-recursive grammars — which covers the tool-call/structured-
output grammars the EBNF path is used for in practice — are expanded
rule-by-rule into one regex over the byte DFA. Recursive rules raise
(a pushdown engine is the planned upgrade path).

Syntax: `name ::= expr`, string literals "..." (with \\ escapes), char
classes [...] passed through, rule references, groups (...), alternation
`|`, postfix `*` `+` `?` `{m,n}`, and `#` comments.
"""

from __future__ import annotations

import re
from typing import Dict, List

_RULE_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_-]*)\s*::=\s*(.*)$")
_REGEX_SPECIAL = set(".^$*+?{}[]()|\\")


def _escape_literal(text: str) -> str:
    return "".join("\\" + c if c in _REGEX_SPECIAL else c for c in text)


class _ExprParser:
    def __init__(self, s: str, rules: Dict[str, str]):
        self.s = s
        self.i = 0
        self.rules = rules
        self.refs: List[str] = []

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else None

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def parse_alternation(self) -> str:
        parts = [self.parse_concat()]
        self.ws()
        while self.peek() == "|":
            self.i += 1
            parts.append(self.parse_concat())
            self.ws()
        if len(parts) == 1:
            return parts[0]
        return "(" + "|".join(parts) + ")"

    def parse_concat(self) -> str:
        out = []
        while True:
            self.ws()
            c = self.peek()
            if c is None or c in "|)":
                break
            out.append(self.parse_postfix())
        return "".join(out)

    def parse_postfix(self) -> str:
        atom = self.parse_atom()
        self.ws()
        c = self.peek()
        if c in ("*", "+", "?"):
            self.i += 1
            return f"({atom}){c}"
        if c == "{":
            j = self.s.index("}", self.i)
            rep = self.s[self.i : j + 1]
            self.i = j + 1
            return f"({atom}){rep}"
        return atom

    def parse_atom(self) -> str:
        c = self.peek()
        if c == '"':
            self.i += 1
            lit = []
            while self.peek() != '"':
                ch = self.s[self.i]
                self.i += 1
                if ch == "\\":
                    nxt = self.s[self.i]
                    self.i += 1
                    lit.append({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
                else:
                    lit.append(ch)
            self.i += 1
            return _escape_literal("".join(lit))
        if c == "[":
            j = self.i + 1
            if self.s[j] == "^":
                j += 1
            if j < len(self.s) and self.s[j] == "]":
                j += 1
            while self.s[j] != "]":
                if self.s[j] == "\\":
                    j += 1
                j += 1
            cls = self.s[self.i : j + 1]
            self.i = j + 1
            return cls
        if c == "(":
            self.i += 1
            inner = self.parse_alternation()
            assert self.peek() == ")", f"unclosed group in {self.s!r}"
            self.i += 1
            return f"({inner})"
        m = _RULE_REF.match(self.s, self.i)
        if m:
            self.i = m.end()
            self.refs.append(m.group(0))
            return "\x00" + m.group(0) + "\x00"   # placeholder
        raise ValueError(f"EBNF parse error at {self.s[self.i:]!r}")


_RULE_REF = re.compile(r"[A-Za-z_][A-Za-z0-9_-]*")


def ebnf_to_regex(grammar: str, root: str = "root") -> str:
    rules: Dict[str, str] = {}
    pending = None
    for raw in grammar.splitlines():
        line = raw.split("#", 1)[0].rstrip()
        if not line.strip():
            continue
        m = _RULE_RE.match(line.strip())
        if m:
            pending = m.group(1)
            rules[pending] = m.group(2)
        elif pending is not None:
            rules[pending] += " " + line.strip()
        else:
            raise ValueError(f"EBNF line outside a rule: {raw!r}")
    if root not in rules:
        raise ValueError(f"EBNF grammar has no {root!r} rule")

    compiled: Dict[str, str] = {}

    def expand(name: str, stack: tuple) -> str:
        if name in compiled:
            return compiled[name]
        if name in stack:
            raise ValueError(
                f"recursive EBNF rule {name!r} is not supported "
                "(non-recursive grammars only)")
        if name not in rules:
            raise ValueError(f"undefined EBNF rule {name!r}")
        p = _ExprParser(rules[name], rules)
        body = p.parse_alternation()
        for ref in set(p.refs):
            sub = expand(ref, stack + (name,))
            body = body.replace(f"\x00{ref}\x00", f"({sub})")
        compiled[name] = body
        return body

    return expand(root, ())
