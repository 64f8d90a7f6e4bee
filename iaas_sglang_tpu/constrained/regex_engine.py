"""Byte-level regex engine: parse -> Thompson NFA -> lazy-subset DFA.

The reference delegates constrained decoding to external libraries
(xgrammar/outlines, srt/constrained/*_backend.py); none exist in this
image, so this is a from-scratch engine covering the regex subset that
JSON-schema-derived patterns need:

    literals, escapes, `.`, `[...]`/`[^...]` classes with ranges,
    `*` `+` `?` `{m}` `{m,}` `{m,n}`, alternation `|`, groups `(...)`

Operates on UTF-8 bytes so DFA transitions are over a 256-symbol
alphabet and multi-byte characters work unmodified.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Set, Tuple

EPS = -1  # epsilon edge label


@dataclass
class NFAState:
    edges: List[Tuple[object, "NFAState"]] = field(default_factory=list)
    # edge label: EPS or frozenset of byte values


class _Parser:
    """Recursive-descent regex parser producing an NFA fragment."""

    def __init__(self, pattern: str):
        self.b = pattern
        self.i = 0

    def peek(self) -> Optional[str]:
        return self.b[self.i] if self.i < len(self.b) else None

    def next(self) -> str:
        ch = self.b[self.i]
        self.i += 1
        return ch

    # fragment = (start, accept) pair of NFAStates
    def parse(self) -> Tuple[NFAState, NFAState]:
        frag = self.alternation()
        if self.i != len(self.b):
            raise ValueError(f"unexpected {self.b[self.i]!r} at {self.i}")
        return frag

    def alternation(self):
        frags = [self.concat()]
        while self.peek() == "|":
            self.next()
            frags.append(self.concat())
        if len(frags) == 1:
            return frags[0]
        s, a = NFAState(), NFAState()
        for fs, fa in frags:
            s.edges.append((EPS, fs))
            fa.edges.append((EPS, a))
        return s, a

    def concat(self):
        frags = []
        while self.peek() is not None and self.peek() not in "|)":
            frags.append(self.repeat())
        if not frags:
            s = NFAState()
            return s, s
        for (s1, a1), (s2, a2) in zip(frags, frags[1:]):
            a1.edges.append((EPS, s2))
        return frags[0][0], frags[-1][1]

    def repeat(self):
        frag = self.atom()
        while True:
            ch = self.peek()
            if ch == "*":
                self.next()
                frag = self._star(frag)
            elif ch == "+":
                self.next()
                s2, a2 = self._star(self._clone(frag))
                frag[1].edges.append((EPS, s2))
                frag = (frag[0], a2)
            elif ch == "?":
                self.next()
                s, a = NFAState(), NFAState()
                s.edges.append((EPS, frag[0]))
                s.edges.append((EPS, a))
                frag[1].edges.append((EPS, a))
                frag = (s, a)
            elif ch == "{":
                frag = self._bounded(frag)
            else:
                return frag

    def _star(self, frag):
        s, a = NFAState(), NFAState()
        s.edges.append((EPS, frag[0]))
        s.edges.append((EPS, a))
        frag[1].edges.append((EPS, frag[0]))
        frag[1].edges.append((EPS, a))
        return s, a

    def _bounded(self, frag):
        # {m} {m,} {m,n}
        assert self.next() == "{"
        num = ""
        while self.peek() and self.peek().isdigit():
            num += self.next()
        m = int(num)
        n: Optional[int] = m
        if self.peek() == ",":
            self.next()
            num2 = ""
            while self.peek() and self.peek().isdigit():
                num2 += self.next()
            n = int(num2) if num2 else None
        if self.next() != "}":
            raise ValueError("unterminated {m,n}")
        # build m required copies + (n-m) optional copies (or star for m,)
        parts = [self._clone(frag) for _ in range(max(m, 1))]
        if m == 0:
            parts = []
        if n is None:
            parts.append(self._star(self._clone(frag)))
            opt = []
        else:
            opt = [self._clone(frag) for _ in range(n - m)]
        s = NFAState()
        cur_accept = s
        for fs, fa in parts:
            cur_accept.edges.append((EPS, fs))
            cur_accept = fa
        final = NFAState()
        cur_accept.edges.append((EPS, final))
        for fs, fa in opt:
            prev = cur_accept
            prev.edges.append((EPS, fs))
            fa.edges.append((EPS, final))
            cur_accept = fa
        return s, final

    def _clone(self, frag):
        s, a = frag
        mapping: Dict[int, NFAState] = {}

        def cp(node: NFAState) -> NFAState:
            if id(node) in mapping:
                return mapping[id(node)]
            new = NFAState()
            mapping[id(node)] = new
            for lbl, dst in node.edges:
                new.edges.append((lbl, cp(dst)))
            return new

        return cp(s), cp(a)

    def atom(self):
        ch = self.next()
        if ch == "(":
            if self.b[self.i : self.i + 2] == "?:":
                self.i += 2
            frag = self.alternation()
            if self.next() != ")":
                raise ValueError("unbalanced paren")
            return frag
        if ch == "[":
            return self._charclass()
        if ch == ".":
            # any byte except newline (multibyte chars allowed)
            byts = frozenset(range(256)) - {0x0A}
            return self._sym(byts)
        if ch == "\\":
            return self._escape(self.next())
        if ch in "*+?{":
            raise ValueError(f"dangling quantifier {ch!r}")
        return self._lit(ch)

    def _lit(self, ch: str):
        bs = ch.encode("utf-8")
        frags = [self._sym(frozenset({b})) for b in bs]
        for (s1, a1), (s2, a2) in zip(frags, frags[1:]):
            a1.edges.append((EPS, s2))
        return frags[0][0], frags[-1][1]

    def _sym(self, byts: FrozenSet[int]):
        s, a = NFAState(), NFAState()
        s.edges.append((byts, a))
        return s, a

    _CLASSES = {
        "d": frozenset(range(0x30, 0x3A)),
        "w": frozenset(
            list(range(0x30, 0x3A)) + list(range(0x41, 0x5B))
            + list(range(0x61, 0x7B)) + [0x5F]),
        "s": frozenset({0x20, 0x09, 0x0A, 0x0D, 0x0C, 0x0B}),
        "n": frozenset({0x0A}),
        "t": frozenset({0x09}),
        "r": frozenset({0x0D}),
    }

    def _hex_escape(self) -> int:
        h = self.next() + self.next()
        return int(h, 16)

    def _escape(self, ch: str):
        if ch in self._CLASSES:
            return self._sym(self._CLASSES[ch])
        if ch in ("D", "W", "S"):
            return self._sym(frozenset(range(256)) - self._CLASSES[ch.lower()])
        if ch == "x":
            return self._sym(frozenset({self._hex_escape()}))
        return self._lit(ch)

    def _charclass(self):
        neg = False
        if self.peek() == "^":
            self.next()
            neg = True
        byts: Set[int] = set()
        prev_char: Optional[str] = None
        while True:
            ch = self.peek()
            if ch is None:
                raise ValueError("unterminated char class")
            if ch == "]":
                self.next()
                break
            ch = self.next()
            lo_val: Optional[int] = None
            if ch == "\\":
                esc = self.next()
                if esc in self._CLASSES:
                    byts |= self._CLASSES[esc]
                    continue
                if esc == "x":
                    lo_val = self._hex_escape()
                else:
                    ch = esc
            if lo_val is None and len(ch.encode("utf-8")) == 1:
                lo_val = ch.encode("utf-8")[0]
            if self.peek() == "-" and self.b[self.i + 1 : self.i + 2] not in ("]", ""):
                self.next()
                hi = self.next()
                hi_val: Optional[int] = None
                if hi == "\\":
                    esc = self.next()
                    if esc == "x":
                        hi_val = self._hex_escape()
                    else:
                        hi = esc
                if hi_val is None:
                    hi_val = hi.encode("utf-8")[0]
                assert lo_val is not None, "range start must be single-byte"
                for c in range(lo_val, hi_val + 1):
                    byts.add(c)
            elif lo_val is not None:
                byts.add(lo_val)
            else:
                for b in ch.encode("utf-8"):
                    byts.add(b)
        if neg:
            byts = set(range(256)) - byts
        return self._sym(frozenset(byts))


class RegexDFA:
    """Lazy subset-construction DFA over bytes."""

    DEAD = -2

    def __init__(self, pattern: str):
        start, accept = _Parser(pattern).parse()
        self._accept_nfa = accept
        self._start_set = self._eps_closure({id(start): start})
        self._states: Dict[FrozenSet[int], int] = {}
        self._state_sets: List[Dict[int, NFAState]] = []
        self._trans: List[Dict[int, int]] = []
        self._accepting: List[bool] = []
        self.start = self._intern(self._start_set)

    def _eps_closure(self, nodes: Dict[int, NFAState]) -> Dict[int, NFAState]:
        stack = list(nodes.values())
        out = dict(nodes)
        while stack:
            n = stack.pop()
            for lbl, dst in n.edges:
                if lbl is EPS and id(dst) not in out:
                    out[id(dst)] = dst
                    stack.append(dst)
        return out

    def _intern(self, node_set: Dict[int, NFAState]) -> int:
        key = frozenset(node_set.keys())
        if key in self._states:
            return self._states[key]
        idx = len(self._state_sets)
        self._states[key] = idx
        self._state_sets.append(node_set)
        self._trans.append({})
        self._accepting.append(id(self._accept_nfa) in node_set)
        return idx

    def step(self, state: int, byte: int) -> int:
        if state == self.DEAD:
            return self.DEAD
        cache = self._trans[state]
        if byte in cache:
            return cache[byte]
        nxt: Dict[int, NFAState] = {}
        for n in self._state_sets[state].values():
            for lbl, dst in n.edges:
                if lbl is not EPS and byte in lbl:
                    nxt[id(dst)] = dst
        if not nxt:
            cache[byte] = self.DEAD
            return self.DEAD
        res = self._intern(self._eps_closure(nxt))
        cache[byte] = res
        return res

    def step_bytes(self, state: int, data: bytes) -> int:
        for b in data:
            state = self.step(state, b)
            if state == self.DEAD:
                return self.DEAD
        return state

    def is_accepting(self, state: int) -> bool:
        return state >= 0 and self._accepting[state]

    def viable_bytes(self, state: int) -> Set[int]:
        """Bytes with a live transition out of `state`."""
        if state == self.DEAD:
            return set()
        out = set()
        for n in self._state_sets[state].values():
            for lbl, dst in n.edges:
                if lbl is not EPS:
                    out |= lbl
        return {b for b in out if self.step(state, b) != self.DEAD}
