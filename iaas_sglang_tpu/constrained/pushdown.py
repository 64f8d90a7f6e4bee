"""Pushdown (recursive) grammar engine: byte-level PDA over rule NFAs.

The reference compiles full context-free grammars with xgrammar
(srt/constrained/xgrammar_backend.py:45); the r1 engine expanded
non-recursive EBNF into one regex and RAISED on recursion. This module
lifts that limit: each rule body compiles to a small byte-NFA whose rule
references are CALL edges, and the runtime is a configuration-set PDA —
a set of stacks of (rule, nfa_state) frames, closed under epsilon moves,
rule calls (push) and rule completion (pop). Nested JSON of unbounded
depth — the most common structured-output ask — runs in one stack frame
per nesting level.

Token masking walks the tokenizer byte-trie over PDA configurations
(the same lazy-index idea as token_fsm.py). Masks are memoized by the
stack SUFFIX the walk actually touched: a decode step deep inside a
nested structure reuses the mask computed at any other depth with the
same top frames — without this, every nesting level would recompute the
full-vocabulary walk.
"""

from __future__ import annotations

import re
from typing import Dict, FrozenSet, List, Optional, Tuple

import numpy as np

from iaas_sglang_tpu.constrained.token_fsm import TokenVocab

EPS = -1
_CLOSURE_CAP = 200_000  # guards against left-recursive grammars


# ---------------------------------------------------------------- compile

class _Frag:
    __slots__ = ("start", "accept")

    def __init__(self, start, accept):
        self.start = start
        self.accept = accept


class _NState:
    __slots__ = ("eid", "byte_edges", "call_edges", "eps")

    def __init__(self, eid):
        self.eid = eid
        self.byte_edges: List[Tuple[FrozenSet[int], int]] = []
        self.call_edges: List[Tuple[str, int]] = []   # (rule, return state)
        self.eps: List[int] = []


class _RuleNFA:
    """One rule's NFA over bytes + CALL symbols."""

    def __init__(self):
        self.states: List[_NState] = []
        self.start = 0
        self.accept = 0

    def new_state(self) -> int:
        st = _NState(len(self.states))
        self.states.append(st)
        return st.eid


class _BodyParser:
    """GBNF rule-body parser -> NFA fragment with CALL edges.

    Syntax (same subset as ebnf.py): "literals", [char classes], rule
    refs, (...), |, postfix * + ? {m,n}, and '.'."""

    def __init__(self, s: str, nfa: _RuleNFA):
        self.s = s
        self.i = 0
        self.nfa = nfa

    def peek(self):
        return self.s[self.i] if self.i < len(self.s) else None

    def ws(self):
        while self.i < len(self.s) and self.s[self.i] in " \t":
            self.i += 1

    def _frag_bytes(self, byte_set: FrozenSet[int]) -> _Frag:
        a = self.nfa.new_state()
        b = self.nfa.new_state()
        self.nfa.states[a].byte_edges.append((byte_set, b))
        return _Frag(a, b)

    def _frag_eps(self) -> _Frag:
        a = self.nfa.new_state()
        return _Frag(a, a)

    def _concat(self, f1: _Frag, f2: _Frag) -> _Frag:
        self.nfa.states[f1.accept].eps.append(f2.start)
        return _Frag(f1.start, f2.accept)

    def parse_alternation(self) -> _Frag:
        frags = [self.parse_concat()]
        self.ws()
        while self.peek() == "|":
            self.i += 1
            frags.append(self.parse_concat())
            self.ws()
        if len(frags) == 1:
            return frags[0]
        s = self.nfa.new_state()
        a = self.nfa.new_state()
        for f in frags:
            self.nfa.states[s].eps.append(f.start)
            self.nfa.states[f.accept].eps.append(a)
        return _Frag(s, a)

    def parse_concat(self) -> _Frag:
        frag = None
        while True:
            self.ws()
            c = self.peek()
            if c is None or c in "|)":
                break
            nxt = self.parse_postfix()
            frag = nxt if frag is None else self._concat(frag, nxt)
        return frag if frag is not None else self._frag_eps()

    def parse_postfix(self) -> _Frag:
        frag = self.parse_atom()
        while True:
            self.ws()
            c = self.peek()
            if c == "*":
                self.i += 1
                frag = self._star(frag)
            elif c == "+":
                self.i += 1
                frag = self._concat(frag, self._star(self._copy(frag)))
            elif c == "?":
                self.i += 1
                frag = self._opt(frag)
            elif c == "{":
                m = re.match(r"\{(\d+)(,(\d*))?\}", self.s[self.i:])
                if not m:
                    raise ValueError(f"bad repetition at {self.s[self.i:]!r}")
                self.i += m.end()
                lo = int(m.group(1))
                hi = (None if m.group(3) == "" else
                      int(m.group(3)) if m.group(3) else lo)
                parts = [self._copy(frag) for _ in range(max(lo, 1))]
                out = parts[0] if lo > 0 else None
                for p in parts[1:lo]:
                    out = self._concat(out, p)
                if hi is None:
                    tail = self._star(self._copy(frag))
                    out = tail if out is None else self._concat(out, tail)
                else:
                    for _ in range(hi - lo):
                        opt = self._opt(self._copy(frag))
                        out = opt if out is None else self._concat(out, opt)
                frag = out if out is not None else self._frag_eps()
            else:
                break
        return frag

    # NFA fragments are DAG-shaped graphs; "copy" re-parses would be
    # complex — instead remember the source span and rebuild
    def parse_atom(self) -> _Frag:
        # the start offset must be a LOCAL: groups recurse back into
        # parse_atom for their inner atoms, and an instance attribute would
        # be clobbered — _copy would then re-parse only the tail of the
        # group (e.g. ("," item){0,1} losing its comma)
        start = self.i
        f = self._parse_atom_inner()
        self._last_span = (start, self.i)
        return f

    def _copy(self, frag: _Frag) -> _Frag:
        lo, hi = self._last_span
        sub = _BodyParser(self.s[lo:hi], self.nfa)
        f = sub.parse_alternation()
        return f

    def _star(self, frag: _Frag) -> _Frag:
        s = self.nfa.new_state()
        self.nfa.states[s].eps.append(frag.start)
        self.nfa.states[frag.accept].eps.append(s)
        return _Frag(s, s)

    def _opt(self, frag: _Frag) -> _Frag:
        s = self.nfa.new_state()
        a = self.nfa.new_state()
        self.nfa.states[s].eps.extend([frag.start, a])
        self.nfa.states[frag.accept].eps.append(a)
        return _Frag(s, a)

    def _parse_atom_inner(self) -> _Frag:
        c = self.peek()
        if c == '"':
            self.i += 1
            frag = None
            while self.peek() != '"':
                ch = self.s[self.i]
                self.i += 1
                if ch == "\\":
                    nxt = self.s[self.i]
                    self.i += 1
                    ch = {"n": "\n", "t": "\t", "r": "\r",
                          "x": None}.get(nxt, nxt)
                    if ch is None:  # \xHH
                        ch = chr(int(self.s[self.i:self.i + 2], 16))
                        self.i += 2
                for b in ch.encode("utf-8"):
                    f = self._frag_bytes(frozenset([b]))
                    frag = f if frag is None else self._concat(frag, f)
            self.i += 1
            return frag if frag is not None else self._frag_eps()
        if c == "[":
            j = self.i
            depth_done = False
            k = j + 1
            if k < len(self.s) and self.s[k] == "^":
                k += 1
            if k < len(self.s) and self.s[k] == "]":
                k += 1
            while self.s[k] != "]":
                if self.s[k] == "\\":
                    k += 1
                k += 1
            cls = self.s[j:k + 1]
            self.i = k + 1
            return self._frag_bytes(_class_bytes(cls))
        if c == ".":
            self.i += 1
            return self._frag_bytes(frozenset(range(256)) - {10})
        if c == "(":
            self.i += 1
            inner = self.parse_alternation()
            assert self.peek() == ")", f"unclosed group in {self.s!r}"
            self.i += 1
            return inner
        m = _RULE_REF.match(self.s, self.i)
        if m:
            self.i = m.end()
            a = self.nfa.new_state()
            b = self.nfa.new_state()
            self.nfa.states[a].call_edges.append((m.group(0), b))
            return _Frag(a, b)
        raise ValueError(f"EBNF parse error at {self.s[self.i:]!r}")


_RULE_REF = re.compile(r"[A-Za-z_][A-Za-z0-9_-]*")
_RULE_RE = re.compile(r"^([A-Za-z_][A-Za-z0-9_-]*)\s*::=\s*(.*)$")


def _class_bytes(cls: str) -> FrozenSet[int]:
    """[...] char class -> byte set (single-byte chars + multi-byte chars
    are approximated by their full UTF-8 range only when single chars;
    ranges over ASCII are exact)."""
    body = cls[1:-1]
    neg = body.startswith("^")
    if neg:
        body = body[1:]
    out = set()
    i = 0
    chars = []
    while i < len(body):
        ch = body[i]
        if ch == "\\":
            i += 1
            nxt = body[i]
            ch = {"n": "\n", "t": "\t", "r": "\r", "\\": "\\",
                  "]": "]", "^": "^", "-": "-"}.get(nxt, nxt)
            if nxt == "x":
                ch = chr(int(body[i + 1:i + 3], 16))
                i += 2
            elif nxt == "u":
                ch = chr(int(body[i + 1:i + 5], 16))
                i += 4
        chars.append(ch)
        i += 1
    # expand a-b ranges
    j = 0
    while j < len(chars):
        if (j + 2 < len(chars) and chars[j + 1] == "-"
                and body.find("\\-") == -1):
            lo, hi = ord(chars[j]), ord(chars[j + 2])
            for v in range(lo, hi + 1):
                if v < 128:
                    out.add(v)
                else:
                    for b in chr(v).encode("utf-8"):
                        out.add(b)  # multi-byte approx
            j += 3
        else:
            enc = chars[j].encode("utf-8")
            if len(enc) == 1:
                out.add(enc[0])
            else:
                for b in enc:
                    out.add(b)      # multi-byte approx
            j += 1
    if neg:
        out = set(range(256)) - out - {b for b in range(0x80, 0xC0)} \
            if False else set(range(256)) - out
    return frozenset(out)


class PushdownAutomaton:
    """Compiled grammar: one NFA per rule + the PDA step/closure ops."""

    def __init__(self, grammar: str, root: str = "root"):
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
        self.root = root
        self.nfas: Dict[str, _RuleNFA] = {}
        for name, body in rules.items():
            nfa = _RuleNFA()
            p = _BodyParser(body, nfa)
            frag = p.parse_alternation()
            assert p.i == len(p.s) or p.peek() is None, \
                f"trailing junk in rule {name!r}: {p.s[p.i:]!r}"
            nfa.start, nfa.accept = frag.start, frag.accept
            self.nfas[name] = nfa
        for nfa in self.nfas.values():
            for st in nfa.states:
                for rule, _ in st.call_edges:
                    if rule not in self.nfas:
                        raise ValueError(f"undefined EBNF rule {rule!r}")
        self.start_config = self.closure(
            frozenset({((root, self.nfas[root].start),)}))

    # A config is a frozenset of stacks; each stack a tuple of
    # (rule, state) frames, TOP LAST. The empty stack () marks full
    # acceptance (EOS is allowed).

    def closure(self, config: FrozenSet[tuple]) -> FrozenSet[tuple]:
        seen = set(config)
        work = list(config)
        n = 0
        while work:
            n += 1
            if n > _CLOSURE_CAP:
                raise ValueError(
                    "grammar closure exploded (left recursion?)")
            stack = work.pop()
            if not stack:
                continue
            rule, q = stack[-1]
            st = self.nfas[rule].states[q]
            nexts = []
            for q2 in st.eps:
                nexts.append(stack[:-1] + ((rule, q2),))
            for callee, q_ret in st.call_edges:
                nexts.append(stack[:-1] + ((rule, q_ret),)
                             + ((callee, self.nfas[callee].start),))
            if q == self.nfas[rule].accept:
                nexts.append(stack[:-1])
            for s2 in nexts:
                if s2 not in seen:
                    seen.add(s2)
                    work.append(s2)
        return frozenset(seen)

    def step_byte(self, config: FrozenSet[tuple], b: int,
                  touched: Optional[list] = None) -> FrozenSet[tuple]:
        """One byte transition + closure. `touched`, when given, is a
        1-element list tracking the minimum stack depth reached (for the
        suffix memo in PushdownTokenMask)."""
        out = set()
        for stack in config:
            if not stack:
                continue
            rule, q = stack[-1]
            for byte_set, q2 in self.nfas[rule].states[q].byte_edges:
                if b in byte_set:
                    out.add(stack[:-1] + ((rule, q2),))
        if not out:
            return frozenset()
        closed = self.closure(frozenset(out))
        if touched is not None:
            for stack in closed:
                touched[0] = min(touched[0], len(stack))
        return closed

    def accepts_eos(self, config: FrozenSet[tuple]) -> bool:
        return () in config


class PushdownTokenMask:
    """Token-level masking over PDA configs with suffix memoization."""

    def __init__(self, pda: PushdownAutomaton, vocab: TokenVocab):
        self.pda = pda
        self.vocab = vocab
        # suffix-keyed mask cache: {(bottom_exhausted, suffix frames):
        #   (mask, {token: config-suffix-update})}
        self._cache: Dict[tuple, tuple] = {}
        self._suffix_lens: set = set()

    def _suffix_key(self, config, k: int):
        """Config reduced to each stack's top k frames (+ depth flag)."""
        return frozenset(
            (min(len(s), k), s[-k:] if k else ()) if len(s) > k
            else (len(s), s)
            for s in config)

    def allowed(self, config) -> Tuple[np.ndarray, dict]:
        for k in sorted(self._suffix_lens):
            hit = self._cache.get(self._suffix_key(config, k))
            if hit is not None:
                return hit
        mask = np.zeros(self.vocab.vocab_size, dtype=bool)
        nexts: dict = {}
        min_depth = [min((len(s) for s in config), default=0)]
        base_depth = min_depth[0]

        def walk(node, cfg):
            for tid in node.token_ids:
                mask[tid] = True
                nexts[tid] = cfg
            for b, child in node.children.items():
                cfg2 = self.pda.step_byte(cfg, b, touched=min_depth)
                if cfg2:
                    walk(child, cfg2)

        walk(self.vocab.root, config)
        if self.pda.accepts_eos(config) \
                and self.vocab.eos_token_id is not None:
            mask[self.vocab.eos_token_id] = True
        # frames below (base_depth - popped) were never inspected: the
        # mask holds for ANY config sharing this suffix
        popped = base_depth - min_depth[0]
        k = popped + 1
        self._cache[self._suffix_key(config, k)] = (mask, nexts)
        self._suffix_lens.add(k)
        return mask, nexts


class PushdownGrammar:
    """BaseGrammarObject-compatible recursive-grammar state machine."""

    def __init__(self, mask_index: PushdownTokenMask):
        self.index = mask_index
        self.config = mask_index.pda.start_config
        self._dead = False

    def accept_token(self, token_id: int) -> None:
        if self._dead:
            return
        if token_id == self.index.vocab.eos_token_id:
            self._dead = True
            return
        bs = (self.index.vocab.token_bytes[token_id]
              if token_id < len(self.index.vocab.token_bytes) else None)
        if not bs:
            self._dead = True
            return
        cfg = self.config
        for b in bs:
            cfg = self.index.pda.step_byte(cfg, b)
            if not cfg:
                self._dead = True
                return
        self.config = cfg

    def allowed_tokens(self) -> Optional[np.ndarray]:
        if self._dead:
            return None
        mask, _ = self.index.allowed(self.config)
        return mask

    def is_terminated(self) -> bool:
        if self._dead:
            return True
        mask = self.allowed_tokens()
        return (self.index.pda.accepts_eos(self.config)
                and (mask is None or not mask.any()
                     or (mask.sum() == 1 and self.index.vocab.eos_token_id
                         is not None
                         and mask[self.index.vocab.eos_token_id])))

    def copy(self) -> "PushdownGrammar":
        return PushdownGrammar(self.index)  # shares compiled PDA + caches
