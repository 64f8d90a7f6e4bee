"""Grammar objects + backend cache
(analog of sglang srt/constrained/base_grammar_backend.py:29
BaseGrammarObject / :111 BaseGrammarBackend).

The grammar object tracks the automaton state per request: the scheduler
calls `accept_token` after each emitted token and `allowed_tokens` before
sampling; the mask is applied on-device as logits masking (the TPU analog
of apply_token_bitmask_inplace_cuda — a jnp.where)."""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import numpy as np

from iaas_sglang_tpu.constrained.json_schema import build_regex_from_schema
from iaas_sglang_tpu.constrained.regex_engine import RegexDFA
from iaas_sglang_tpu.constrained.token_fsm import TokenFSM, TokenVocab
from iaas_sglang_tpu.utils import logger


class BaseGrammarObject:
    def accept_token(self, token_id: int) -> None:
        raise NotImplementedError

    def allowed_tokens(self) -> Optional[np.ndarray]:
        """Bool mask [V] of allowed next tokens; None = unconstrained."""
        raise NotImplementedError

    def is_terminated(self) -> bool:
        raise NotImplementedError

    def copy(self) -> "BaseGrammarObject":
        raise NotImplementedError


class RegexGrammar(BaseGrammarObject):
    def __init__(self, fsm: TokenFSM):
        self.fsm = fsm
        self.state = fsm.dfa.start
        self._dead = False

    def accept_token(self, token_id: int) -> None:
        if self._dead:
            return
        if token_id == self.fsm.vocab.eos_token_id:
            self._dead = True
            return
        _, nexts = self.fsm.allowed(self.state)
        nxt = nexts.get(token_id)
        if nxt is None:
            # token outside the automaton (shouldn't happen with masking on)
            bs = self.fsm.vocab.token_bytes[token_id] \
                if token_id < len(self.fsm.vocab.token_bytes) else None
            self.state = (
                self.fsm.dfa.step_bytes(self.state, bs) if bs
                else self.fsm.dfa.DEAD
            )
            if self.state == self.fsm.dfa.DEAD:
                self._dead = True
        else:
            self.state = nxt

    def allowed_tokens(self) -> Optional[np.ndarray]:
        if self._dead:
            return None
        mask, _ = self.fsm.allowed(self.state)
        return mask

    def is_terminated(self) -> bool:
        return self._dead or (
            self.fsm.dfa.is_accepting(self.state)
            and not self.allowed_tokens().any()
        )

    def copy(self) -> "RegexGrammar":
        g = RegexGrammar(self.fsm)   # shares the (immutable) fsm + caches
        g.state = self.fsm.dfa.start
        return g


class StructuralTagGrammar(BaseGrammarObject):
    """Trigger-gated constrained generation (the reference's
    structural_tag constraint, xgrammar_backend.py:45): generation is FREE
    until the decoded text ends with a trigger string; then the matching
    structure (begin tag + schema body + end tag, compiled as one token
    FSM) is enforced, after which generation is free again. Repeatable."""

    def __init__(self, fsm: TokenFSM, triggers: list[bytes]):
        self.fsm = fsm
        self.triggers = triggers
        self._maxlen = max((len(t) for t in triggers), default=0) * 2
        self._buf = b""
        self.state: Optional[int] = None    # None = free mode

    def accept_token(self, token_id: int) -> None:
        vocab = self.fsm.vocab
        bs = (vocab.token_bytes[token_id]
              if token_id < len(vocab.token_bytes) else b"") or b""
        if self.state is None:
            self._buf = (self._buf + bs)[-self._maxlen:]
            dfa = self.fsm.dfa
            for t in self.triggers:
                # a single token may carry the trigger plus extra bytes —
                # step the DFA over whatever followed the trigger too
                idx = self._buf.rfind(t)
                if idx < 0:
                    continue
                st = dfa.step_bytes(dfa.start, self._buf[idx:])
                if st != dfa.DEAD:
                    self.state = st
                    self._buf = b""
                    break
            return
        _, nexts = self.fsm.allowed(self.state)
        nxt = nexts.get(token_id)
        if nxt is None:
            nxt = self.fsm.dfa.step_bytes(self.state, bs) if bs \
                else self.fsm.dfa.DEAD
        if nxt == self.fsm.dfa.DEAD:
            self.state = None           # fell out: back to free mode
            return
        self.state = nxt
        if self.fsm.dfa.is_accepting(self.state):
            # the union pattern ends exactly at a structure's end tag, so an
            # accepting state with no outgoing token edges = structure done
            # (fsm.allowed's mask would still flag eos — check edges instead)
            _, nexts2 = self.fsm.allowed(self.state)
            if not nexts2:
                self.state = None       # structure complete -> free

    def allowed_tokens(self) -> Optional[np.ndarray]:
        if self.state is None:
            return None                 # free mode: unconstrained
        mask, _ = self.fsm.allowed(self.state)
        return mask

    def is_terminated(self) -> bool:
        return False                    # termination is eos/max_new_tokens

    def copy(self) -> "StructuralTagGrammar":
        return StructuralTagGrammar(self.fsm, self.triggers)


class ReasonerGrammar(BaseGrammarObject):
    """Delay a grammar until the reasoning section ends (the reference's
    ReasonerGrammarObject, reasoner_grammar_backend.py:23, enabled by
    --reasoning-parser): generation is unconstrained while the model is
    inside its `<think>` block; once the end marker (e.g. "</think>")
    appears in the decoded bytes, the inner grammar takes over."""

    def __init__(self, inner: BaseGrammarObject, vocab: TokenVocab,
                 think_end: bytes = b"</think>"):
        self.inner = inner
        self.vocab = vocab
        self.think_end = think_end
        self._buf = b""
        self.thinking = True

    def accept_token(self, token_id: int) -> None:
        if self.thinking:
            bs = (self.vocab.token_bytes[token_id]
                  if token_id < len(self.vocab.token_bytes) else b"") or b""
            self._buf = (self._buf + bs)[-2 * len(self.think_end):]
            if self.think_end in self._buf:
                self.thinking = False
            return
        self.inner.accept_token(token_id)

    def allowed_tokens(self) -> Optional[np.ndarray]:
        return None if self.thinking else self.inner.allowed_tokens()

    def is_terminated(self) -> bool:
        return (not self.thinking) and self.inner.is_terminated()

    def copy(self) -> "ReasonerGrammar":
        return ReasonerGrammar(self.inner.copy(), self.vocab, self.think_end)


class GrammarFuture:
    """Handle for an in-flight grammar compile (analog of the reference's
    future-based async compile cache, base_grammar_backend.py:111 +
    scheduler grammar queue, scheduler.py:444-451,1176-1207): the scheduler
    parks the request in its grammar queue and polls `done()` each
    iteration, so a slow-compiling schema never stalls running decodes."""

    def __init__(self, future):
        self._future = future

    def done(self) -> bool:
        return self._future.done()

    def result(self) -> Optional[BaseGrammarObject]:
        return self._future.result()


class BaseGrammarBackend:
    """Compiles and caches grammar automata keyed by (type, spec)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.vocab = TokenVocab.get(tokenizer)
        self._cache: Dict[Tuple[str, str], TokenFSM] = {}
        self._lock = threading.Lock()
        self._executor = None            # lazy compile worker
        self._pending: Dict[Tuple[str, str], object] = {}

    def _cache_key(self, *, regex=None, json_schema=None, ebnf=None,
                   structural_tag=None):
        if structural_tag is not None:
            return ("structural_tag", structural_tag)
        if json_schema is not None:
            return ("json", json_schema)
        if regex is not None:
            return ("regex", regex)
        if ebnf is not None:
            return ("ebnf", ebnf)
        return None

    def get_grammar_async(self, **specs):
        """Non-blocking grammar lookup: a ready BaseGrammarObject (or None)
        on cache hit / trivial spec, else a GrammarFuture compiled in a
        worker thread. Concurrent requests for the same key share one
        compile."""
        key = self._cache_key(**specs)
        if key is None:
            return None
        with self._lock:
            hit = key in self._cache
        if hit:
            return self.get_grammar(**specs)    # cheap wrap of cached fsm
        import concurrent.futures

        with self._lock:
            fut = self._pending.get(key)
            if fut is None:
                if self._executor is None:
                    self._executor = concurrent.futures.ThreadPoolExecutor(
                        max_workers=2, thread_name_prefix="grammar-compile")
                fut = self._executor.submit(self._compile_entry, key, specs)
                self._pending[key] = fut
        return GrammarFuture(fut)

    def _compile_entry(self, key, specs):
        try:
            return self.get_grammar(**specs)
        finally:
            with self._lock:
                self._pending.pop(key, None)

    def get_grammar(self, *, regex: Optional[str] = None,
                    json_schema: Optional[str] = None,
                    ebnf: Optional[str] = None,
                    structural_tag: Optional[str] = None,
                    ) -> Optional[BaseGrammarObject]:
        if structural_tag is not None:
            return self._structural_tag_grammar(structural_tag)
        pushdown_src = None        # GBNF text -> pushdown engine
        if json_schema is not None:
            key = ("json", json_schema)
            pattern = None
        elif regex is not None:
            key = ("regex", regex)
            pattern = regex
        elif ebnf is not None:
            from iaas_sglang_tpu.constrained.ebnf import ebnf_to_regex

            key = ("ebnf", ebnf)
            try:
                pattern = ebnf_to_regex(ebnf)
            except ValueError as e:
                if "recursive" in str(e):
                    # recursive grammar: the pushdown engine handles full
                    # CFGs (reference xgrammar_backend.py:45 capability)
                    pattern, pushdown_src = None, ebnf
                else:
                    logger.warning("EBNF compile failed: %s", e)
                    return None
        else:
            return None
        with self._lock:
            fsm = self._cache.get(key)
        if fsm is None:
            if pattern is None and pushdown_src is None:
                import json as _json

                from iaas_sglang_tpu.constrained.json_schema import (
                    build_ebnf_from_schema,
                )

                try:
                    parsed = _json.loads(json_schema) \
                        if isinstance(json_schema, str) else json_schema
                except Exception:
                    parsed = None
                if parsed in (True, {}, None):
                    # unconstrained value: unbounded nesting -> pushdown
                    pushdown_src = build_ebnf_from_schema(parsed or {})
                else:
                    try:
                        pattern = build_regex_from_schema(json_schema)
                    except RecursionError:
                        # recursive $refs -> pushdown
                        pushdown_src = build_ebnf_from_schema(parsed)
            try:
                if pushdown_src is not None:
                    from iaas_sglang_tpu.constrained.pushdown import (
                        PushdownAutomaton,
                        PushdownTokenMask,
                    )

                    fsm = PushdownTokenMask(
                        PushdownAutomaton(pushdown_src), self.vocab)
                else:
                    fsm = TokenFSM(RegexDFA(pattern), self.vocab)
            except Exception as e:
                logger.warning("grammar compile failed: %s", e)
                return None
            with self._lock:
                self._cache[key] = fsm
        if isinstance(fsm, TokenFSM):
            return RegexGrammar(fsm)
        from iaas_sglang_tpu.constrained.pushdown import PushdownGrammar

        return PushdownGrammar(fsm)

    def _structural_tag_grammar(
            self, spec: str) -> Optional[StructuralTagGrammar]:
        """Compile a structural-tag spec: one union FSM over every
        structure's begin+schema+end, entered whenever a trigger fires."""
        import json
        import re as _re

        key = ("structural_tag", spec)
        with self._lock:
            fsm = self._cache.get(key)
        if fsm is None:
            try:
                obj = json.loads(spec)
                structs = obj["structures"]
                alts = []
                for s in structs:
                    body = build_regex_from_schema(s["schema"]) \
                        if s.get("schema") not in (None, "") else ""
                    alts.append(_re.escape(s["begin"]) + body
                                + _re.escape(s.get("end", "")))
                pattern = "(?:" + "|".join(alts) + ")"
                fsm = TokenFSM(RegexDFA(pattern), self.vocab)
            except Exception as e:
                logger.warning("structural_tag compile failed: %s", e)
                return None
            with self._lock:
                self._cache[key] = fsm
        try:
            triggers = [t.encode("utf-8")
                        for t in json.loads(spec).get("triggers", [])]
        except Exception:
            triggers = []
        if not triggers:
            # no triggers: every structure's begin is its own trigger
            try:
                triggers = [s["begin"].encode("utf-8")
                            for s in json.loads(spec)["structures"]]
            except Exception:
                return None
        # keep only triggers the union FSM can actually consume
        live = [t for t in triggers
                if fsm.dfa.step_bytes(fsm.dfa.start, t) != fsm.dfa.DEAD]
        if not live:
            logger.warning(
                "structural_tag: no trigger is a prefix of any structure")
            return None
        return StructuralTagGrammar(fsm, live)


def create_grammar_backend(tokenizer) -> Optional[BaseGrammarBackend]:
    if tokenizer is None:
        return None
    return BaseGrammarBackend(tokenizer)
