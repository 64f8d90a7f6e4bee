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


class BaseGrammarBackend:
    """Compiles and caches grammar automata keyed by (type, spec)."""

    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.vocab = TokenVocab.get(tokenizer)
        self._cache: Dict[Tuple[str, str], TokenFSM] = {}
        self._lock = threading.Lock()

    def get_grammar(self, *, regex: Optional[str] = None,
                    json_schema: Optional[str] = None,
                    ebnf: Optional[str] = None) -> Optional[BaseGrammarObject]:
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
                logger.warning("EBNF compile failed: %s", e)
                return None
        else:
            return None
        with self._lock:
            fsm = self._cache.get(key)
        if fsm is None:
            if pattern is None:
                pattern = build_regex_from_schema(json_schema)
            try:
                fsm = TokenFSM(RegexDFA(pattern), self.vocab)
            except Exception as e:
                logger.warning("grammar compile failed: %s", e)
                return None
            with self._lock:
                self._cache[key] = fsm
        return RegexGrammar(fsm)


def create_grammar_backend(tokenizer) -> Optional[BaseGrammarBackend]:
    if tokenizer is None:
        return None
    return BaseGrammarBackend(tokenizer)
