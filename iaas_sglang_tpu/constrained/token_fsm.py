"""Token-level FSM on top of the byte DFA.

Maps tokenizer vocab onto the byte DFA: a trie over every token's UTF-8
bytes is walked per DFA state, pruning dead branches, yielding the set of
tokens that keep the automaton alive plus each token's destination state.
Results are cached per DFA state — the same lazy-index idea as Outlines'
fsm index (reference srt/constrained/outlines_backend.py), built
from scratch.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from iaas_sglang_tpu.constrained.regex_engine import RegexDFA


class _TrieNode:
    __slots__ = ("children", "token_ids")

    def __init__(self):
        self.children: Dict[int, "_TrieNode"] = {}
        self.token_ids: List[int] = []


class TokenVocab:
    """Token-id -> byte-string table + trie, shared across grammars."""

    _cache: Dict[int, "TokenVocab"] = {}

    def __init__(self, tokenizer):
        self.vocab_size = len(tokenizer)
        self.eos_token_id = tokenizer.eos_token_id
        self.token_bytes: List[Optional[bytes]] = [None] * self.vocab_size
        # decode each token id individually (robust across tokenizers)
        special = set(tokenizer.all_special_ids or [])
        for tid in range(self.vocab_size):
            if tid in special:
                continue  # special tokens never match grammar text
            try:
                text = tokenizer.decode([tid])
            except Exception:
                continue
            if "�" in text:
                # byte-fallback/partial tokens: use convert_ids_to_tokens
                # byte-level representation when possible
                continue
            self.token_bytes[tid] = text.encode("utf-8")
        self.root = _TrieNode()
        for tid, bs in enumerate(self.token_bytes):
            if bs is None or bs == b"":
                continue
            node = self.root
            for b in bs:
                node = node.children.setdefault(b, _TrieNode())
            node.token_ids.append(tid)

    @classmethod
    def get(cls, tokenizer) -> "TokenVocab":
        key = id(tokenizer)
        if key not in cls._cache:
            cls._cache[key] = cls(tokenizer)
        return cls._cache[key]


class TokenFSM:
    """Per-grammar automaton state with per-DFA-state token masks."""

    def __init__(self, dfa: RegexDFA, vocab: TokenVocab):
        self.dfa = dfa
        self.vocab = vocab
        self._mask_cache: Dict[int, Tuple[np.ndarray, Dict[int, int]]] = {}

    def allowed(self, state: int) -> Tuple[np.ndarray, Dict[int, int]]:
        """(bool mask [V], {token_id: next_state}) for a DFA state."""
        hit = self._mask_cache.get(state)
        if hit is not None:
            return hit
        mask = np.zeros(self.vocab.vocab_size, dtype=bool)
        nexts: Dict[int, int] = {}
        stack = [(self.vocab.root, state)]
        while stack:
            node, st = stack.pop()
            for tid in node.token_ids:
                mask[tid] = True
                nexts[tid] = st
            for b, child in node.children.items():
                ns = self.dfa.step(st, b)
                if ns != self.dfa.DEAD:
                    stack.append((child, ns))
        if self.dfa.is_accepting(state) and self.vocab.eos_token_id is not None:
            mask[self.vocab.eos_token_id] = True
        self._mask_cache[state] = (mask, nexts)
        return mask, nexts
