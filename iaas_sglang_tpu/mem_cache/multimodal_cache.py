"""Multimodal embedding cache (analog of the reference's
mem_cache/multimodal_cache.py:6 MultiModalCache): projected vision
embeddings keyed by image-content hash, LRU-evicted by byte budget.
A hit skips the whole vision tower on repeat images (multi-turn chat over
the same image, shared few-shot image prompts)."""

from __future__ import annotations

from collections import OrderedDict

import numpy as np


class MultiModalCache:
    def __init__(self, max_bytes: int = 512 * 1024 * 1024):
        self.max_bytes = max_bytes
        self._store: OrderedDict[str, np.ndarray] = OrderedDict()
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    def get(self, key: str):
        emb = self._store.get(key)
        if emb is None:
            self.misses += 1
            return None
        self._store.move_to_end(key)
        self.hits += 1
        return emb

    def put(self, key: str, emb: np.ndarray) -> None:
        if key in self._store:
            self._store.move_to_end(key)
            return
        self._store[key] = emb
        self._bytes += emb.nbytes
        while self._bytes > self.max_bytes and len(self._store) > 1:
            _, old = self._store.popitem(last=False)
            self._bytes -= old.nbytes

    def clear(self) -> None:
        self._store.clear()
        self._bytes = 0
