"""KV cache events: radix block stored/removed notifications published
over ZMQ for external cache-aware routers
(analog of sglang srt/disaggregation/kv_events.py:79,119 — emitted from
radix_cache.py:471-518, published by scheduler:2665)."""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional

import zmq


@dataclasses.dataclass
class BlockStored:
    block_hashes: List[int]       # one hash per page
    token_ids: List[int]
    parent_block_hash: Optional[int]
    ts: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class BlockRemoved:
    block_hashes: List[int]
    ts: float = dataclasses.field(default_factory=time.time)


@dataclasses.dataclass
class AllBlocksCleared:
    ts: float = dataclasses.field(default_factory=time.time)


class KVEventPublisher:
    """Buffers events and publishes batches on a ZMQ PUB socket."""

    def __init__(self, endpoint: str):
        self._ctx = zmq.Context.instance()
        self.sock = self._ctx.socket(zmq.PUB)
        self.sock.bind(endpoint)
        self._buffer: list = []

    def record(self, event) -> None:
        self._buffer.append(event)

    def publish(self) -> int:
        if not self._buffer:
            return 0
        n = len(self._buffer)
        self.sock.send_pyobj(self._buffer)
        self._buffer = []
        return n


def page_hash(token_ids: List[int], parent_hash: int = 0) -> int:
    """Stable content hash of a page chained to its prefix."""
    return hash((parent_hash, tuple(token_ids))) & 0x7FFFFFFFFFFFFFFF
