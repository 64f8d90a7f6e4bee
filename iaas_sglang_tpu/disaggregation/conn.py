"""PD-disaggregation KV transfer
(analog of sglang srt/disaggregation/base/conn.py + mooncake/nixl
backends — the RDMA engines become a ZMQ/DCN page transfer here; `fake`
mirrors disaggregation/fake/conn.py:18 for logic tests without data).

Payload: one message per handed-off request carrying the token state and
the request's KV pages for every layer. The decode side allocates fresh
pages and scatters the data in — the prefill and decode servers never
share an address space.
"""

from __future__ import annotations

import dataclasses
import enum
import pickle
from typing import List, Optional

import numpy as np
import zmq


class KVPoll(enum.IntEnum):
    Bootstrapping = 0
    WaitingForInput = 1
    Transferring = 2
    Success = 3
    Failed = 4


@dataclasses.dataclass
class KVTransferPayload:
    rid: str
    input_ids: List[int]
    output_ids: List[int]       # first sampled token(s)
    fill_len: int               # tokens whose KV is included
    kv_data: Optional[np.ndarray]   # [n_pages*L, ps, 2Nk, D] or None (fake)
    sampling_params: object = None
    stream: bool = False


class KVSender:
    """Prefill side: ships a finished-prefill request to a decode server."""

    def __init__(self, backend: str = "zmq"):
        self.backend = backend
        self._ctx = zmq.Context.instance()
        self._socks: dict[str, zmq.Socket] = {}

    def _sock(self, url: str) -> zmq.Socket:
        if url not in self._socks:
            s = self._ctx.socket(zmq.PUSH)
            s.connect(url)
            self._socks[url] = s
        return self._socks[url]

    def send(self, url: str, payload: KVTransferPayload) -> KVPoll:
        if self.backend == "fake":
            payload = dataclasses.replace(payload, kv_data=None)
        try:
            self._sock(url).send_pyobj(payload)
            return KVPoll.Success
        except zmq.ZMQError:
            return KVPoll.Failed


class KVReceiver:
    """Decode side: bound ingest socket polled by the scheduler loop."""

    def __init__(self, bind_url: str):
        self._ctx = zmq.Context.instance()
        self.sock = self._ctx.socket(zmq.PULL)
        self.sock.bind(bind_url)

    def poll(self) -> Optional[KVTransferPayload]:
        try:
            return self.sock.recv_pyobj(zmq.NOBLOCK)
        except zmq.Again:
            return None
