"""PD-disaggregation KV transfer
(analog of sglang srt/disaggregation/base/conn.py + mooncake/nixl
backends — the RDMA engines become a ZMQ/DCN page transfer here; `fake`
mirrors disaggregation/fake/conn.py:18 for logic tests without data).

Wire protocol (streamed, reference mooncake/conn.py:884 ships per-layer
chunks overlapped with compute): a HEADER message carries the token
state and the chunk count, then N CHUNK messages each carry a bounded
page-slice of KV (all layers). The decode side preallocates pages on
the header and scatters chunks as they arrive between decode steps —
a long prompt no longer stalls the decode loop behind one multi-GB
pickle blob, and the prefill side overlaps the device->host gather of
chunk i+1 with the socket send of chunk i."""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional

import numpy as np
import zmq

# chunk payload target (bytes of KV per CHUNK message)
CHUNK_BYTES = 8 << 20


class KVPoll(enum.IntEnum):
    Bootstrapping = 0
    WaitingForInput = 1
    Transferring = 2
    Success = 3
    Failed = 4


@dataclasses.dataclass
class KVTransferPayload:
    """HEADER: token state + transfer plan (no KV data)."""
    rid: str
    input_ids: List[int]
    output_ids: List[int]       # first sampled token(s)
    fill_len: int               # tokens whose KV follows in chunks
    n_chunks: int = 0           # 0 = fake backend (no data)
    chunk_pages: int = 0        # pages per full chunk
    sampling_params: object = None
    stream: bool = False
    # legacy single-blob field kept for wire compat with r1 peers
    kv_data: Optional[np.ndarray] = None


@dataclasses.dataclass
class KVChunk:
    rid: str
    idx: int                    # chunk index in [0, n_chunks)
    data: np.ndarray            # [len(page_slice)*L, ps, ne, ed]


class KVSender:
    """Prefill side: ships a finished-prefill request to a decode server,
    streaming KV in page chunks with the NEXT chunk's device->host gather
    in flight while the current one serializes onto the socket."""

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

    def send_request(self, url: str, payload: KVTransferPayload,
                     pages: np.ndarray, runner) -> KVPoll:
        """Stream one handed-off request: header, then KV page chunks
        gathered via runner.gather_kv_pages_async (pipelined)."""
        try:
            sock = self._sock(url)
            if self.backend == "fake":
                payload = dataclasses.replace(
                    payload, n_chunks=0, kv_data=None)
                sock.send_pyobj(payload)
                return KVPoll.Success
            page_bytes = runner.kv_page_bytes_all_layers()
            cp = max(1, CHUNK_BYTES // max(page_bytes, 1))
            slices = [pages[i:i + cp] for i in range(0, len(pages), cp)]
            payload = dataclasses.replace(
                payload, n_chunks=len(slices), chunk_pages=cp, kv_data=None)
            sock.send_pyobj(payload)
            pending = (runner.gather_kv_pages_async(slices[0])
                       if slices else None)
            for i in range(len(slices)):
                nxt = (runner.gather_kv_pages_async(slices[i + 1])
                       if i + 1 < len(slices) else None)
                sock.send_pyobj(KVChunk(
                    rid=payload.rid, idx=i, data=np.asarray(pending)))
                pending = nxt
            return KVPoll.Success
        except zmq.ZMQError:
            return KVPoll.Failed

    def send(self, url: str, payload: KVTransferPayload) -> KVPoll:
        """Legacy single-blob send (tests / r1 wire compat)."""
        if self.backend == "fake":
            payload = dataclasses.replace(payload, kv_data=None)
        try:
            self._sock(url).send_pyobj(payload)
            return KVPoll.Success
        except zmq.ZMQError:
            return KVPoll.Failed


class KVReceiver:
    """Decode side: bound ingest socket polled by the scheduler loop.
    Returns raw messages (KVTransferPayload headers / KVChunk parts);
    the scheduler assembles streams per rid."""

    def __init__(self, bind_url: str):
        self._ctx = zmq.Context.instance()
        self.sock = self._ctx.socket(zmq.PULL)
        self.sock.bind(bind_url)

    def poll(self):
        try:
            return self.sock.recv_pyobj(zmq.NOBLOCK)
        except zmq.Again:
            return None
