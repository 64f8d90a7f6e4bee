"""Incremental detokenization with stop-string trimming
(analog of sglang srt/managers/detokenizer_manager.py:68 DetokenizerManager,
:57 DecodeStatus).

Runs either embedded (Engine/HTTP server calls `handle_batch` directly) or
as a subprocess in the ZMQ ring: scheduler -> detokenizer -> tokenizer
manager.

The incremental algorithm mirrors the reference: keep per-rid offsets into
the growing output-id list; decode [surr_offset:] and emit only text beyond
read_offset once it no longer ends in a replacement char (incomplete UTF-8
from a split multi-byte token).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Optional

from iaas_sglang_tpu.managers.io_struct import BatchStrOut, BatchTokenIDOut
from iaas_sglang_tpu.utils import logger


@dataclass
class DecodeStatus:
    decoded_text: str = ""
    decode_ids_offset: int = 0   # ids already consumed into decoded_text
    surr_offset: int = 0         # start of the "unstable" tail window
    sent_offset: int = 0         # chars already emitted downstream


class LimitedCapacityDict(dict):
    """Bounded per-rid state (detokenizer_manager.py:251)."""

    def __init__(self, capacity: int = 1 << 15):
        super().__init__()
        self.capacity = capacity

    def __setitem__(self, key, value):
        if self.capacity and len(self) >= self.capacity and key not in self:
            self.pop(next(iter(self)))
        super().__setitem__(key, value)


class Detokenizer:
    def __init__(self, tokenizer):
        self.tokenizer = tokenizer
        self.states: Dict[str, DecodeStatus] = LimitedCapacityDict()

    def handle_batch(self, batch: BatchTokenIDOut) -> BatchStrOut:
        out_strs, out_ids = [], []
        for i, rid in enumerate(batch.rids):
            ids = batch.decode_ids[i]
            fin = batch.finished_reasons[i]
            if self.tokenizer is None:
                # --skip-tokenizer-init: token-id pass-through (clients
                # consume output_ids; there is no text to detokenize)
                out_strs.append("")
                out_ids.append(ids)
                continue
            skip_special = batch.skip_special_tokens[i]
            st = self.states.get(rid)
            if st is None:
                st = self.states[rid] = DecodeStatus()

            # decode the unstable window [surr_offset:]
            window = ids[st.surr_offset:]
            text = self.tokenizer.decode(
                window, skip_special_tokens=skip_special,
            ) if window else ""
            if not fin and text.endswith("�"):
                # partial multi-byte sequence: hold the tail back
                new_text = ""
            else:
                new_text = text
                st.decoded_text += new_text
                st.surr_offset = len(ids)

            full = st.decoded_text
            if fin is not None:
                # stop-string trimming (the matched stop is not emitted)
                matched = fin.get("matched")
                if (
                    isinstance(matched, str)
                    and not batch.no_stop_trim[i]
                    and matched in full
                ):
                    full = full[: full.index(matched)]
            emit = full[st.sent_offset:]
            st.sent_offset = len(full)
            out_strs.append(emit)
            out_ids.append(ids)
            if fin is not None:
                self.states.pop(rid, None)
        return BatchStrOut(
            rids=batch.rids,
            output_strs=out_strs,
            finished_reasons=batch.finished_reasons,
            prompt_tokens=batch.prompt_tokens,
            completion_tokens=batch.completion_tokens,
            cached_tokens=batch.cached_tokens,
            output_ids=out_ids,
            output_token_logprobs=batch.output_token_logprobs,
            output_token_ids_logprobs=batch.output_token_ids_logprobs,
            input_token_logprobs=batch.input_token_logprobs,
            output_top_logprobs=batch.output_top_logprobs,
        )


def run_detokenizer_process(server_args, port_args):
    """Subprocess entry: ZMQ pull from scheduler, push to tokenizer manager
    (analog of detokenizer_manager.py:264 run_detokenizer_process)."""
    import zmq

    from transformers import AutoTokenizer

    from iaas_sglang_tpu.utils import configure_logger

    configure_logger(prefix=" detok")
    # --skip-tokenizer-init servers have no tokenizer files on disk; the
    # detokenizer then runs in token-id pass-through mode
    tokenizer = None if server_args.skip_tokenizer_init else \
        AutoTokenizer.from_pretrained(server_args.tokenizer_path)
    detok = Detokenizer(tokenizer)

    ctx = zmq.Context(2)
    recv = ctx.socket(zmq.PULL)
    recv.bind(port_args.detokenizer_ipc)
    send = ctx.socket(zmq.PUSH)
    send.connect(port_args.tokenizer_ipc)

    while True:
        batch = recv.recv_pyobj()
        if isinstance(batch, BatchTokenIDOut):
            send.send_pyobj(detok.handle_batch(batch))
        else:
            # RPC responses ride this socket untouched (flush/abort/state)
            send.send_pyobj(batch)
