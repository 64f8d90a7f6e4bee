"""TokenizerManager: tokenizes requests, fans them to the scheduler over
ZMQ, and streams per-rid outputs back to waiting coroutines
(analog of sglang srt/managers/tokenizer_manager.py:168 TokenizerManager,
:132 ReqState, :1812 _Communicator).
"""

from __future__ import annotations

import asyncio
import dataclasses
from typing import Any, AsyncGenerator, Dict, Optional

import zmq
import zmq.asyncio

from iaas_sglang_tpu.managers.io_struct import (
    AbortReq,
    BatchEmbeddingOut,
    BatchStrOut,
    TokenizedEmbeddingReqInput,
    FlushCacheReqInput,
    FlushCacheReqOutput,
    GenerateReqInput,
    GetInternalStateReq,
    GetInternalStateReqOutput,
    TokenizedGenerateReqInput,
)
from iaas_sglang_tpu.sampling.sampling_params import SamplingParams
from iaas_sglang_tpu.server_args import PortArgs, ServerArgs
from iaas_sglang_tpu.utils import logger


@dataclasses.dataclass
class ReqState:
    queue: asyncio.Queue
    text: str = ""
    output_ids: list = dataclasses.field(default_factory=list)
    finished: bool = False
    created_at: float = 0.0
    first_token_at: float = 0.0
    last_token_at: float = 0.0


class TokenizerManager:
    def __init__(self, server_args: ServerArgs, port_args: PortArgs,
                 tokenizer=None):
        self.server_args = server_args
        self.context = zmq.asyncio.Context(2)
        self.send_to_scheduler = self.context.socket(zmq.PUSH)
        self.send_to_scheduler.connect(port_args.scheduler_ipc)
        self.recv_from_detokenizer = self.context.socket(zmq.PULL)
        self.recv_from_detokenizer.bind(port_args.tokenizer_ipc)

        self.tokenizer = tokenizer
        if tokenizer is None and not server_args.skip_tokenizer_init:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                server_args.tokenizer_path)

        self.states: Dict[str, ReqState] = {}
        # outputs for requests this process never submitted (PD decode side)
        self.external_outputs: Dict[str, dict] = {}
        self._external_waiters: Dict[str, asyncio.Future] = {}
        self._rpc_futures: Dict[type, asyncio.Future] = {}
        self._handle_task: Optional[asyncio.Task] = None

        self.metrics = None
        if server_args.enable_metrics:
            from iaas_sglang_tpu.metrics.collector import (
                TokenizerMetricsCollector,
            )

            self.metrics = TokenizerMetricsCollector(
                labels={"model_name": server_args.served_model_name},
                ttft_buckets=server_args.bucket_time_to_first_token,
                itl_buckets=server_args.bucket_inter_token_latency,
                e2e_buckets=server_args.bucket_e2e_request_latency)

    def start(self) -> None:
        if self._handle_task is None:
            self._handle_task = asyncio.get_running_loop().create_task(
                self.handle_loop())

    def _get_mm_processor(self):
        if not hasattr(self, "_mm_processor"):
            from iaas_sglang_tpu.configs.model_config import ModelConfig
            from iaas_sglang_tpu.multimodal import MultimodalProcessor

            cfg = ModelConfig.from_path(self.server_args.model_path)
            if not cfg.is_multimodal:
                raise ValueError("model is not multimodal")
            self._mm_processor = MultimodalProcessor(cfg)
        return self._mm_processor

    # ------------------------------------------------------------- requests

    async def generate_request(
        self, gri: GenerateReqInput
    ) -> AsyncGenerator[dict, None]:
        """Submit one (non-batched) request; yields output dicts
        (incremental when gri.stream)."""
        self.start()
        ids = gri.input_ids
        if ids is None:
            assert self.tokenizer is not None, "text input needs a tokenizer"
            ids = self.tokenizer.encode(gri.text)
        mm_items = None
        if gri.image_data is not None or gri.audio_data is not None:
            ids, mm_items = self._get_mm_processor().process(
                ids, gri.image_data, audio_data=gri.audio_data)
        sp = SamplingParams.from_dict(
            gri.sampling_params if isinstance(gri.sampling_params, dict)
            else None)
        import time as _time

        state = ReqState(queue=asyncio.Queue(), created_at=_time.monotonic())
        self.states[gri.rid] = state
        await self.send_to_scheduler.send_pyobj(TokenizedGenerateReqInput(
            rid=gri.rid, input_text=gri.text, input_ids=ids,
            sampling_params=sp, stream=gri.stream,
            return_logprob=gri.return_logprob,
            logprob_start_len=gri.logprob_start_len,
            top_logprobs_num=gri.top_logprobs_num,
            token_ids_logprob=gri.token_ids_logprob,
            disagg_decode_url=gri.disagg_decode_url,
            session_id=gri.session_id,
            lora_path=gri.lora_path,
            mm_items=mm_items,
        ))
        try:
            while True:
                chunk = await asyncio.wait_for(
                    state.queue.get(), timeout=self.server_args.watchdog_timeout)
                yield chunk
                if chunk["meta_info"]["finish_reason"] is not None:
                    break
        finally:
            self.states.pop(gri.rid, None)

    async def embed_request(self, texts=None, input_ids=None) -> list:
        """Embedding requests over the manager ring (analog of
        EmbeddingReqInput handling, tokenizer_manager.py; serving_embedding).
        Returns a list of {"embedding": [...], "meta_info": ...}."""
        import uuid as _uuid

        self.start()
        if texts is not None and isinstance(texts, str):
            texts = [texts]
        if input_ids is not None and input_ids and not isinstance(
                input_ids[0], list):
            input_ids = [input_ids]
        n = len(texts) if texts is not None else len(input_ids)
        rids, queues = [], []
        for i in range(n):
            ids = (input_ids[i] if input_ids is not None
                   else self.tokenizer.encode(texts[i]))
            rid = _uuid.uuid4().hex
            q = asyncio.Queue()
            self.states[rid] = ReqState(queue=q)
            await self.send_to_scheduler.send_pyobj(TokenizedEmbeddingReqInput(
                rid=rid,
                input_text=texts[i] if texts is not None else None,
                input_ids=ids))
            rids.append(rid)
            queues.append(q)
        outs = []
        try:
            for rid, q in zip(rids, queues):
                outs.append(await asyncio.wait_for(
                    q.get(), timeout=self.server_args.watchdog_timeout))
        finally:
            for rid in rids:
                self.states.pop(rid, None)
        return outs

    async def score_request(self, query=None, items=None,
                            label_token_ids=None, apply_softmax=False,
                            item_first=False) -> list:
        """The scoring API (analog of tokenizer_manager.py:1680
        score_request / serving_score.py): for each item, run
        query+item with max_new_tokens=1 and return the logprobs (or
        softmax probs) of the given label tokens at the first generated
        position."""
        import math
        import uuid as _uuid

        if label_token_ids is None:
            raise ValueError("label_token_ids must be provided")
        if isinstance(items, str):
            items = [items]
        elif isinstance(items, list) and items and isinstance(items[0], int):
            items = [items]  # a single pre-tokenized item
        if isinstance(query, str):
            prompts = [f"{item}{query}" if item_first else f"{query}{item}"
                       for item in items]
            gris = [GenerateReqInput(
                rid=_uuid.uuid4().hex, text=p,
                sampling_params={"max_new_tokens": 1, "temperature": 0.0},
                token_ids_logprob=list(label_token_ids)) for p in prompts]
        else:
            ids_list = [(item + query) if item_first else (query + item)
                        for item in items]
            gris = [GenerateReqInput(
                rid=_uuid.uuid4().hex, input_ids=ids,
                sampling_params={"max_new_tokens": 1, "temperature": 0.0},
                token_ids_logprob=list(label_token_ids)) for ids in ids_list]
        scores = []
        for gri in gris:
            final = None
            async for chunk in self.generate_request(gri):
                final = chunk
            lps = final["meta_info"].get("output_token_ids_logprobs")
            row = {int(t): float(v) for v, t in lps[0]} if lps else {}
            vals = [row.get(int(t), float("-inf")) for t in label_token_ids]
            if apply_softmax:
                m = max(vals)
                exps = [math.exp(v - m) for v in vals]
                z = sum(exps) or 1.0
                vals = [e / z for e in exps]
            scores.append(vals)
        return scores

    async def abort_request(self, rid: str) -> None:
        await self.send_to_scheduler.send_pyobj(AbortReq(rid=rid))

    # ----------------------------------------------------------------- RPCs

    async def _rpc(self, req, resp_type):
        self.start()
        fut = asyncio.get_running_loop().create_future()
        self._rpc_futures[resp_type] = fut
        await self.send_to_scheduler.send_pyobj(req)
        return await asyncio.wait_for(fut, timeout=60)

    async def flush_cache(self) -> FlushCacheReqOutput:
        return await self._rpc(FlushCacheReqInput(), FlushCacheReqOutput)

    async def open_session(self, session_id=None):
        from iaas_sglang_tpu.managers.io_struct import (
            OpenSessionReqInput, OpenSessionReqOutput)

        return await self._rpc(
            OpenSessionReqInput(session_id=session_id), OpenSessionReqOutput)

    async def close_session(self, session_id: str) -> None:
        from iaas_sglang_tpu.managers.io_struct import CloseSessionReqInput

        # fire-and-forget: the scheduler sends no reply for close
        self.start()
        await self.send_to_scheduler.send_pyobj(
            CloseSessionReqInput(session_id=session_id))

    async def get_internal_state(self) -> dict:
        out = await self._rpc(GetInternalStateReq(), GetInternalStateReqOutput)
        return out.state

    def _resolve_external(self, rid: str, out, i: int) -> None:
        result = {
            "text": out.output_strs[i],
            "output_ids": out.output_ids[i],
            "meta_info": {
                "id": rid,
                "finish_reason": out.finished_reasons[i],
                "prompt_tokens": out.prompt_tokens[i],
                "completion_tokens": out.completion_tokens[i],
                "cached_tokens": out.cached_tokens[i],
            },
        }
        fut = self._external_waiters.pop(rid, None)
        if fut is not None and not fut.done():
            fut.set_result(result)
        else:
            self.external_outputs[rid] = result

    async def wait_external(self, rid: str, timeout: float = 600.0) -> dict:
        """Await the final output of a request ingested via PD handoff."""
        self.start()
        if rid in self.external_outputs:
            return self.external_outputs.pop(rid)
        fut = asyncio.get_running_loop().create_future()
        self._external_waiters[rid] = fut
        try:
            return await asyncio.wait_for(fut, timeout=timeout)
        finally:
            self._external_waiters.pop(rid, None)

    # ------------------------------------------------------------ dispatch

    async def handle_loop(self) -> None:
        while True:
            msg = await self.recv_from_detokenizer.recv_pyobj()
            if isinstance(msg, BatchStrOut):
                self._handle_batch_str(msg)
            elif isinstance(msg, BatchEmbeddingOut):
                for i, rid in enumerate(msg.rids):
                    state = self.states.get(rid)
                    if state is not None:
                        state.queue.put_nowait({
                            "embedding": msg.embeddings[i],
                            "meta_info": {
                                "id": rid,
                                "prompt_tokens": msg.prompt_tokens[i],
                            },
                        })
            else:
                fut = self._rpc_futures.pop(type(msg), None)
                if fut is not None and not fut.done():
                    fut.set_result(msg)
                else:
                    logger.warning("tokenizer mgr: unexpected %s", type(msg))

    def _handle_batch_str(self, out: BatchStrOut) -> None:
        import time as _time

        now = _time.monotonic()
        for i, rid in enumerate(out.rids):
            state = self.states.get(rid)
            if state is None:
                if out.finished_reasons[i] is not None:
                    self._resolve_external(rid, out, i)
                continue
            if self.metrics is not None:
                if state.first_token_at == 0.0:
                    state.first_token_at = now
                    self.metrics.observe_time_to_first_token(
                        now - state.created_at)
                elif state.last_token_at:
                    self.metrics.observe_inter_token_latency(
                        now - state.last_token_at)
                state.last_token_at = now
                if out.finished_reasons[i] is not None:
                    self.metrics.observe_one_finished_request(
                        out.prompt_tokens[i], out.completion_tokens[i],
                        now - state.created_at)
            state.text += out.output_strs[i]
            state.output_ids = out.output_ids[i]
            fin = out.finished_reasons[i]
            state.finished = fin is not None
            meta = {
                "id": rid,
                "finish_reason": fin,
                "prompt_tokens": out.prompt_tokens[i],
                "completion_tokens": out.completion_tokens[i],
                "cached_tokens": out.cached_tokens[i],
            }
            if out.output_token_logprobs and out.output_token_logprobs[i] is not None:
                meta["output_token_logprobs"] = out.output_token_logprobs[i]
            if getattr(out, "output_token_ids_logprobs", None) \
                    and out.output_token_ids_logprobs[i] is not None:
                meta["output_token_ids_logprobs"] = \
                    out.output_token_ids_logprobs[i]
            if getattr(out, "input_token_logprobs", None) \
                    and out.input_token_logprobs[i] is not None:
                meta["input_token_logprobs"] = out.input_token_logprobs[i]
            if out.output_top_logprobs and out.output_top_logprobs[i] is not None:
                meta["output_top_logprobs"] = out.output_top_logprobs[i]
            state.queue.put_nowait({
                "text": state.text,
                "output_ids": list(state.output_ids),
                "meta_info": meta,
            })
