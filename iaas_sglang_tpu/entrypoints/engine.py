"""Engine: the public offline/embedded inference API
(analog of sglang srt/entrypoints/engine.py:87).

Embedded mode drives the Scheduler synchronously in-process — the TPU
stack has a single controller owning all local chips, so the reference's
per-GPU subprocess tree collapses to one process; the ZMQ server mode
(http_server.py) wraps this same scheduler in a process ring for serving.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Union

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.managers.io_struct import (
    BatchEmbeddingOut,
    BatchTokenIDOut,
    GenerateReqInput,
    TokenizedEmbeddingReqInput,
    TokenizedGenerateReqInput,
)
from iaas_sglang_tpu.managers.scheduler import Scheduler
from iaas_sglang_tpu.sampling.sampling_params import SamplingParams
from iaas_sglang_tpu.server_args import ServerArgs
from iaas_sglang_tpu.utils import configure_logger, logger


class Engine:
    def __init__(
        self,
        server_args: Optional[ServerArgs] = None,
        *,
        hf_config_override: Optional[dict] = None,
        tokenizer=None,
        **kwargs,
    ):
        if server_args is None:
            field_names = {f.name for f in dataclasses.fields(ServerArgs)}
            server_args = ServerArgs(
                **{k: v for k, v in kwargs.items() if k in field_names}
            )
        self.server_args = server_args
        configure_logger()

        if hf_config_override is not None:
            self.model_config = ModelConfig.from_hf(
                hf_config_override, model_path=server_args.model_path,
                context_length=server_args.context_length,
                dtype=server_args.dtype,
            )
        else:
            self.model_config = ModelConfig.from_path(
                server_args.model_path,
                context_length=server_args.context_length,
                dtype=server_args.dtype,
            )

        self.tokenizer = tokenizer
        if self.tokenizer is None and not server_args.skip_tokenizer_init:
            from transformers import AutoTokenizer

            self.tokenizer = AutoTokenizer.from_pretrained(
                server_args.tokenizer_path
            )

        self._outputs: Dict[str, dict] = {}
        self.scheduler = Scheduler(
            server_args, self.model_config,
            tokenizer=self.tokenizer,
            out_callback=self._collect_output,
        )

    # ------------------------------------------------------------- internal

    def _collect_output(self, out) -> None:
        if isinstance(out, BatchEmbeddingOut):
            for i, rid in enumerate(out.rids):
                self._outputs[rid] = {
                    "embedding": out.embeddings[i],
                    "prompt_tokens": out.prompt_tokens[i],
                    "finished": {"type": "length"},
                }
            return
        self._collect_token_output(out)

    def _collect_token_output(self, out: BatchTokenIDOut) -> None:
        for i, rid in enumerate(out.rids):
            st = self._outputs.setdefault(rid, {"output_ids": [], "finished": None})
            st["output_ids"] = list(out.decode_ids[i])
            st["finished"] = out.finished_reasons[i]
            st["prompt_tokens"] = out.prompt_tokens[i]
            st["completion_tokens"] = out.completion_tokens[i]
            st["cached_tokens"] = out.cached_tokens[i]
            st["stop_strs"] = out.stop_strs[i]
            st["no_stop_trim"] = out.no_stop_trim[i]
            st["skip_special_tokens"] = out.skip_special_tokens[i]
            if out.output_token_logprobs and out.output_token_logprobs[i] is not None:
                st["output_token_logprobs"] = out.output_token_logprobs[i]
            if getattr(out, "output_token_ids_logprobs", None) \
                    and out.output_token_ids_logprobs[i] is not None:
                st["output_token_ids_logprobs"] = \
                    out.output_token_ids_logprobs[i]
            if getattr(out, "input_token_logprobs", None) \
                    and out.input_token_logprobs[i] is not None:
                st["input_token_logprobs"] = out.input_token_logprobs[i]
            if out.output_top_logprobs and out.output_top_logprobs[i] is not None:
                st["output_top_logprobs"] = out.output_top_logprobs[i]

    # --------------------------------------------------------------- public

    def generate(
        self,
        prompt: Optional[Union[str, List[str]]] = None,
        sampling_params: Optional[Union[Dict, List[Dict]]] = None,
        input_ids: Optional[Union[List[int], List[List[int]]]] = None,
        return_logprob: bool = False,
        logprob_start_len: int = -1,
        top_logprobs_num: int = 0,
        session_id: Optional[str] = None,
        lora_path: Optional[str] = None,
        rid=None,
        token_ids_logprob=None,
        image_data=None,
        audio_data=None,
    ) -> Union[dict, List[dict]]:
        gri = GenerateReqInput(
            text=prompt, input_ids=input_ids, sampling_params=sampling_params,
            return_logprob=return_logprob, top_logprobs_num=top_logprobs_num,
            logprob_start_len=logprob_start_len,
            session_id=session_id, lora_path=lora_path, rid=rid,
            token_ids_logprob=token_ids_logprob, image_data=image_data,
            audio_data=audio_data,
        )
        was_batch = gri.is_batch()
        singles = gri.normalize()
        rids = []
        for g in singles:
            ids = g.input_ids
            if ids is None:
                assert self.tokenizer is not None, \
                    "text input requires a tokenizer"
                ids = self.tokenizer.encode(g.text)
            sp = SamplingParams.from_dict(g.sampling_params)
            mm_items = None
            if g.image_data is not None or g.audio_data is not None:
                if not self.model_config.is_multimodal:
                    raise ValueError("model is not multimodal")
                if not hasattr(self, "_mm_processor"):
                    from iaas_sglang_tpu.multimodal import MultimodalProcessor

                    self._mm_processor = MultimodalProcessor(self.model_config)
                ids, mm_items = self._mm_processor.process(
                    ids, g.image_data, audio_data=g.audio_data)
            self.scheduler.process_input(TokenizedGenerateReqInput(
                rid=g.rid, input_text=g.text, input_ids=ids,
                sampling_params=sp, stream=False, mm_items=mm_items,
                return_logprob=g.return_logprob,
                logprob_start_len=g.logprob_start_len,
                top_logprobs_num=g.top_logprobs_num,
                token_ids_logprob=g.token_ids_logprob,
                session_id=g.session_id,
                lora_path=g.lora_path,
            ))
            rids.append(g.rid)

        # drive the event loop until all requests finish
        while any(
            self._outputs.get(r, {}).get("finished") is None for r in rids
        ):
            progressed = self.scheduler.step()
            if not progressed and self.scheduler.has_work():
                if self.scheduler.grammar_queue:
                    # grammars compiling in the worker thread; poll again
                    import time as _time

                    _time.sleep(0.002)
                    continue
                raise RuntimeError("scheduler stalled with pending work")
            if not progressed and not self.scheduler.has_work():
                missing = [r for r in rids
                           if self._outputs.get(r, {}).get("finished") is None]
                if missing:
                    raise RuntimeError(f"requests lost: {missing}")

        self.scheduler.drain()  # retire any speculative overlap step
        results = [self._finalize(rid) for rid in rids]
        return results if was_batch else results[0]

    def encode(self, prompt=None, input_ids=None, image_data=None):
        """Embedding API (analog of Engine.encode / EmbeddingReqInput):
        returns {"embedding": [...], "meta_info": ...} or a list."""
        import uuid as _uuid

        batch = isinstance(prompt, list) or (
            input_ids is not None and input_ids and
            isinstance(input_ids[0], list))
        prompts = prompt if isinstance(prompt, list) else (
            [prompt] if prompt is not None else None)
        idss = input_ids if (input_ids is not None and batch) else (
            [input_ids] if input_ids is not None else None)
        if image_data is not None and not isinstance(image_data, list):
            image_data = [image_data]
        n = (len(prompts) if prompts is not None
             else len(idss) if idss is not None else len(image_data))
        rids = []
        for i in range(n):
            px = None
            if image_data is not None and image_data[i] is not None:
                # CLIP image embedding request
                from iaas_sglang_tpu.multimodal.processor import (
                    clip_preprocess, load_image)

                vc = self.scheduler.model_config.vision_config or {}
                px = clip_preprocess(load_image(image_data[i]),
                                     vc.get("image_size", 224))
                ids = [0]
            elif idss is not None:
                ids = idss[i]
            else:
                ids = self.tokenizer.encode(prompts[i])
            rid = _uuid.uuid4().hex
            self.scheduler.process_input(TokenizedEmbeddingReqInput(
                rid=rid,
                input_text=(prompts[i] if prompts is not None else None),
                input_ids=ids, pixel=px))
            rids.append(rid)
        while any(r not in self._outputs for r in rids):
            if not self.scheduler.step() and not self.scheduler.has_work():
                missing = [r for r in rids if r not in self._outputs]
                if missing:
                    raise RuntimeError(f"embedding requests lost: {missing}")
        outs = []
        for rid in rids:
            st = self._outputs.pop(rid)
            meta = {"id": rid, "prompt_tokens": st.get("prompt_tokens", 0)}
            if st.get("finished"):
                # aborted (e.g. encoder prompt beyond the prefill budget)
                meta["finish_reason"] = st["finished"]
            outs.append({
                "embedding": st.get("embedding"),
                "meta_info": meta,
            })
        return outs if batch else outs[0]

    def score(self, query=None, items=None, label_token_ids=None,
              apply_softmax=False, item_first=False):
        """Scoring API (analog of Engine.score, serving_score.py): P(label
        token | query+item) at the first generated position, per item."""
        import math

        if label_token_ids is None:
            raise ValueError("label_token_ids must be provided")
        if isinstance(items, str):
            items = [items]
        elif isinstance(items, list) and items and isinstance(items[0], int):
            items = [items]
        if isinstance(query, str):
            prompts = [f"{it}{query}" if item_first else f"{query}{it}"
                       for it in items]
            outs = self.generate(
                prompt=prompts,
                sampling_params={"max_new_tokens": 1, "temperature": 0.0},
                token_ids_logprob=list(label_token_ids))
        else:
            ids_list = [(it + query) if item_first else (query + it)
                        for it in items]
            outs = self.generate(
                input_ids=ids_list,
                sampling_params={"max_new_tokens": 1, "temperature": 0.0},
                token_ids_logprob=list(label_token_ids))
        scores = []
        for o in outs:
            lps = o["meta_info"].get("output_token_ids_logprobs")
            row = {int(t): float(v) for v, t in lps[0]} if lps else {}
            vals = [row.get(int(t), float("-inf")) for t in label_token_ids]
            if apply_softmax:
                m = max(vals)
                exps = [math.exp(v - m) for v in vals]
                z = sum(exps) or 1.0
                vals = [e / z for e in exps]
            scores.append(vals)
        return scores

    def _finalize(self, rid: str) -> dict:
        st = self._outputs.pop(rid)
        text = ""
        if self.tokenizer is not None:
            text = self.tokenizer.decode(
                st["output_ids"],
                skip_special_tokens=st.get("skip_special_tokens", True),
            )
            # stop-string trimming (detokenizer_manager.py analog)
            if not st.get("no_stop_trim"):
                fin = st.get("finished") or {}
                matched = fin.get("matched")
                if isinstance(matched, str) and matched in text:
                    text = text[: text.index(matched)]
        meta = {
            "id": rid,
            "finish_reason": st["finished"],
            "prompt_tokens": st["prompt_tokens"],
            "completion_tokens": st["completion_tokens"],
            "cached_tokens": st["cached_tokens"],
        }
        for k in ("output_token_logprobs", "output_top_logprobs",
                  "output_token_ids_logprobs", "input_token_logprobs"):
            if k in st:
                meta[k] = st[k]
        return {
            "text": text,
            "output_ids": st["output_ids"],
            "meta_info": meta,
        }

    # ------------------------------------------------------------ admin ops

    def load_lora_adapter(self, name: str, state_dict, *, rank: int,
                          alpha: float) -> int:
        """Load a PEFT-style adapter into a slot
        (analog of /load_lora_adapter, lora_manager.py:45)."""
        mgr = self.scheduler.model_runner.lora_manager
        assert mgr is not None, "start the engine with enable_lora=True"
        return mgr.load_adapter(name, state_dict, rank=rank, alpha=alpha)

    def unload_lora_adapter(self, name: str) -> None:
        mgr = self.scheduler.model_runner.lora_manager
        if mgr is not None:
            mgr.unload_adapter(name)

    def open_session(self, session_id=None) -> str:
        from iaas_sglang_tpu.managers.io_struct import OpenSessionReqInput

        return self.scheduler.process_input(
            OpenSessionReqInput(session_id)).session_id

    def close_session(self, session_id: str) -> None:
        from iaas_sglang_tpu.managers.io_struct import CloseSessionReqInput

        self.scheduler.process_input(CloseSessionReqInput(session_id))

    def flush_cache(self) -> bool:
        from iaas_sglang_tpu.managers.io_struct import FlushCacheReqInput

        return self.scheduler.process_input(FlushCacheReqInput()).success

    def get_internal_state(self) -> dict:
        from iaas_sglang_tpu.managers.io_struct import GetInternalStateReq

        return self.scheduler.process_input(GetInternalStateReq()).state

    def update_weights_from_disk(self, model_path: str,
                                 load_format: str = "auto"):
        from iaas_sglang_tpu.managers.io_struct import (
            UpdateWeightFromDiskReqInput,
        )

        out = self.scheduler.process_input(
            UpdateWeightFromDiskReqInput(model_path, load_format))
        return out.success, out.message

    def update_weights_from_tensor(self, named_arrays) -> tuple:
        return self.scheduler.model_runner.update_weights_from_tensor(
            named_arrays)

    def get_weights_by_name(self, name: str):
        from iaas_sglang_tpu.managers.io_struct import GetWeightsByNameReqInput

        return self.scheduler.process_input(
            GetWeightsByNameReqInput(name)).value

    def init_weights_update_group(self, master_address: str,
                                  master_port: int,
                                  group_name: str = "weight_update_group"
                                  ) -> tuple:
        """Open the trainer->server weight channel (the reference's NCCL
        update group, ZMQ PULL here — model_runner.py:745 analog)."""
        from iaas_sglang_tpu.managers.io_struct import (
            InitWeightsUpdateGroupReqInput,
        )

        out = self.scheduler.process_input(InitWeightsUpdateGroupReqInput(
            master_address, master_port, group_name))
        return out.success, out.message

    def update_weights_from_distributed(self, names, dtypes=None,
                                        shapes=None) -> tuple:
        from iaas_sglang_tpu.managers.io_struct import (
            UpdateWeightsFromDistributedReqInput,
        )

        out = self.scheduler.process_input(
            UpdateWeightsFromDistributedReqInput(names, dtypes, shapes))
        return out.success, out.message

    def save_sharded_model(self, path: str,
                           max_shard_bytes: int = 2 << 30) -> tuple:
        from iaas_sglang_tpu.managers.io_struct import (
            SaveShardedModelReqInput,
        )

        out = self.scheduler.process_input(
            SaveShardedModelReqInput(path, max_shard_bytes))
        return out.success, out.message

    def save_remote_model(self, url: str) -> tuple:
        from iaas_sglang_tpu.managers.io_struct import (
            SaveRemoteModelReqInput,
        )

        out = self.scheduler.process_input(SaveRemoteModelReqInput(url))
        return out.success, out.message

    def eplb_rebalance(self, num_redundant_experts: int = 0) -> tuple:
        """Rebalance + live-apply expert placement from the recorded
        distribution (reference eplb_manager + expert_location_updater)."""
        from iaas_sglang_tpu.managers.io_struct import EplbRebalanceReqInput

        out = self.scheduler.process_input(
            EplbRebalanceReqInput(num_redundant_experts))
        return out.success, out.message, out.balancedness

    def release_memory_occupation(self) -> None:
        from iaas_sglang_tpu.managers.io_struct import (
            ReleaseMemoryOccupationReqInput,
        )

        self.scheduler.process_input(ReleaseMemoryOccupationReqInput())

    def resume_memory_occupation(self) -> None:
        from iaas_sglang_tpu.managers.io_struct import (
            ResumeMemoryOccupationReqInput,
        )

        self.scheduler.process_input(ResumeMemoryOccupationReqInput())

    def shutdown(self) -> None:
        # embedded mode holds no extra processes; multihost drivers tell
        # the follower hosts to exit their replay loops
        sd = getattr(self.scheduler.model_runner, "shutdown", None)
        if sd is not None:
            sd()
