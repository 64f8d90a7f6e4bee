"""Typed IPC messages between TokenizerManager / Scheduler / Detokenizer
(analog of sglang srt/managers/io_struct.py:50,442,613,666).

Messages travel pickled over ZMQ between the manager processes; every
message type has exactly one handler registered via TypeBasedDispatcher.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from iaas_sglang_tpu.sampling.sampling_params import SamplingParams


@dataclass
class GenerateReqInput:
    """User-facing generate request (text in, text/tokens out)."""

    rid: Optional[Union[str, List[str]]] = None
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None
    sampling_params: Optional[Union[Dict, List[Dict]]] = None
    stream: bool = False
    return_logprob: bool = False
    logprob_start_len: int = -1
    top_logprobs_num: int = 0
    # logprobs of these specific token ids at every output position
    # (the scoring-API hook; reference io_struct token_ids_logprob)
    token_ids_logprob: Optional[List[int]] = None
    disagg_decode_url: Optional[str] = None
    session_id: Optional[str] = None
    lora_path: Optional[str] = None
    # multimodal: one image (or list per placeholder) per request; batched
    # requests pass a list of per-request payloads
    image_data: Optional[Any] = None
    # audio payloads (wav path/bytes/base64/float waveform), same shape
    # conventions as image_data (reference GenerateReqInput.audio_data)
    audio_data: Optional[Any] = None

    def is_batch(self) -> bool:
        if self.text is not None:
            return isinstance(self.text, list)
        return isinstance(self.input_ids[0], list)

    def batch_size(self) -> int:
        if not self.is_batch():
            return 1
        return len(self.text if self.text is not None else self.input_ids)

    def normalize(self) -> List["GenerateReqInput"]:
        """Expand a batched request into per-sequence requests."""
        n = self.batch_size()
        out = []
        for i in range(n):
            if self.is_batch():
                text = self.text[i] if self.text is not None else None
                ids = self.input_ids[i] if self.input_ids is not None else None
                sp = (
                    self.sampling_params[i]
                    if isinstance(self.sampling_params, list)
                    else self.sampling_params
                )
                rid = self.rid[i] if isinstance(self.rid, list) else None
            else:
                text, ids, sp = self.text, self.input_ids, self.sampling_params
                rid = self.rid if isinstance(self.rid, str) else None
            img = (self.image_data[i] if (self.is_batch()
                   and isinstance(self.image_data, list)) else self.image_data)
            aud = (self.audio_data[i] if (self.is_batch()
                   and isinstance(self.audio_data, list)) else self.audio_data)
            out.append(
                GenerateReqInput(
                    rid=rid or uuid.uuid4().hex,
                    text=text,
                    input_ids=ids,
                    sampling_params=sp,
                    stream=self.stream,
                    return_logprob=self.return_logprob,
                    logprob_start_len=self.logprob_start_len,
                    top_logprobs_num=self.top_logprobs_num,
                    token_ids_logprob=self.token_ids_logprob,
                    disagg_decode_url=self.disagg_decode_url,
                    session_id=self.session_id,
                    lora_path=self.lora_path,
                    image_data=img,
                    audio_data=aud,
                )
            )
        return out


@dataclass
class TokenizedGenerateReqInput:
    """Tokenizer -> Scheduler."""

    rid: str
    input_text: Optional[str]
    input_ids: List[int]
    sampling_params: SamplingParams
    stream: bool = False
    return_logprob: bool = False
    logprob_start_len: int = -1
    top_logprobs_num: int = 0
    token_ids_logprob: Optional[List[int]] = None
    # PD disaggregation: when set, hand the request off to this decode
    # server's KV-ingest endpoint after prefill
    disagg_decode_url: Optional[str] = None
    session_id: Optional[str] = None
    lora_path: Optional[str] = None
    # multimodal items (hash + preprocessed pixels + token span); the
    # input_ids already carry hash-derived pseudo ids over the image spans
    mm_items: Optional[list] = None


@dataclass
class BatchTokenIDOut:
    """Scheduler -> Detokenizer: incremental new token ids per request."""

    rids: List[str]
    decode_ids: List[List[int]]        # full output ids so far (read offset below)
    read_offsets: List[int]
    finished_reasons: List[Optional[dict]]
    skip_special_tokens: List[bool]
    spaces_between_special_tokens: List[bool]
    no_stop_trim: List[bool]
    stop_strs: List[List[str]]
    prompt_tokens: List[int]
    completion_tokens: List[int]
    cached_tokens: List[int]
    output_token_logprobs: Optional[List[Optional[List[float]]]] = None
    output_top_logprobs: Optional[List[Optional[List[list]]]] = None
    output_token_ids_logprobs: Optional[List[Optional[List[list]]]] = None
    input_token_logprobs: Optional[List[Optional[List[list]]]] = None


@dataclass
class BatchStrOut:
    """Detokenizer -> TokenizerManager: incremental text per request."""

    rids: List[str]
    output_strs: List[str]
    finished_reasons: List[Optional[dict]]
    prompt_tokens: List[int]
    completion_tokens: List[int]
    cached_tokens: List[int]
    output_ids: List[List[int]]
    output_token_logprobs: Optional[List[Optional[List[float]]]] = None
    output_top_logprobs: Optional[List[Optional[List[list]]]] = None
    output_token_ids_logprobs: Optional[List[Optional[List[list]]]] = None
    input_token_logprobs: Optional[List[Optional[List[list]]]] = None


@dataclass
class EmbeddingReqInput:
    rid: Optional[Union[str, List[str]]] = None
    text: Optional[Union[str, List[str]]] = None
    input_ids: Optional[Union[List[int], List[List[int]]]] = None


@dataclass
class TokenizedEmbeddingReqInput:
    rid: str
    input_text: Optional[str]
    input_ids: List[int]
    # CLIP image embedding: preprocessed pixels [3, S, S] (models/clip.py —
    # an image request bypasses the text tower)
    pixel: Optional[Any] = None


@dataclass
class BatchEmbeddingOut:
    rids: List[str]
    embeddings: List[List[float]]
    prompt_tokens: List[int]


@dataclass
class AbortReq:
    rid: str


@dataclass
class FlushCacheReqInput:
    pass


@dataclass
class FlushCacheReqOutput:
    success: bool
    num_pages_freed: int = 0


@dataclass
class GetInternalStateReq:
    pass


@dataclass
class GetInternalStateReqOutput:
    state: Dict[str, Any]


@dataclass
class UpdateWeightFromDiskReqInput:
    model_path: str
    load_format: str = "auto"


@dataclass
class UpdateWeightFromDiskReqOutput:
    success: bool
    message: str = ""


@dataclass
class ReleaseMemoryOccupationReqInput:
    pass


@dataclass
class ReleaseMemoryOccupationReqOutput:
    success: bool = True


@dataclass
class ResumeMemoryOccupationReqInput:
    pass


@dataclass
class ResumeMemoryOccupationReqOutput:
    success: bool = True


@dataclass
class InitWeightsUpdateGroupReqInput:
    """Open a weight-receive channel to an external trainer (the TPU
    analog of the reference's NCCL group, model_runner.py:745 — here a
    ZMQ PULL socket; the trainer PUSHes serialized named tensors)."""

    master_address: str
    master_port: int
    group_name: str = "weight_update_group"


@dataclass
class InitWeightsUpdateGroupReqOutput:
    success: bool
    message: str = ""


@dataclass
class UpdateWeightsFromDistributedReqInput:
    """Receive the named tensors from the update group and apply them
    (model_runner.py:790 update_weights_from_distributed analog)."""

    names: list
    dtypes: list = None
    shapes: list = None


@dataclass
class UpdateWeightsFromDistributedReqOutput:
    success: bool
    message: str = ""


@dataclass
class SaveShardedModelReqInput:
    """Persist the served weights as flat safetensors shards reloadable
    with --load-format sharded_state (scheduler.py:2213 analog)."""

    path: str
    max_shard_bytes: int = 2 << 30


@dataclass
class SaveShardedModelReqOutput:
    success: bool
    message: str = ""


@dataclass
class SaveRemoteModelReqInput:
    """Persist the served weights through a connector URL
    (scheduler.py:2206 save_remote_model analog)."""

    url: str


@dataclass
class SaveRemoteModelReqOutput:
    success: bool
    message: str = ""


@dataclass
class EplbRebalanceReqInput:
    """Rebalance expert placement from the recorded distribution and apply
    it live (reference eplb/eplb_manager.py + expert_location_updater)."""

    num_redundant_experts: int = 0


@dataclass
class EplbRebalanceReqOutput:
    success: bool
    message: str = ""
    balancedness: float = 0.0


@dataclass
class GetWeightsByNameReqInput:
    name: str


@dataclass
class GetWeightsByNameReqOutput:
    value: Any = None


@dataclass
class LoadLoRAAdapterReqInput:
    lora_name: str
    lora_path: str


@dataclass
class LoadLoRAAdapterReqOutput:
    success: bool
    message: str = ""


@dataclass
class UnloadLoRAAdapterReqInput:
    lora_name: str


@dataclass
class ExpertDistributionReq:
    action: str = "start"   # start | stop | dump


@dataclass
class ExpertDistributionReqOutput:
    success: bool = True
    # per-layer routed-token counts (None for start)
    counts: Any = None


@dataclass
class ProfileReq:
    action: str = "start"   # start | stop
    output_dir: str = "/tmp/iaas_sglang_tpu_trace"


@dataclass
class ProfileReqOutput:
    success: bool = True
    message: str = ""


@dataclass
class OpenSessionReqInput:
    session_id: Optional[str] = None
    capacity_of_str_len: int = 8192


@dataclass
class OpenSessionReqOutput:
    session_id: str = ""
    success: bool = True


@dataclass
class CloseSessionReqInput:
    session_id: str = ""


@dataclass
class HealthCheckReq:
    pass


@dataclass
class HealthCheckOutput:
    healthy: bool = True
