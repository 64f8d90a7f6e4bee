"""Per-request sampling parameters
(analog of sglang srt/sampling/sampling_params.py:22)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

TOP_K_ALL = -1


@dataclass
class SamplingParams:
    max_new_tokens: int = 128
    min_new_tokens: int = 0
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = TOP_K_ALL
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Optional[Union[str, List[str]]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    skip_special_tokens: bool = True
    spaces_between_special_tokens: bool = True
    no_stop_trim: bool = False
    logit_bias: Optional[Dict[int, float]] = None
    n: int = 1
    # Structured output (wired to the grammar backend in a later milestone)
    json_schema: Optional[str] = None
    regex: Optional[str] = None
    ebnf: Optional[str] = None
    # JSON spec {"structures": [{"begin","schema","end"}], "triggers": [...]}:
    # free generation until a trigger string appears, then the matching
    # begin+schema+end structure is enforced (repeatable)
    structural_tag: Optional[str] = None
    # named host-side sparse-bias processor (sampling/custom_logit_processor);
    # requires --enable-custom-logit-processor
    custom_logit_processor: Optional[str] = None
    custom_params: Optional[Dict[str, Any]] = None

    def __post_init__(self):
        if self.stop is None:
            self.stop = []
        elif isinstance(self.stop, str):
            self.stop = [self.stop]
        if self.stop_token_ids is None:
            self.stop_token_ids = []
        self.verify()

    def verify(self):
        if self.temperature < 0.0:
            raise ValueError(f"temperature must be >= 0, got {self.temperature}")
        if not 0.0 < self.top_p <= 1.0:
            raise ValueError(f"top_p must be in (0, 1], got {self.top_p}")
        if self.top_k < TOP_K_ALL or self.top_k == 0:
            raise ValueError(f"top_k must be -1 (all) or >= 1, got {self.top_k}")
        if not 0.0 <= self.min_p <= 1.0:
            raise ValueError(f"min_p must be in [0, 1], got {self.min_p}")
        if not -2.0 <= self.frequency_penalty <= 2.0:
            raise ValueError("frequency_penalty must be in [-2, 2]")
        if not -2.0 <= self.presence_penalty <= 2.0:
            raise ValueError("presence_penalty must be in [-2, 2]")
        if not 0.0 < self.repetition_penalty <= 2.0:
            raise ValueError("repetition_penalty must be in (0, 2]")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")

    @property
    def is_greedy(self) -> bool:
        return self.temperature < 1e-5

    @staticmethod
    def from_dict(d: Optional[Dict[str, Any]]) -> "SamplingParams":
        if d is None:
            return SamplingParams()
        known = {f for f in SamplingParams.__dataclass_fields__}
        return SamplingParams(**{k: v for k, v in d.items() if k in known})
