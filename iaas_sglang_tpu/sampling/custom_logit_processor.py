"""Custom logit processors (analog of sglang
srt/sampling/custom_logit_processor.py + --enable-custom-logit-processor).

TPU departure from the reference: the reference ships a dill-serialized
callable that mutates the full logits tensor on-GPU each step. Inside a
compiled XLA program an arbitrary host callable per request is not
expressible, so processors here are HOST-side sparse-bias generators: each
decode step the scheduler calls the processor with the request's
custom_params and output history, and the returned {token_id: bias} dict is
folded into the batch's existing (bias_ids, bias_values) sampling inputs —
the same device path that serves logit_bias, so the compiled program is
unchanged. This covers the common uses (token banning/boosting, forcing a
token after a condition, think-budget enforcement); full dense logits
rewriting is not supported.

Requests name a processor registered via `register_custom_logit_processor`;
serving them requires `--enable-custom-logit-processor` (mirrors the
reference's opt-in flag).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

# processor(custom_params, output_ids) -> {token_id: logit_bias}
CustomLogitProcessorFn = Callable[[dict, List[int]], Dict[int, float]]

_registry: Dict[str, CustomLogitProcessorFn] = {}


def register_custom_logit_processor(
        name: str, fn: CustomLogitProcessorFn) -> None:
    _registry[name] = fn


def get_custom_logit_processor(
        name: str) -> Optional[CustomLogitProcessorFn]:
    return _registry.get(name)


def custom_logit_processor_names() -> List[str]:
    return sorted(_registry)


def _disallow_tokens(params: dict, output_ids: List[int]) -> Dict[int, float]:
    """Ban a fixed token set (params: {"token_ids": [...]})."""
    return {int(t): -1e9 for t in params.get("token_ids", [])}


def _boost_tokens(params: dict, output_ids: List[int]) -> Dict[int, float]:
    """Additive bias on a token set (params: {"token_ids": [...],
    "bias": float})."""
    b = float(params.get("bias", 10.0))
    return {int(t): b for t in params.get("token_ids", [])}


def _force_token_after(params: dict, output_ids: List[int]) -> Dict[int, float]:
    """Force one token once `after` tokens have been generated (params:
    {"token_id": int, "after": int}) — the reference test-suite's
    DeterministicLogitProcessor pattern."""
    if len(output_ids) >= int(params.get("after", 0)):
        return {int(params["token_id"]): 1e9}
    return {}


register_custom_logit_processor("disallow_tokens", _disallow_tokens)
register_custom_logit_processor("boost_tokens", _boost_tokens)
register_custom_logit_processor("force_token_after", _force_token_after)
