"""The frontend language (analog of sglang's `lang/` DSL: sgl.function,
sgl.gen, sgl.select, sgl.fork, role tags — python/sglang/lang/ir.py +
interpreter.py, re-designed as a compact synchronous interpreter)."""

from iaas_sglang_tpu.lang.tracer import (
    ProgramTrace,
    TracerProgramState,
    extract_prefix_by_tracing,
    trace_program,
)
from iaas_sglang_tpu.lang.interpreter import (
    EngineBackend,
    ProgramState,
    RuntimeEndpoint,
    SglFunction,
    assistant,
    function,
    gen,
    select,
    system,
    user,
)
from iaas_sglang_tpu.lang.backends import (
    AnthropicBackend,
    LiteLLMBackend,
    OpenAIBackend,
    VertexAIBackend,
)
from iaas_sglang_tpu.lang.choices import (
    CHOICES_SAMPLING_METHODS,
    greedy_token_selection,
    token_length_normalized,
    unconditional_likelihood_normalized,
)

__all__ = [
    "function", "gen", "select", "system", "user", "assistant",
    "SglFunction", "ProgramState", "EngineBackend", "RuntimeEndpoint",
    "OpenAIBackend", "AnthropicBackend", "LiteLLMBackend", "VertexAIBackend",
    "CHOICES_SAMPLING_METHODS", "token_length_normalized",
    "greedy_token_selection", "unconditional_likelihood_normalized",
    "trace_program", "extract_prefix_by_tracing", "ProgramTrace",
    "TracerProgramState",
]
