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

__all__ = [
    "function", "gen", "select", "system", "user", "assistant",
    "SglFunction", "ProgramState", "EngineBackend", "RuntimeEndpoint",
    "trace_program", "extract_prefix_by_tracing", "ProgramTrace",
    "TracerProgramState",
]
