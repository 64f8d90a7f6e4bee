from iaas_sglang_tpu.function_call.parser import (
    FunctionCallParser,
    ToolCallItem,
)

__all__ = ["FunctionCallParser", "ToolCallItem"]
