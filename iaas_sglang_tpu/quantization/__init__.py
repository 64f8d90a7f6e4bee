from iaas_sglang_tpu.quantization.qlinear import (
    QuantizedWeight,
    dequantize,
    quantize_weight,
    qmatmul,
)

__all__ = ["QuantizedWeight", "quantize_weight", "qmatmul", "dequantize"]
