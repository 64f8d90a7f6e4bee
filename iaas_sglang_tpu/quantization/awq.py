"""AWQ checkpoint ingestion: AutoAWQ GEMM-format tensors -> the framework's
packed-INT4 layout (ops/quant_matmul.py).

Reference behavior: srt/layers/quantization/awq.py + the vllm AWQ dequant
kernel (sgl-kernel csrc/gemm/awq_kernel.cu). AutoAWQ packs 8 uint4 values
per int32 along the OUTPUT dim with the interleave order [0,2,4,6,1,3,5,7]
(nibble slot i holds output column order_map[i]):

    qweight  int32 [K,   N/8]   (already [in, out] — no transpose)
    qzeros   int32 [K/G, N/8]   same nibble order
    scales   fp16  [K/G, N]

Mapping to our signed domain: q_s = q_u - 8, zero_scale = (z_u - 8)*s, so
dequant(q_u) = (q_u - z_u)*s == q_s*s - zero_scale.
"""

from __future__ import annotations

import numpy as np

AWQ_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def unpack_awq_int32(a: np.ndarray) -> np.ndarray:
    """int32 [R, C/8] -> uint8 [R, C] in original column order."""
    R, C8 = a.shape
    out = np.empty((R, C8, 8), np.uint8)
    for i, col in enumerate(AWQ_ORDER):
        out[:, :, col] = ((a >> (4 * i)) & 0xF).astype(np.uint8)
    return out.reshape(R, C8 * 8)


def pack_awq_int32(q_u: np.ndarray) -> np.ndarray:
    """Inverse of unpack (test helper / checkpoint writer): uint8 [R, C]
    -> int32 [R, C/8] in AutoAWQ nibble order."""
    R, C = q_u.shape
    q3 = q_u.reshape(R, C // 8, 8).astype(np.uint32)
    out = np.zeros((R, C // 8), np.uint32)
    for i, col in enumerate(AWQ_ORDER):
        out |= q3[:, :, col] << (4 * i)
    return out.astype(np.int32)


def unpack_gptq_rows(a: np.ndarray) -> np.ndarray:
    """GPTQ row packing: int32 [K/8, C] -> uint8 [K, C] (8 sequential
    K-rows per int32, low nibble first)."""
    K8, C = a.shape
    out = np.empty((K8, 8, C), np.uint8)
    for i in range(8):
        out[:, i] = ((a >> (4 * i)) & 0xF).astype(np.uint8)
    return out.reshape(K8 * 8, C)


def unpack_gptq_cols(a: np.ndarray) -> np.ndarray:
    """GPTQ column packing: int32 [R, C/8] -> uint8 [R, C] (8 sequential
    columns per int32, low nibble first)."""
    R, C8 = a.shape
    out = np.empty((R, C8, 8), np.uint8)
    for i in range(8):
        out[:, :, i] = ((a >> (4 * i)) & 0xF).astype(np.uint8)
    return out.reshape(R, C8 * 8)


def ingest_gptq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray,
                g_idx: np.ndarray = None):
    """GPTQ GEMM-format tensors -> packed-INT4 layout. GPTQ stores
    qweight int32 [K/8, N] (sequential row nibbles), qzeros int32
    [K/G, N/8] (sequential column nibbles, with the historical
    zeros-minus-one convention: z = unpacked + 1), scales fp16 [K/G, N].
    Activation-reordered checkpoints (non-trivial g_idx / desc_act) are
    not supported."""
    from iaas_sglang_tpu.ops.quant_matmul import pack_int4

    if g_idx is not None and len(g_idx):
        K = qweight.shape[0] * 8
        group = K // qzeros.shape[0]
        expect = np.arange(K) // group
        if not np.array_equal(np.asarray(g_idx), expect):
            raise NotImplementedError(
                "GPTQ desc_act (activation reordering) is not supported")
    q_u = unpack_gptq_rows(qweight)                   # [K, N]
    z_u = unpack_gptq_cols(qzeros).astype(np.int16) + 1   # [K/G, N]
    s = scales.astype(np.float32)
    q_s = (q_u.astype(np.int16) - 8).astype(np.int8)
    packed = pack_int4(q_s)
    zero_scale = (z_u.astype(np.float32) - 8.0) * s
    return packed, s, zero_scale


def ingest_awq(qweight: np.ndarray, qzeros: np.ndarray, scales: np.ndarray):
    """-> (packed int8 [K/2, N], scale f32 [K/G, N], zero_scale f32 [K/G, N])."""
    from iaas_sglang_tpu.ops.quant_matmul import pack_int4

    q_u = unpack_awq_int32(qweight)                   # [K, N] uint8
    z_u = unpack_awq_int32(qzeros)                    # [K/G, N] uint8
    s = scales.astype(np.float32)                     # [K/G, N]
    q_s = (q_u.astype(np.int16) - 8).astype(np.int8)
    packed = pack_int4(q_s)
    zero_scale = (z_u.astype(np.float32) - 8.0) * s
    return packed, s, zero_scale
