"""Weight quantization: INT4/INT8 group-wise weight-only and FP8.

TPU re-design of the reference's quantization stack
(srt/layers/quantization/, sgl-kernel csrc/gemm/): on GPU the reference
ships fused CUDA dequant-GEMMs (AWQ/GPTQ INT4, FP8 blockwise); on TPU the
weight lives as a native narrow-dtype array (XLA packs int4) and the
dequant is expressed so XLA fuses the convert+scale into the matmul —
weight bytes read from HBM are the narrow bytes, which is the entire win
for bandwidth-bound decode. A Pallas fused kernel can replace the XLA
path per-op when profiling justifies it.

Layout: weight [in, out] -> q [in, out] (int4/int8/fp8), scales
[in/G, out] f32 with contraction-dim groups of G=128 (AWQ/GPTQ grouping).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

GROUP = 128


@struct.dataclass
class QuantizedWeight:
    q: jnp.ndarray        # [in, out] int8/fp8 | [in/2, out] packed nibbles
    scale: jnp.ndarray    # [in/G, out] f32   (fp8: [1, out];
    #                       blockwise fp8: [ceil(in/128), ceil(out/128)])
    # packed weights live in the SIGNED nibble domain; asymmetric (AWQ)
    # zeros are pre-multiplied into a (zero-8)*scale f32 table so
    # dequant(q_unsigned) = (q_u - z)*s == q_signed*s - zero_scale
    zero_scale: Optional[jnp.ndarray] = None  # [in/G, out] f32 | None
    packed: bool = struct.field(pytree_node=False, default=False)
    # W8A8 (reference w8a8_int8.py): per-channel int8 weights served with
    # per-token int8 activation quant + native int8 MXU dots at decode
    act_quant: bool = struct.field(pytree_node=False, default=False)
    # blockwise (128x128) FP8 scales — the DeepSeek-V3 checkpoint scheme
    # (reference layers/quantization/fp8.py:1151 weight_scale_inv +
    # fp8_kernel.py DeepGEMM blockwise path): dequant w = q * scale[block]
    block: bool = struct.field(pytree_node=False, default=False)

    @property
    def shape(self):
        if self.packed:
            return (self.q.shape[:-2] + (self.q.shape[-2] * 2,)
                    + self.q.shape[-1:])
        return self.q.shape


# INT4 matmul implementation: "xla" (unpack fused by XLA; runs anywhere,
# GSPMD-shardable) or "pallas" (fused dequant-GEMM kernel, single-shard TPU).
_INT4_IMPL = "xla"

# integer-dot W4A8 at decode shapes (per-token int8 activation quant +
# native int8 MXU dots; IAAS_W4A8=0 reverts to the f32 dequant chain)
_W4A8 = __import__("os").environ.get("IAAS_W4A8", "1") != "0"


def set_int4_impl(impl: str) -> None:
    global _INT4_IMPL
    # "pallas": hand-pipelined DMA dequant-GEMM (687 GB/s on v5e, see
    # ops/quant_matmul.py); "pallas_grid"/"pallas_sad": the r1 auto-
    # BlockSpec kernels kept for A/B; "xla": GSPMD-shardable fallback
    assert impl in ("xla", "pallas", "pallas_grid", "pallas_sad")
    _INT4_IMPL = impl


def _np_group_quantize(w: np.ndarray, bits: int):
    """Symmetric group-wise quantization on host. w: [in, out] float."""
    inn, out = w.shape
    group = GROUP if inn % GROUP == 0 else inn
    wg = w.reshape(inn // group, group, out).astype(np.float32)
    absmax = np.abs(wg).max(axis=1, keepdims=True)  # [in/G, 1, out]
    qmax = 2 ** (bits - 1) - 1
    scale = absmax / qmax
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.rint(wg / scale), -qmax - 1, qmax)
    return q.reshape(inn, out), scale[:, 0, :]


def quantize_weight_jnp(w: jnp.ndarray, method: str):
    """Device-side analog of quantize_weight -> (q, scale), same shapes,
    dtypes and value semantics. Used by the on-device dummy-weight
    generator (model_loader): quantizing on device keeps the whole dummy
    load free of host->device weight streaming (the remote relay made
    that stream a 15-minute tax per bench run)."""
    inn, out = w.shape
    w = w.astype(jnp.float32)
    if method in ("int4", "int4_awq", "int8", "w8a16", "w8a8_int8"):
        bits = 4 if method.startswith("int4") else 8
        # w8a8_int8: per-CHANNEL scale (one group spanning in) — the
        # reference's w8a8 scheme; int dots accumulate int32 over all of
        # K and scale once
        group = inn if method == "w8a8_int8" else (
            GROUP if inn % GROUP == 0 else inn)
        qmax = 2 ** (bits - 1) - 1
        wg = w.reshape(inn // group, group, out)
        absmax = jnp.abs(wg).max(axis=1, keepdims=True)
        scale = absmax / qmax
        scale = jnp.where(scale == 0, 1.0, scale)
        q = jnp.clip(jnp.rint(wg / scale), -qmax - 1, qmax)
        q = q.astype(jnp.int32).reshape(inn, out)
        s = scale[:, 0, :].astype(jnp.float32)
        if bits == 8:
            return q.astype(jnp.int8), s
        lo = q[0::2] & 0xF
        hi = q[1::2] & 0xF
        b = (hi << 4) | lo                     # [0, 255]
        b = ((b ^ 0x80) - 0x80)                # sign-extend into int8 range
        return b.astype(jnp.int8), s
    if method in ("fp8_block", "fp8_blockwise"):
        B = 128
        gi, go = -(-inn // B), -(-out // B)
        wp = jnp.zeros((gi * B, go * B), jnp.float32).at[:inn, :out].set(w)
        blocks = wp.reshape(gi, B, go, B)
        absmax = jnp.abs(blocks).max(axis=(1, 3))
        scale = jnp.where(absmax == 0, 1.0, absmax / 448.0)
        q = (blocks / scale[:, None, :, None]).reshape(gi * B, go * B)
        return (q[:inn, :out].astype(jnp.float8_e4m3fn),
                scale.astype(jnp.float32))
    if method == "fp8":
        absmax = jnp.abs(w).max(axis=0, keepdims=True)
        scale = jnp.where(absmax == 0, 1.0, absmax / 448.0)
        return (w / scale).astype(jnp.float8_e4m3fn), scale
    raise ValueError(f"unknown quantization {method!r}")


def quantize_weight(w: np.ndarray, method: str):
    """Host-side quantization -> (q_np, scale_np, target_dtype)."""
    if method in ("int4", "int4_awq"):
        from iaas_sglang_tpu.ops.quant_matmul import pack_int4

        q, s = _np_group_quantize(w, 4)
        return pack_int4(q.astype(np.int8)), s.astype(np.float32), jnp.int8
    if method in ("int8", "w8a16"):
        q, s = _np_group_quantize(w, 8)
        return q.astype(np.int8), s.astype(np.float32), jnp.int8
    if method == "w8a8_int8":
        w32 = w.astype(np.float32)
        absmax = np.abs(w32).max(axis=0, keepdims=True)   # [1, out]
        scale = np.where(absmax == 0, 1.0, absmax / 127.0)
        q = np.clip(np.rint(w32 / scale), -127, 127)
        return q.astype(np.int8), scale.astype(np.float32), jnp.int8
    if method in ("fp8_block", "fp8_blockwise"):
        # per-(128, 128)-block scales: the on-the-fly analog of the
        # DeepSeek-V3 FP8 checkpoint format (weight_scale_inv semantics:
        # dequant w = q * scale)
        import ml_dtypes

        w32 = w.astype(np.float32)
        K, N = w32.shape
        B = 128
        gi, go = -(-K // B), -(-N // B)
        wp = np.zeros((gi * B, go * B), np.float32)
        wp[:K, :N] = w32
        blocks = wp.reshape(gi, B, go, B)
        absmax = np.abs(blocks).max(axis=(1, 3))              # [gi, go]
        scale = np.where(absmax == 0, 1.0, absmax / 448.0)
        q = (blocks / scale[:, None, :, None]).reshape(gi * B, go * B)
        return (
            q[:K, :N].astype(ml_dtypes.float8_e4m3fn),
            scale.astype(np.float32),
            jnp.float8_e4m3fn,
        )
    if method == "fp8":
        # per-output-channel scale, e4m3 storage
        w32 = w.astype(np.float32)
        absmax = np.abs(w32).max(axis=0, keepdims=True)  # [1, out]
        scale = np.where(absmax == 0, 1.0, absmax / 448.0)
        q = (w32 / scale).astype(np.float32)
        import ml_dtypes

        return (
            q.astype(ml_dtypes.float8_e4m3fn),
            scale.astype(np.float32),
            jnp.float8_e4m3fn,
        )
    raise ValueError(f"unknown quantization {method!r}")


def _expand_block_scale(scale: jnp.ndarray, K: int, N: int,
                        block: int = 128) -> jnp.ndarray:
    """[ceil(K/block), ceil(N/block)] block scales -> [K, N] elementwise
    multipliers (ragged trailing blocks via repeat + crop). The block edge
    is the scheme constant (128), NOT shape-derived — a ragged dim would
    otherwise mis-size every block."""
    return jnp.repeat(
        jnp.repeat(scale, block, axis=0)[:K], block, axis=1)[:, :N]


def dequantize(qw: QuantizedWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    if qw.block:
        K, N = qw.q.shape
        se = _expand_block_scale(qw.scale, K, N)
        return (qw.q.astype(jnp.float32) * se).astype(dtype)
    if qw.packed:
        from iaas_sglang_tpu.ops.quant_matmul import unpack_int4_ref

        inn = qw.q.shape[0] * 2
        out = qw.q.shape[1]
        g = qw.scale.shape[0]
        wi = unpack_int4_ref(qw.q)
        wf = wi.astype(jnp.float32).reshape(g, inn // g, out)
        wf = wf * qw.scale[:, None, :]
        if qw.zero_scale is not None:
            wf = wf - qw.zero_scale[:, None, :]
        return wf.reshape(inn, out).astype(dtype)
    inn, out = qw.q.shape
    g = qw.scale.shape[0]
    wf = qw.q.astype(jnp.float32).reshape(g, inn // g, out)
    return (wf * qw.scale[:, None, :]).reshape(inn, out).astype(dtype)


def _q8_pallas_ok(qw: "QuantizedWeight") -> bool:
    """8-bit weights the pipelined DMA kernel serves: int8/fp8, symmetric
    (no zero table), group or per-channel scales (block scales must be
    pre-expanded to group form first — ModelRunner does so at load)."""
    return (_INT4_IMPL == "pallas"
            and not qw.packed and not qw.block and qw.zero_scale is None
            and qw.q.dtype in (jnp.int8, jnp.float8_e4m3fn))


def _q8_group_scale(scale: jnp.ndarray, inn: int):
    """Normalize a scale table to >=8 groups for the kernel's 8-sublane
    slicing (per-tensor/per-channel [.., 1, N] scales tile to 8 rows)."""
    if scale.shape[-2] == 1:
        reps = [1] * scale.ndim
        reps[-2] = 8
        return jnp.tile(scale, reps), inn // 8
    return scale, inn // scale.shape[-2]


class QuantLayerRef:
    """One layer's view of a layer-STACKED QuantizedWeight, resolved
    lazily at matmul time. The per-layer lax.scan must NOT slice stacked
    quantized weights in its xs: a Pallas custom-call operand cannot
    alias a dynamic-slice, so XLA materializes a full HBM->HBM copy of
    every layer's weights each step (measured ~0.31 ms/layer/step at
    llama-8B INT4 geometry — ~40% of the whole decode step). The Pallas
    path instead passes the FULL stack + the traced layer index into the
    kernel (int4_matmul_dma_stacked); non-Pallas paths fall back to the
    dynamic-slice."""

    __slots__ = ("qw", "idx")

    def __init__(self, qw: "QuantizedWeight", idx):
        self.qw = qw
        self.idx = idx

    def sliced(self) -> "QuantizedWeight":
        return jax.tree.map(lambda a: a[self.idx], self.qw)

    @property
    def shape(self):
        return self.qw.shape[1:]


def qmatmul(x: jnp.ndarray, w, out_dtype=None) -> jnp.ndarray:
    """x @ w where w is a plain array or a QuantizedWeight.

    Grouped formulation keeps the dequant inside the dot fusion so HBM
    traffic stays at the narrow-dtype size."""
    if isinstance(w, QuantLayerRef):
        if w.qw.packed and _INT4_IMPL == "pallas":
            from iaas_sglang_tpu.ops.quant_matmul import (
                W4A8_MAX_T,
                int4_matmul_dma_stacked,
                q_matmul_dma_stacked_a8,
                quantize_act_int8,
            )

            out_dtype = out_dtype or x.dtype
            qw = w.qw
            inn = qw.q.shape[1] * 2
            group = inn // qw.scale.shape[1]
            lead = x.shape[:-1]
            x2 = x.reshape(-1, inn)
            if x2.shape[0] <= W4A8_MAX_T and _W4A8:
                # decode shapes: integer-dot W4A8 (658 vs 539 GB/s, r4)
                xq, xs, rs = quantize_act_int8(x2, group)
                y = q_matmul_dma_stacked_a8(
                    xq, xs, rs, qw.q, qw.scale, qw.zero_scale,
                    w.idx, group=group)
            else:
                y = int4_matmul_dma_stacked(
                    x2, qw.q, qw.scale, qw.zero_scale,
                    w.idx, group=group)
            return y.reshape(*lead, qw.q.shape[2]).astype(out_dtype)
        if _q8_pallas_ok(w.qw) and w.qw.q.ndim == 3:
            from iaas_sglang_tpu.ops.quant_matmul import (
                W4A8_MAX_T,
                q8_matmul_dma_stacked,
                q_matmul_dma_stacked_a8,
                quantize_act_int8,
            )

            out_dtype = out_dtype or x.dtype
            qw = w.qw
            inn = qw.q.shape[1]
            s, group = _q8_group_scale(qw.scale, inn)
            lead = x.shape[:-1]
            x2 = x.reshape(-1, inn)
            if (qw.act_quant and qw.q.dtype == jnp.int8
                    and x2.shape[0] > W4A8_MAX_T):
                # W8A8 hybrid (r5, VERDICT #8): int8 MXU dots at PREFILL
                # T, where the MXU's 2x int8 throughput pays (prefill is
                # compute-bound); decode keeps the W8A16 dequant chain —
                # the r4 A/B showed the [T=32, K] int dot MXU-latency-
                # bound there (2097 vs 2335 tok/s e2e). Activation quant
                # only wins when it feeds wider dots or deletes a
                # convert, never per se (CLAUDE r4 lesson 5).
                xq, xs, _rs = quantize_act_int8(x2, group)
                y = q_matmul_dma_stacked_a8(
                    xq, xs, _rs, qw.q, s, None, w.idx, group=group,
                    eight_bit=True)
            else:
                y = q8_matmul_dma_stacked(
                    x2, qw.q, s, w.idx, group=group)
            return y.reshape(*lead, qw.q.shape[2]).astype(out_dtype)
        return qmatmul(x, w.sliced(), out_dtype)
    if not isinstance(w, QuantizedWeight):
        y = x @ w
        return y.astype(out_dtype) if out_dtype is not None else y
    out_dtype = out_dtype or x.dtype
    if w.packed:
        return _qmatmul_packed(x, w, out_dtype)
    if w.block:
        # blockwise (128x128) FP8: expand block scales and let XLA fuse
        # convert+scale into the dot — HBM weight reads stay 1 byte/elem
        # (reference fp8_kernel.py w8a8_block_fp8_matmul)
        K, N = w.q.shape
        se = _expand_block_scale(w.scale, K, N)
        wf = (w.q.astype(jnp.float32) * se).astype(x.dtype)
        y = jax.lax.dot_general(
            x, wf, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return y.astype(out_dtype)
    if _q8_pallas_ok(w) and w.q.ndim == 2:
        from iaas_sglang_tpu.ops.quant_matmul import q8_matmul_dma

        s, group = _q8_group_scale(w.scale, w.q.shape[0])
        lead = x.shape[:-1]
        y = q8_matmul_dma(x.reshape(-1, w.q.shape[0]), w.q, s, group=group)
        return y.reshape(*lead, w.q.shape[1]).astype(out_dtype)
    inn, out = w.q.shape
    g = w.scale.shape[0]
    if g == 1 or w.q.dtype == jnp.float8_e4m3fn:
        wf = w.q.astype(x.dtype)
        y = jax.lax.dot_general(
            x, wf, (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return (y * w.scale[0][None, :]).astype(out_dtype)
    # group-wise: einsum over (group, within-group) with per-group scaling
    gsz = inn // g
    xg = x.reshape(*x.shape[:-1], g, gsz)
    wg = w.q.reshape(g, gsz, out).astype(x.dtype)
    # [..., g, out] partial sums, scaled per group, then reduced
    partial = jnp.einsum(
        "...gi,gio->...go", xg, wg,
        preferred_element_type=jnp.float32,
    )
    y = jnp.sum(partial * w.scale[..., :], axis=-2)
    return y.astype(out_dtype)


def _qmatmul_packed(x: jnp.ndarray, w: QuantizedWeight, out_dtype):
    """Nibble-packed INT4 matmul: Pallas fused dequant-GEMM on TPU, or the
    XLA grouped-einsum fallback (CPU tests / multi-shard GSPMD)."""
    inn = w.q.shape[0] * 2
    out = w.q.shape[1]
    g = w.scale.shape[0]
    group = inn // g
    lead = x.shape[:-1]
    x2 = x.reshape(-1, inn)
    if _INT4_IMPL == "pallas":
        from iaas_sglang_tpu.ops.quant_matmul import int4_matmul_dma

        y = int4_matmul_dma(x2, w.q, w.scale, w.zero_scale, group=group)
        return y.reshape(*lead, out).astype(out_dtype)
    if _INT4_IMPL in ("pallas_grid", "pallas_sad"):
        from iaas_sglang_tpu.ops.quant_matmul import int4_matmul

        y = int4_matmul(x2, w.q, w.scale, w.zero_scale, group=group,
                        scale_after_dot=(_INT4_IMPL == "pallas_sad"))
        return y.reshape(*lead, out).astype(out_dtype)
    from iaas_sglang_tpu.ops.quant_matmul import unpack_int4_ref

    wi = unpack_int4_ref(w.q)                 # [in, out] i32, signed
    xg = x2.reshape(-1, g, group)
    wg = wi.reshape(g, group, out).astype(x.dtype)
    partial = jnp.einsum("tgi,gio->tgo", xg, wg,
                         preferred_element_type=jnp.float32)
    y = jnp.sum(partial * w.scale[None, :, :], axis=-2)
    if w.zero_scale is not None:
        # dot(x, w_u - z) == dot(x, w_s) - rowsum(x) ⊗ (z-8)*s
        y = y - jnp.einsum("tg,go->to", xg.sum(-1).astype(jnp.float32),
                           w.zero_scale)
    return y.reshape(*lead, out).astype(out_dtype)
