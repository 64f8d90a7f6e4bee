"""Pallas TPU kernel: fused INT4 group-dequant matmul (weight-only W4A16).

The TPU answer to the reference's AWQ/GPTQ dequant GEMMs
(sgl-kernel csrc/gemm/awq_kernel.cu, vllm gptq/marlin paths): decode is
weight-bandwidth-bound, so the win is reading NIBBLES from HBM and
dequantizing on the way into the MXU.

Packing (`pack_int4`, row-pair layout): adjacent contraction-dim rows
share a byte — packed[k', n] = (q[2k'+1] << 4) | (q[2k'] & 0xF). Inside
the kernel `pltpu.bitcast(packed, int4)` re-expands sublanes in exactly
this order, so dequant is ONE native int4->bf16 convert (measured: the
int32 shift/mask unpack was 13x slower than the DMA; this path is not).

Scaling: weights are fed to the MXU UNSCALED; each group's [T, NB]
partial sum is scaled after the dot — O(T*N*K/G) multiplies instead of
O(K*N). Asymmetric zeros (AWQ) are handled in the signed domain with the
row-sum identity dot(x, w - z) = dot(x, w) - rowsum(x) ⊗ z, using a
pre-multiplied (zero - 8) * scale table built at ingestion.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128

# dequant arithmetic inside the DMA kernels: "f32" converts nibbles to
# f32, scales in f32, casts to bf16 (3 VPU passes; r1/r2 winner); "bf16"
# converts directly to bf16 and scales with bf16 scales (2 passes —
# re-A/B'd per kernel generation since the pipeline rework changed what
# the dequant overlaps with). Env override for probing.
_DEQUANT_MODE = __import__("os").environ.get("IAAS_INT4_DEQUANT", "f32")


def pack_int4(q: np.ndarray) -> np.ndarray:
    """Host-side nibble packing, row-pair layout. q: int8 [K, N], values in
    [-8, 7] -> int8 [K/2, N]; low nibble = even row (matches the in-kernel
    int4 bitcast sublane order)."""
    K, N = q.shape
    assert K % 2 == 0
    lo = q[0::2].astype(np.uint8) & 0xF
    hi = q[1::2].astype(np.uint8) & 0xF
    return ((hi << 4) | lo).astype(np.int8)


def unpack_int4_ref(packed: jnp.ndarray, *, group: int = GROUP) -> jnp.ndarray:
    """jnp reference unpack (CPU tests / XLA fallback): int8 [K/2, N] ->
    signed int32 [K, N] in original row order."""
    Kh, N = packed.shape
    p = packed.astype(jnp.int32)
    lo = ((p & 0xF) ^ 8) - 8
    hi = p >> 4  # arithmetic: already signed
    return jnp.stack([lo, hi], axis=1).reshape(2 * Kh, N)


def _int4_matmul_kernel(
    x_ref,        # [T, KB]        bf16/f32 VMEM
    w_ref,        # [KB/2, NB]     int8 VMEM (packed nibbles)
    s_ref,        # [K/G, NB]      f32 VMEM (per-group scales; full K axis —
                  #  a (BK/G, NB) block would break Mosaic's sublane-8 rule)
    zs_ref,       # [K/G, NB]      f32 VMEM ((zero-8)*scale) | None
    o_ref,        # [T, NB]        out VMEM
    acc_ref,      # [T, NB]        f32 scratch
    *,
    n_k: int,
    group: int,
    scale_after_dot: bool = False,
):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]                            # [T, KB]
    w = pltpu.bitcast(w_ref[...], jnp.int4).astype(x.dtype)  # [KB, NB]
    KB = w.shape[0]
    T = x.shape[0]
    nG = KB // group
    g0 = pl.program_id(1) * nG
    s = s_ref[pl.ds(g0, nG)]                  # f32 [nG, NB]
    zs = zs_ref[pl.ds(g0, nG)] if zs_ref is not None else None
    NB = w.shape[1]

    if scale_after_dot:
        # feed UNSCALED weights to the MXU as ONE batched group-dot
        # (batch dim 0 in BOTH operands — Mosaic's requirement), then
        # scale the [nG, T, NB] partials: O(nG*T*NB) VPU work instead of
        # the O(KB*NB) weight-side multiply. Zeros fold in via the
        # row-sum identity dot(x, w - z) = dot(x, w) - rowsum(x) ⊗ z.
        # MEASURED SLOWER at decode shapes (32-layer llama-8B bs=32 stack:
        # 16.1 ms vs 15.1 ms weight-side) — the batched T=32 group-dots
        # leave the MXU latency-bound, costing more than the saved VPU
        # passes. Kept opt-in for A/B at larger T / future hardware.
        xg = x.reshape(T, nG, group).transpose(1, 0, 2)   # [nG, T, group]
        wg = w.reshape(nG, group, NB)                     # [nG, group, NB]
        pg = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                 # f32 [nG, T, NB]
        part = pg * s[:, None, :]
        if zs is not None:
            rs = jnp.sum(xg.astype(jnp.float32), axis=2, keepdims=True)
            part = part - rs * zs[:, None, :]             # [nG,T,1]*[nG,1,NB]
        acc_ref[...] = acc_ref[...] + jnp.sum(part, axis=0)
    else:
        # dequantize + scale in VMEM, then ONE MXU dot per block: a python
        # loop of [T, G] x [G, NB] group-dots left the MXU latency-bound at
        # decode T (measured ~0.6 ms per call vs DMA time in the
        # microseconds). Scales multiply in f32: a bf16 variant measured
        # SLOWER on the 32-layer stack (17.3 vs 15.1 ms/step).
        w3 = w.astype(jnp.float32).reshape(nG, group, NB) * s[:, None, :]
        if zs is not None:
            w3 = w3 - zs[:, None, :]
        wf = w3.reshape(KB, NB).astype(x.dtype)
        acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
            x, wf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(pl.program_id(1) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_n", "block_k", "interpret",
                     "scale_after_dot"),
)
def int4_matmul(
    x: jnp.ndarray,          # [T, K] bf16/f32
    packed: jnp.ndarray,     # [K/2, N] int8 (row-pair nibbles, signed)
    scale: jnp.ndarray,      # [K/G, N] f32
    zero_scale: Optional[jnp.ndarray] = None,  # [K/G, N] f32 (zero-8)*scale
    *,
    group: int = GROUP,
    block_n: int = 512,
    block_k: int = 2048,
    interpret: bool = False,
    scale_after_dot: bool = False,
) -> jnp.ndarray:
    T, K = x.shape
    Kh, N = packed.shape
    assert Kh * 2 == K, (x.shape, packed.shape)
    g = group if K % group == 0 else K
    BN = min(block_n, N)
    # K-block must hold a multiple of 8 scale groups: the in-kernel dynamic
    # sublane slice of the scale array needs a provably 8-aligned offset
    # (Mosaic sublane tiling). Otherwise fall back to one full-K block.
    BK = max(g * 8, min(block_k, K) // (g * 8) * (g * 8))
    if K % BK != 0:
        BK = K
    assert N % BN == 0, (N, BN)
    n_k = K // BK

    in_specs = [
        pl.BlockSpec((T, BK), lambda j, k: (0, k)),
        pl.BlockSpec((BK // 2, BN), lambda j, k: (k, j)),
        pl.BlockSpec((K // g, BN), lambda j, k: (0, j)),
    ]
    args = [x, packed, scale]
    if zero_scale is not None:
        in_specs.append(pl.BlockSpec((K // g, BN), lambda j, k: (0, j)))
        args.append(zero_scale)
    kernel = functools.partial(
        _int4_matmul_kernel if zero_scale is not None else
        functools.partial(_wrap_nozero, _int4_matmul_kernel),
        n_k=n_k, group=g, scale_after_dot=scale_after_dot,
    )
    return pl.pallas_call(
        kernel,
        grid=(N // BN, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, BN), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        scratch_shapes=[pltpu.VMEM((T, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _wrap_nozero(kernel, x_ref, w_ref, s_ref, o_ref, acc_ref, **kw):
    return kernel(x_ref, w_ref, s_ref, None, o_ref, acc_ref, **kw)


# --------------------------------------------------------------------------
# Hand-pipelined DMA variant — the production decode path.
#
# Round-2 measured ladder on v5e (gate proj [32,4096]x[4096,14336], 32-layer
# slope-timed stack, scripts/microbench_int4_variants.py):
#   DMA-only sweep                 575 GB/s
#   auto-BlockSpec fused kernel    258 GB/s   (the r1 kernel above)
#   auto-BlockSpec, compute only   281 GB/s   (const weight block!)
#   manual DMA, BK=2048 BN=512     278 GB/s
#   manual DMA, BK=4096 BN=1024    687 GB/s   <- this kernel
# The auto pipeline's per-block VMEM copies serialize against the dequant;
# explicitly double-buffering 2 MB packed chunks into VMEM scratch while
# the previous chunk dequantizes+dots hides the whole convert under the
# DMA stream (84% of the 819 GB/s roofline). Reference bar:
# sgl-kernel csrc/gemm/awq_kernel.cu at memory roofline.
# --------------------------------------------------------------------------


def _int4_dma_kernel(x_ref, w_hbm, s_hbm, zs_hbm, o_ref,
                     wbuf, wsem, sbuf, ssem, zbuf, zsem, pipe,
                     *, n_k, n_j, BK, BN, group, has_zero, layer_ref=None,
                     eight_bit=False):
    """Globally pipelined dequant-GEMM: ONE double-buffered DMA stream
    runs across ALL grid steps (scratch persists on the sequential TPU
    grid) — while chunk (j, k) dequantizes+dots, chunk (j, k+1) (or the
    next column block's first chunk) is already in flight, so the HBM
    stream never drains at block boundaries. Without this the per-block
    DMA -> dequant -> dot sequence is fully serialized (measured ~300
    GB/s in-model vs the 819 GB/s roofline). Same design as the decode
    attention kernel's cross-sequence pipeline.

    layer_ref: optional SMEM scalar — weights carry a leading stacked
    layer dim [L, K/2, N] and the kernel reads the indexed layer directly
    from HBM. This is the scan-over-stacked-layers fix: slicing the stack
    OUTSIDE the kernel makes XLA materialize a full HBM->HBM copy of
    every layer's weights per step (a custom-call operand cannot alias a
    dynamic-slice), which the r2 xprof trace showed was ~40% of the whole
    decode step (~0.31 ms/layer/step at llama-8B geometry)."""
    j = pl.program_id(0)
    nG = BK // group

    if layer_ref is not None:
        li = layer_ref[0]
        w_l = w_hbm.at[li]
        s_l = s_hbm.at[li]
        zs_l = zs_hbm.at[li] if has_zero else None
    else:
        w_l, s_l, zs_l = w_hbm, s_hbm, zs_hbm

    wrows = BK if eight_bit else BK // 2   # HBM rows per K-chunk

    def w_copy(jj, k, slot):
        return pltpu.make_async_copy(
            w_l.at[pl.ds(k * wrows, wrows), pl.ds(jj * BN, BN)],
            wbuf.at[slot], wsem.at[slot])

    def s_copy(jj, slot):
        return pltpu.make_async_copy(
            s_l.at[:, pl.ds(jj * BN, BN)], sbuf.at[slot], ssem.at[slot])

    def z_copy(jj, slot):
        return pltpu.make_async_copy(
            zs_l.at[:, pl.ds(jj * BN, BN)], zbuf.at[slot], zsem.at[slot])

    def start_block(jj, slot):
        """First weight chunk + scale tables of column block jj."""
        s_copy(jj, jax.lax.rem(jj, 2)).start()
        if has_zero:
            z_copy(jj, jax.lax.rem(jj, 2)).start()
        w_copy(jj, 0, slot).start()

    @pl.when(j == 0)
    def _boot():
        pipe[0] = 0
        start_block(0, 0)

    jslot = jax.lax.rem(j, 2)
    s_copy(j, jslot).wait()
    if has_zero:
        z_copy(j, jslot).wait()

    def body(k, acc):
        gc = pipe[0]
        slot = jax.lax.rem(gc, 2)
        nslot = jax.lax.rem(gc + 1, 2)

        # keep the DMA engine busy: queue the next chunk (ours, or the
        # next column block's first) BEFORE waiting on the current one
        @pl.when(k + 1 < n_k)
        def _():
            w_copy(j, k + 1, nslot).start()

        @pl.when((k + 1 >= n_k) & (j + 1 < n_j))
        def _():
            start_block(j + 1, nslot)

        w_copy(j, k, slot).wait()
        pipe[0] = gc + 1
        if wbuf.dtype == jnp.int8 and not eight_bit:
            w4 = pltpu.bitcast(wbuf[slot], jnp.int4)    # [BK, BN] nibbles
        else:
            w4 = wbuf[slot]                             # int8 / fp8 direct
        s = sbuf[jslot, pl.ds(k * nG, nG)]              # f32 [nG, BN]
        if _DEQUANT_MODE == "bf16" and x_ref.dtype == jnp.bfloat16 \
                and not has_zero:
            w3 = (w4.astype(jnp.bfloat16).reshape(nG, group, BN)
                  * s.astype(jnp.bfloat16)[:, None, :])
            wf = w3.reshape(BK, BN)
        else:
            w3 = (w4.astype(jnp.float32).reshape(nG, group, BN)
                  * s[:, None, :])
            if has_zero:
                w3 = w3 - zbuf[jslot, pl.ds(k * nG, nG)][:, None, :]
            wf = w3.reshape(BK, BN).astype(x_ref.dtype)
        xk = x_ref[:, pl.ds(k * BK, BK)]
        return acc + jax.lax.dot_general(
            xk, wf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_k, body, jnp.zeros(o_ref.shape, jnp.float32))
    o_ref[...] = acc.astype(o_ref.dtype)


def _pick_block(dim: int, cap: int, step: int) -> int:
    """Largest multiple of `step` that divides `dim`, capped at `cap`
    (dim is known to be a multiple of step)."""
    best = step
    m = cap // step
    while m >= 1:
        if dim % (m * step) == 0:
            best = m * step
            break
        m -= 1
    return best


@functools.partial(
    jax.jit, static_argnames=("group", "block_n", "block_k", "interpret"))
def int4_matmul_dma(
    x: jnp.ndarray,          # [T, K] bf16/f32
    packed: jnp.ndarray,     # [K/2, N] int8 (row-pair nibbles, signed)
    scale: jnp.ndarray,      # [K/G, N] f32
    zero_scale: Optional[jnp.ndarray] = None,  # [K/G, N] f32 (zero-8)*scale
    *,
    group: int = GROUP,
    block_n: int = 1024,
    block_k: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    T, K = x.shape
    Kh, N = packed.shape
    assert Kh * 2 == K, (x.shape, packed.shape)
    g = group if K % group == 0 else K
    # scale slices need 8-sublane-aligned offsets: BK multiple of 8 groups
    BK = _pick_block(K, min(block_k, K), g * 8) if K % (g * 8) == 0 else K
    BN = _pick_block(N, min(block_n, N), 128) if N % 128 == 0 else N
    n_k = K // BK
    has_zero = zero_scale is not None
    kernel = functools.partial(
        _int4_dma_kernel, n_k=n_k, n_j=N // BN, BK=BK, BN=BN, group=g,
        has_zero=has_zero)
    args = [x, packed, scale]
    in_specs = [
        pl.BlockSpec((T, K), lambda j: (0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_zero:
        args.append(zero_scale)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
        kern = kernel
    else:
        kern = lambda x_r, w_r, s_r, o_r, *sc: kernel(
            x_r, w_r, s_r, None, o_r, *sc)
    return pl.pallas_call(
        kern,
        grid=(N // BN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, BN), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        scratch_shapes=_dma_scratch(BK, BN, K, g),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def _dma_scratch(BK, BN, K, g, w_dtype=jnp.int8, eight_bit=False):
    return [
        pltpu.VMEM((2, BK if eight_bit else BK // 2, BN), w_dtype),  # wbuf
        pltpu.SemaphoreType.DMA((2,)),                # wsem
        pltpu.VMEM((2, K // g, BN), jnp.float32),     # sbuf
        pltpu.SemaphoreType.DMA((2,)),                # ssem
        pltpu.VMEM((2, K // g, BN), jnp.float32),     # zbuf
        pltpu.SemaphoreType.DMA((2,)),                # zsem
        pltpu.SMEM((1,), jnp.int32),                  # global chunk counter
    ]


# --------------------------------------------------------------------------
# Integer-dot W4A8 path (VERDICT r4 #2, reference
# sgl-kernel/csrc/gemm/qserve_w4a8_per_group_gemm.cu / w8a8_int8.py):
# activations quantize per-token to int8 (one cheap XLA pass), the MXU
# runs native int8 x int8 -> int32 batched GROUP dots on the raw nibbles
# (int4 -> int8 convert only — no f32 dequant pass, no weight-side scale
# multiply), and the per-group f32 scales hit the tiny [nG, T, BN] int32
# partials. Measured on the 32-layer llama-8B gate-proj stack (r4 probe):
# 1.43 ms/rep (658 GB/s) vs the f32 dequant chain's 1.75 ms (539 GB/s).
# A direct int4-operand MXU dot crashes Mosaic (probed); the int8 convert
# stays. Wins only at decode T (the [nG, T, g] batched dots leave the MXU
# latency-bound at prefill T where weight-side dequant amortizes), so
# qmatmul gates it on x rows <= W4A8_MAX_T.
# --------------------------------------------------------------------------

W4A8_MAX_T = 64


def quantize_act_int8(x: jnp.ndarray, group: int = GROUP):
    """Per-token symmetric int8 activation quantization.

    Returns (xq int8 [T, K], xs f32 [T, 1], rs f32 [T, K/group]) where rs
    holds per-group row sums of xq (the AWQ zero-point correction needs
    rowsum(x) per group; in the integer domain that is xs * rowsum(xq))."""
    xf = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    T, K = x.shape
    g = group if K % group == 0 else K
    rs = xq.astype(jnp.int32).reshape(T, K // g, g).sum(-1).astype(
        jnp.float32)
    return xq, s, rs


def group_act_int8(xq: jnp.ndarray, group: int = GROUP) -> jnp.ndarray:
    """[T, K] int8 -> [K/g, T, g] grouped layout for the a8 kernel.

    The a8 kernel's batched group dots need [nG, T, g] operands; doing
    that reshape+transpose inside the kernel repeats it once per N-block
    grid step (n_j times per call, VPU sublane shuffles on the critical
    path before each dot). One XLA transpose here replaces all of them."""
    T, K = xq.shape
    g = group if K % group == 0 else K
    return xq.reshape(T, K // g, g).transpose(1, 0, 2)


def _q_a8_dma_kernel(xq_ref, xs_ref, rs_ref, w_hbm, s_hbm, zs_hbm, o_ref,
                     wbuf, wsem, sbuf, ssem, zbuf, zsem, pipe,
                     *, n_k, n_j, BK, BN, group, has_zero, layer_ref=None,
                     eight_bit=False, pre_grouped=False):
    """Same global cross-grid-step DMA pipeline as _int4_dma_kernel, with
    integer-dot compute: per K-chunk, batched [nG, T, g] x [nG, g, BN]
    int8 dots -> int32 partials, scaled by the f32 group scales into the
    f32 accumulator; the per-token activation scale multiplies once at
    the end. AWQ zeros fold in exactly: dot(x, q*s - zs) =
    xs * (idot(xq, q) * s - rowsum(xq) @ zs)."""
    j = pl.program_id(0)
    nG = BK // group
    T = xq_ref.shape[1] if pre_grouped else xq_ref.shape[0]

    if layer_ref is not None:
        li = layer_ref[0]
        w_l = w_hbm.at[li]
        s_l = s_hbm.at[li]
        zs_l = zs_hbm.at[li] if has_zero else None
    else:
        w_l, s_l, zs_l = w_hbm, s_hbm, zs_hbm

    wrows = BK if eight_bit else BK // 2

    def w_copy(jj, k, slot):
        return pltpu.make_async_copy(
            w_l.at[pl.ds(k * wrows, wrows), pl.ds(jj * BN, BN)],
            wbuf.at[slot], wsem.at[slot])

    def s_copy(jj, slot):
        return pltpu.make_async_copy(
            s_l.at[:, pl.ds(jj * BN, BN)], sbuf.at[slot], ssem.at[slot])

    def z_copy(jj, slot):
        return pltpu.make_async_copy(
            zs_l.at[:, pl.ds(jj * BN, BN)], zbuf.at[slot], zsem.at[slot])

    def start_block(jj, slot):
        s_copy(jj, jax.lax.rem(jj, 2)).start()
        if has_zero:
            z_copy(jj, jax.lax.rem(jj, 2)).start()
        w_copy(jj, 0, slot).start()

    @pl.when(j == 0)
    def _boot():
        pipe[0] = 0
        start_block(0, 0)

    jslot = jax.lax.rem(j, 2)
    s_copy(j, jslot).wait()
    if has_zero:
        z_copy(j, jslot).wait()

    def body(k, acc):
        gc = pipe[0]
        slot = jax.lax.rem(gc, 2)
        nslot = jax.lax.rem(gc + 1, 2)

        @pl.when(k + 1 < n_k)
        def _():
            w_copy(j, k + 1, nslot).start()

        @pl.when((k + 1 >= n_k) & (j + 1 < n_j))
        def _():
            start_block(j + 1, nslot)

        w_copy(j, k, slot).wait()
        pipe[0] = gc + 1
        if eight_bit:
            w8 = wbuf[slot]                                  # int8 [BK, BN]
        else:
            w8 = pltpu.bitcast(wbuf[slot], jnp.int4).astype(jnp.int8)
        s = sbuf[jslot, pl.ds(k * nG, nG)]                   # f32 [nG, BN]
        if pre_grouped:
            xg = xq_ref[pl.ds(k * nG, nG)]                   # [nG, T, g]
        else:
            xg = (xq_ref[:, pl.ds(k * BK, BK)]
                  .reshape(T, nG, group).transpose(1, 0, 2))  # [nG, T, g]
        part = jax.lax.dot_general(
            xg, w8.reshape(nG, group, BN),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)                # [nG, T, BN]
        acc = acc + jnp.sum(part.astype(jnp.float32) * s[:, None, :],
                            axis=0)
        if has_zero:
            rsk = rs_ref[:, pl.ds(k * nG, nG)]               # f32 [T, nG]
            acc = acc - jax.lax.dot_general(
                rsk, zbuf[jslot, pl.ds(k * nG, nG)],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(
        0, n_k, body, jnp.zeros(o_ref.shape, jnp.float32))
    o_ref[...] = (acc * xs_ref[...]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group", "block_n", "block_k", "eight_bit",
                              "pre_grouped", "interpret"))
def q_matmul_dma_stacked_a8(
    xq: jnp.ndarray,         # [T, K] int8 | [K/G, T, G] (pre_grouped)
    xs: jnp.ndarray,         # [T, 1] f32 per-token scale
    rs: jnp.ndarray,         # [T, K/G] f32 per-group row sums of xq
    packed: jnp.ndarray,     # [L, K/2, N] int8 nibbles | [L, K, N] int8
    scale: jnp.ndarray,      # [L, K/G, N] f32
    zero_scale,              # [L, K/G, N] f32 | None
    layer: jnp.ndarray,      # i32[] traced layer index
    *,
    group: int = GROUP,
    block_n: int = 1024,
    block_k: int = 4096,
    eight_bit: bool = False,
    pre_grouped: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    if pre_grouped:
        nGt, T, g0 = xq.shape
        K = nGt * g0
    else:
        T, K = xq.shape
    L = packed.shape[0]
    N = packed.shape[2]
    g = group if K % group == 0 else K
    BK = _pick_block(K, min(block_k, K), g * 8) if K % (g * 8) == 0 else K
    BN = _pick_block(N, min(block_n, N), 128) if N % 128 == 0 else N
    has_zero = zero_scale is not None
    kernel = functools.partial(
        _q_a8_dma_kernel, n_k=K // BK, n_j=N // BN, BK=BK, BN=BN, group=g,
        has_zero=has_zero, eight_bit=eight_bit, pre_grouped=pre_grouped)

    def kern(layer_r, xq_r, xs_r, rs_r, w_r, s_r, *rest):
        if has_zero:
            zs_r, o_r, *scratch = rest
        else:
            zs_r, (o_r, *scratch) = None, rest
        return kernel(xq_r, xs_r, rs_r, w_r, s_r, zs_r, o_r, *scratch,
                      layer_ref=layer_r)

    args = [jnp.asarray(layer, jnp.int32).reshape(1), xq, xs, rs,
            packed, scale]
    in_specs = [
        (pl.BlockSpec((K // g, T, g), lambda j, *_: (0, 0, 0))
         if pre_grouped else pl.BlockSpec((T, K), lambda j, *_: (0, 0))),
        pl.BlockSpec((T, 1), lambda j, *_: (0, 0)),
        pl.BlockSpec((T, K // g), lambda j, *_: (0, 0)),
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec(memory_space=pltpu.ANY),
    ]
    if has_zero:
        args.append(zero_scale)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // BN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, BN), lambda j, *_: (0, j)),
        scratch_shapes=_dma_scratch(BK, BN, K, g, eight_bit=eight_bit),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


@functools.partial(
    jax.jit, static_argnames=("group", "block_n", "block_k", "interpret"))
def q8_matmul_dma(
    x: jnp.ndarray,          # [T, K] bf16/f32
    w: jnp.ndarray,          # [K, N] int8 | float8_e4m3fn
    scale: jnp.ndarray,      # [K/G, N] f32 (dequant = w * scale)
    *,
    group: int = GROUP,
    block_n: int = 1024,
    block_k: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """8-bit (INT8 / FP8-e4m3) fused dequant-GEMM on the same globally
    pipelined DMA kernel as INT4: weights stream from HBM at 1 byte/elem
    and upcast+scale in VMEM. The XLA fallback materializes a bf16 copy
    of every weight (>=3x HBM traffic) and, inside a layer scan, an extra
    dynamic-slice copy — this kernel is the reference's fp8/int8 GEMM
    answer (sgl-kernel csrc/gemm/) for the TPU. Blockwise (128x128) FP8
    checkpoints pre-expand weight_scale_inv along N to [K/128, N] at load
    (exact: block scales are constant within each 128-column group)."""
    T, K = x.shape
    Kw, N = w.shape
    assert Kw == K, (x.shape, w.shape)
    g = group if K % group == 0 else K
    BK = _pick_block(K, min(block_k, K), g * 8) if K % (g * 8) == 0 else K
    BN = _pick_block(N, min(block_n, N), 128) if N % 128 == 0 else N
    kernel = functools.partial(
        _int4_dma_kernel, n_k=K // BK, n_j=N // BN, BK=BK, BN=BN, group=g,
        has_zero=False, eight_bit=True)
    kern = lambda x_r, w_r, s_r, o_r, *sc: kernel(
        x_r, w_r, s_r, None, o_r, *sc)
    return pl.pallas_call(
        kern,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((T, K), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, BN), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        scratch_shapes=_dma_scratch(BK, BN, K, g, w.dtype, eight_bit=True),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x, w, scale)


@functools.partial(
    jax.jit, static_argnames=("group", "block_n", "block_k", "interpret"))
def q8_matmul_dma_stacked(
    x: jnp.ndarray,          # [T, K]
    w: jnp.ndarray,          # [L, K, N] int8 | float8_e4m3fn
    scale: jnp.ndarray,      # [L, K/G, N] f32
    layer: jnp.ndarray,      # i32[] traced layer index
    *,
    group: int = GROUP,
    block_n: int = 1024,
    block_k: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """q8_matmul_dma over one layer of a stacked weight array, indexed
    INSIDE the kernel (no per-layer HBM copy — see QuantLayerRef)."""
    T, K = x.shape
    L, Kw, N = w.shape
    assert Kw == K, (x.shape, w.shape)
    g = group if K % group == 0 else K
    BK = _pick_block(K, min(block_k, K), g * 8) if K % (g * 8) == 0 else K
    BN = _pick_block(N, min(block_n, N), 128) if N % 128 == 0 else N
    kernel = functools.partial(
        _int4_dma_kernel, n_k=K // BK, n_j=N // BN, BK=BK, BN=BN, group=g,
        has_zero=False, eight_bit=True)

    def kern(layer_r, x_r, w_r, s_r, o_r, *scratch):
        return kernel(x_r, w_r, s_r, None, o_r, *scratch,
                      layer_ref=layer_r)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // BN,),
        in_specs=[
            pl.BlockSpec((T, K), lambda j, *_: (0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((T, BN), lambda j, *_: (0, j)),
        scratch_shapes=_dma_scratch(BK, BN, K, g, w.dtype, eight_bit=True),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x, w, scale)


@functools.partial(
    jax.jit, static_argnames=("group", "block_n", "block_k", "interpret"))
def int4_matmul_dma_stacked(
    x: jnp.ndarray,          # [T, K] bf16/f32
    packed: jnp.ndarray,     # [L, K/2, N] int8 — FULL layer stack
    scale: jnp.ndarray,      # [L, K/G, N] f32
    zero_scale: Optional[jnp.ndarray],   # [L, K/G, N] f32 | None
    layer: jnp.ndarray,      # i32[] traced layer index (scan carry)
    *,
    group: int = GROUP,
    block_n: int = 1024,
    block_k: int = 4096,
    interpret: bool = False,
) -> jnp.ndarray:
    """int4_matmul_dma over ONE layer of a stacked weight array, indexed
    INSIDE the kernel (scalar-prefetch layer id -> HBM source offset).
    Used by the per-layer lax.scan: no per-layer weight copy, no extra
    HBM traffic — the kernel reads the live layer's nibbles directly."""
    T, K = x.shape
    L, Kh, N = packed.shape
    assert Kh * 2 == K, (x.shape, packed.shape)
    g = group if K % group == 0 else K
    BK = _pick_block(K, min(block_k, K), g * 8) if K % (g * 8) == 0 else K
    BN = _pick_block(N, min(block_n, N), 128) if N % 128 == 0 else N
    n_k = K // BK
    has_zero = zero_scale is not None
    kernel = functools.partial(
        _int4_dma_kernel, n_k=n_k, n_j=N // BN, BK=BK, BN=BN, group=g,
        has_zero=has_zero)

    def kern(layer_r, x_r, w_r, s_r, *rest):
        if has_zero:
            zs_r, o_r, *scratch = rest
        else:
            zs_r, (o_r, *scratch) = None, rest
        return kernel(x_r, w_r, s_r, zs_r, o_r, *scratch,
                      layer_ref=layer_r)

    args = [jnp.asarray(layer, jnp.int32).reshape(1), x, packed, scale]
    in_specs = [
        pl.BlockSpec((T, K), lambda j, *_: (0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    if has_zero:
        args.append(zero_scale)
        in_specs.append(pl.BlockSpec(memory_space=pl.ANY))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N // BN,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, BN), lambda j, *_: (0, j)),
        scratch_shapes=_dma_scratch(BK, BN, K, g),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, N), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
