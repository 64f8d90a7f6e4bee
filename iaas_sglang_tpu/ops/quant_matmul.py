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
                     wbuf, sems, sbuf, zbuf, ssem,
                     *, n_k, BK, BN, group, has_zero):
    j = pl.program_id(0)
    nG = BK // group

    def dma(k, slot):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(k * (BK // 2), BK // 2), pl.ds(j * BN, BN)],
            wbuf.at[slot], sems.at[slot])

    sdma = pltpu.make_async_copy(
        s_hbm.at[:, pl.ds(j * BN, BN)], sbuf, ssem.at[0])
    sdma.start()
    if has_zero:
        zdma = pltpu.make_async_copy(
            zs_hbm.at[:, pl.ds(j * BN, BN)], zbuf, ssem.at[1])
        zdma.start()
    dma(0, 0).start()
    sdma.wait()
    if has_zero:
        zdma.wait()

    def body(k, acc):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_k)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        dma(k, slot).wait()
        w4 = pltpu.bitcast(wbuf[slot], jnp.int4)        # [BK, BN]
        s = sbuf[pl.ds(k * nG, nG)]                     # f32 [nG, BN]
        w3 = w4.astype(jnp.float32).reshape(nG, group, BN) * s[:, None, :]
        if has_zero:
            w3 = w3 - zbuf[pl.ds(k * nG, nG)][:, None, :]
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
        _int4_dma_kernel, n_k=n_k, BK=BK, BN=BN, group=g, has_zero=has_zero)
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
        scratch_shapes=[
            pltpu.VMEM((2, BK // 2, BN), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((K // g, BN), jnp.float32),
            pltpu.VMEM((K // g, BN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
