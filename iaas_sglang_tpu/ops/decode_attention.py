"""Pallas TPU kernel: batched paged-KV decode attention.

The serving hot loop (TPU re-design of the reference's decode attention
backends — flashinfer_backend.py / triton decode_attention.py). One query
token per sequence attends over that sequence's paged KV:

    q            [B, Nq, D]
    kv_pages     [NP, page_size, 2*Nk, D]   K at even, V at odd head index
    kv_lens      i32[B]
    page_indices i32[B, MP]

Design: grid over sequences; each program streams its sequence's KV pages
HBM -> VMEM with double-buffered async DMAs (CHUNK_PAGES pages per step)
and runs GQA flash-attention accumulation in fp32 on the fly. Decode is
HBM-bandwidth bound — the kernel's job is to keep the DMA engine saturated
while the VPU/MXU hides under it.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iaas_sglang_tpu.utils import cdiv

DEFAULT_CHUNK_PAGES = 16


def _decode_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B]            (SMEM)
    page_indices_ref,  # i32[B, MP]        (SMEM)
    window_ref,        # i32[1] sliding window, -1 = full attention (SMEM)
    # inputs
    q_ref,             # [1, Nq, D]        (VMEM block)
    kv_hbm_ref,        # [NP, ps, 2Nk, D]  (ANY/HBM)
    # outputs
    o_ref,             # [1, Nq, D]        (VMEM block)
    # scratch
    kv_buf,            # [2, CP, ps, 2Nk, D] VMEM
    sems,              # DMA sems (2, CP)
    *,
    num_kv_heads: int,
    chunk_pages: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    logit_softcap: Optional[float],
    win_chunked: bool = False,
):
    s = pl.program_id(0)
    CP = chunk_pages
    CT = CP * page_size  # tokens per chunk

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, CT)

    # padding rows arrive with kv_len == 0: no DMAs, output zeros
    @pl.when(n_chunks > 0)
    def _run():

        def start_chunk(ci, slot):
            for j in range(CP):
                pidx = jnp.minimum(ci * CP + j, max_pages - 1)
                page = page_indices_ref[s, pidx]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page],
                    kv_buf.at[slot, j],
                    sems.at[slot, j],
                ).start()

        def wait_chunk(slot):
            for j in range(CP):
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0],  # shape-only; sem carries identity
                    kv_buf.at[slot, j],
                    sems.at[slot, j],
                ).wait()

        start_chunk(0, 0)

        Nk = num_kv_heads
        q = q_ref[0]                          # [Nq, D] bf16 (MXU-native)
        Nq, D = q.shape
        G = Nq // Nk

        def body(ci, carry):
            ms, ls, accs = carry  # tuples of per-head [G,1],[G,1],[G,D] fp32
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk(ci + 1, jax.lax.rem(ci + 1, 2))

            wait_chunk(slot)
            buf = kv_buf[slot]                 # [CP, ps, 2Nk, D]
            # lane-dim head slicing: offsets are 128-aligned so each per-head
            # K/V view is a cheap register slice (measured 1.8x faster than
            # sublane-strided [CT, Nk, 2, D] slicing on v5e)
            flat2 = buf.reshape(CT, 2 * Nk * D)

            pos = ci * CT + jax.lax.broadcasted_iota(jnp.int32, (1, CT), 1)
            valid = pos < kv_len
            win = window_ref[0]
            if win_chunked:
                # Llama-4 chunked local attention: the single query sits
                # at position kv_len-1; keys from its chunk only
                valid &= (win < 0) | (pos >= ((kv_len - 1) // win) * win)
            else:
                valid &= (win < 0) | (pos > kv_len - 1 - win)

            new_ms, new_ls, new_accs = [], [], []
            for h in range(Nk):
                k_h = flat2[:, (2 * h) * D : (2 * h + 1) * D]      # [CT, D]
                v_h = flat2[:, (2 * h + 1) * D : (2 * h + 2) * D]  # [CT, D]
                if k_h.dtype != q.dtype:   # fp8 KV: upcast for the MXU
                    k_h = k_h.astype(q.dtype)
                    v_h = v_h.astype(q.dtype)
                q_h = q[h * G : (h + 1) * G]                # [G, D] static slice
                scores = jax.lax.dot_general(
                    q_h, k_h,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                                # f32 [G, CT]
                if logit_softcap:
                    scores = logit_softcap * jnp.tanh(scores / logit_softcap)
                scores = jnp.where(valid, scores, -jnp.inf)

                m_c = jnp.max(scores, axis=-1, keepdims=True)
                m_n = jnp.maximum(ms[h], m_c)
                alpha = jnp.exp(ms[h] - m_n)
                p = jnp.exp(scores - m_n)                   # f32 [G, CT]
                l_n = alpha * ls[h] + jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v_h.dtype), v_h,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                           # f32 [G, D]
                new_ms.append(m_n)
                new_ls.append(l_n)
                new_accs.append(alpha * accs[h] + pv)
            return tuple(new_ms), tuple(new_ls), tuple(new_accs)

        m0 = tuple(jnp.full((G, 1), -jnp.inf, jnp.float32) for _ in range(Nk))
        l0 = tuple(jnp.zeros((G, 1), jnp.float32) for _ in range(Nk))
        acc0 = tuple(jnp.zeros((G, D), jnp.float32) for _ in range(Nk))
        ms, ls, accs = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
        out = jnp.concatenate(
            [accs[h] / jnp.maximum(ls[h], 1e-30) for h in range(Nk)], axis=0
        )
        o_ref[0] = out.astype(o_ref.dtype)

    @pl.when(n_chunks == 0)
    def _pad():
        o_ref[0] = jnp.zeros_like(o_ref[0])


def _mla_decode_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B]            (SMEM)
    page_indices_ref,  # i32[B, MP]        (SMEM)
    # inputs
    q_ref,             # [1, Nq, Dk]       (VMEM block)
    kv_hbm_ref,        # [NP, ps, Dk]      (ANY/HBM; entry axis squeezed —
                       #  Mosaic cannot tile a size-1 middle dim)
    # outputs
    o_ref,             # [1, Nq, v_dim]    (VMEM block)
    # scratch
    kv_buf,            # [2, CP, ps, Dk] VMEM
    sems,
    *,
    chunk_pages: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    v_dim: int,
):
    """MLA decode: MQA over one shared latent KV entry per token
    (absorbed-query formulation; V = entry[:, :v_dim]). All heads hit the
    same K chunk, so each chunk is ONE [Nq, CT] matmul + ONE [Nq, v_dim]
    matmul — the MXU shape the 128-head DeepSeek geometry wants."""
    s = pl.program_id(0)
    CP = chunk_pages
    CT = CP * page_size

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, CT)

    @pl.when(n_chunks > 0)
    def _run():
        def start_chunk(ci, slot):
            for j in range(CP):
                pidx = jnp.minimum(ci * CP + j, max_pages - 1)
                page = page_indices_ref[s, pidx]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).start()

        def wait_chunk(slot):
            for j in range(CP):
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0], kv_buf.at[slot, j], sems.at[slot, j]
                ).wait()

        start_chunk(0, 0)
        q = q_ref[0]                              # [Nq, Dk]
        Nq, Dk = q.shape

        def body(ci, carry):
            m, l, acc = carry                     # [Nq,1], [Nq,1], [Nq,v_dim]
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk(ci + 1, jax.lax.rem(ci + 1, 2))

            wait_chunk(slot)
            kv = kv_buf[slot].reshape(CT, Dk)     # [CT, Dk]
            if kv.dtype != q.dtype:               # fp8 KV: upcast for the MXU
                kv = kv.astype(q.dtype)

            pos = ci * CT + jax.lax.broadcasted_iota(jnp.int32, (1, CT), 1)
            valid = pos < kv_len

            scores = jax.lax.dot_general(
                q, kv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale                          # f32 [Nq, CT]
            scores = jnp.where(valid, scores, -jnp.inf)

            m_c = jnp.max(scores, axis=-1, keepdims=True)
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(scores - m_n)
            l_n = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            v = kv[:, :v_dim]                     # lane-aligned slice
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                     # f32 [Nq, v_dim]
            return m_n, l_n, alpha * acc + pv

        Nq = q.shape[0]
        m0 = jnp.full((Nq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((Nq, 1), jnp.float32)
        acc0 = jnp.zeros((Nq, v_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, acc0))
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    @pl.when(n_chunks == 0)
    def _pad():
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "v_dim", "chunk_pages", "interpret"),
)
def mla_paged_decode_attention(
    q: jnp.ndarray,             # [B, Nq, Dk]
    kv_pages: jnp.ndarray,      # [NP, ps, 1, Dk]
    kv_lens: jnp.ndarray,       # i32[B]
    page_indices: jnp.ndarray,  # i32[B, MP]
    *,
    sm_scale: float,
    v_dim: int,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, Dk = q.shape
    NP, ps, _, _ = kv_pages.shape
    kv_flat = kv_pages.reshape(NP, ps, Dk)
    MP = page_indices.shape[1]
    CP = min(chunk_pages, MP)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Nq, Dk), lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, Nq, v_dim), lambda s, *_: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CP, ps, Dk), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, CP)),
        ],
    )
    kernel = functools.partial(
        _mla_decode_kernel,
        chunk_pages=CP,
        page_size=ps,
        max_pages=MP,
        sm_scale=sm_scale,
        v_dim=v_dim,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, v_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, q, kv_flat)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "logit_softcap", "chunk_pages",
                     "window_chunked"),
)
def paged_decode_attention(
    q: jnp.ndarray,             # [B, Nq, D]
    kv_pages: jnp.ndarray,      # [NP, ps, 2Nk, D]
    kv_lens: jnp.ndarray,       # i32[B]
    page_indices: jnp.ndarray,  # i32[B, MP]
    sliding_window=None,        # None | int | traced i32 scalar (-1 = off)
    *,
    sm_scale: float,
    logit_softcap: Optional[float] = None,
    window_chunked: bool = False,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
) -> jnp.ndarray:
    B, Nq, D = q.shape
    NP, ps, NK2, _ = kv_pages.shape
    Nk = NK2 // 2
    MP = page_indices.shape[1]
    CP = min(chunk_pages, MP)
    window = jnp.full((1,), -1, jnp.int32) if sliding_window is None \
        else jnp.asarray(sliding_window, jnp.int32).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, Nq, D), lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, Nq, D), lambda s, *_: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, CP, ps, NK2, D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, CP)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        num_kv_heads=Nk,
        chunk_pages=CP,
        page_size=ps,
        max_pages=MP,
        sm_scale=sm_scale,
        logit_softcap=logit_softcap,
        win_chunked=window_chunked,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(kv_lens, page_indices, window, q, kv_pages)
