"""Pallas TPU kernel: ragged extend/prefill attention over paged KV.

Our own replacement for the extend half of the attention interface (the
reference's FA3/flashinfer prefill path; the decode half lives in
ops/decode_attention.py). Each grid step processes one (sequence,
q-tile) pair: the tile's queries attend to the sequence's paged KV with
flash accumulation, streaming CP pages per chunk HBM->VMEM with
double-buffered DMA, and causal masking against the tile's absolute
positions (prefix KV fully visible, new tokens lower-triangular).

Correctness details:
  * grid is s-major and TPU grids run sequentially on the core, so a
    tile's full-BQ output write may overrun into the next sequence's
    first rows — the next sequence's own tile overwrites them later.
  * the wrapper pads q/out by BQ rows so the overrun never clips.
  * causal chunk skipping: KV chunks entirely above the tile's last
    position are not fetched.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from iaas_sglang_tpu.utils import cdiv

DEFAULT_BQ = 128
DEFAULT_CHUNK_PAGES = 16


def _extend_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B]
    page_indices_ref,  # i32[B, MP]
    cu_q_lens_ref,     # i32[B+1]
    window_ref,        # i32[1] sliding window, -1 = full attention
    tree_bits_ref,     # i32[B, 32] spec-tree ancestor bitmasks (or [1, 1])
    # inputs (ANY: manual DMA)
    q_hbm,             # [Tpad, Nq, D]
    kv_hbm,            # [NP, ps, 2Nk, D] | split [2, NP, ps, NkD]
    # output (ANY: manual DMA)
    o_hbm,             # [Tpad, Nq, D]
    # scratch
    q_buf,             # VMEM [BQ, Nq, D]
    kv_buf,            # VMEM [2, CP, ps, 2Nk, D]
    o_buf,             # VMEM [BQ, Nq, D]
    q_sem, o_sem, kv_sems,
    *,
    num_kv_heads: int,
    bq: int,
    chunk_pages: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    logit_softcap: Optional[float],
    tree: bool = False,
    chunked: bool = False,
    split: bool = False,   # K/V-split page layout [NP, ps, 2, NkD]
):
    s = pl.program_id(0)
    qt = pl.program_id(1)
    Nk = num_kv_heads
    CP = chunk_pages
    CT = CP * page_size

    q_start = cu_q_lens_ref[s]
    q_len = cu_q_lens_ref[s + 1] - q_start
    kv_len = kv_lens_ref[s]

    @pl.when((qt * bq < q_len) & (q_len > 0))
    def _run():
        row0 = q_start + qt * bq
        # absolute position of the tile's first/last query token
        pos0 = kv_len - q_len + qt * bq
        pos_last = jnp.minimum(pos0 + bq - 1, kv_len - 1)
        n_chunks = pl.cdiv(jnp.minimum(pos_last + 1, kv_len), CT)

        in_q = pltpu.make_async_copy(
            q_hbm.at[pl.ds(row0, bq)], q_buf, q_sem)
        in_q.start()

        def start_chunk(ci, slot):
            for j in range(CP):
                pidx = jnp.minimum(ci * CP + j, max_pages - 1)
                page = page_indices_ref[s, pidx]
                if split:
                    for e in range(2):
                        pltpu.make_async_copy(
                            kv_hbm.at[e, page], kv_buf.at[slot, e, j],
                            kv_sems.at[slot, e, j],
                        ).start()
                else:
                    pltpu.make_async_copy(
                        kv_hbm.at[page], kv_buf.at[slot, j],
                        kv_sems.at[slot, j],
                    ).start()

        def wait_chunk(slot):
            for j in range(CP):
                if split:
                    for e in range(2):
                        pltpu.make_async_copy(
                            kv_hbm.at[e, 0], kv_buf.at[slot, e, j],
                            kv_sems.at[slot, e, j],
                        ).wait()
                else:
                    pltpu.make_async_copy(
                        kv_hbm.at[0], kv_buf.at[slot, j], kv_sems.at[slot, j],
                    ).wait()

        start_chunk(0, 0)
        in_q.wait()
        q = q_buf[:]                          # [BQ, Nq, D] bf16
        BQ, Nq, D = q.shape
        G = Nq // Nk

        # row positions within the sequence (absolute key-space)
        row_pos = pos0 + jax.lax.broadcasted_iota(jnp.int32, (BQ, 1), 0)
        if tree:
            # per-row ancestor bitmask over the q segment (the last q_len
            # KV slots): BQ is capped at 32 in tree mode, so the bits fit
            # one SMEM scalar read per row
            bits = jnp.concatenate(
                [jnp.full((1, 1), tree_bits_ref[s, r], jnp.int32)
                 for r in range(bq)], axis=0)                # [BQ, 1]
            seg_start = kv_len - q_len

        def body(ci, carry):
            ms, ls, accs = carry
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk(ci + 1, jax.lax.rem(ci + 1, 2))

            wait_chunk(slot)
            if split:
                kr_all = kv_buf[slot, 0].reshape(CT, Nk * D)
                vr_all = kv_buf[slot, 1].reshape(CT, Nk * D)
            else:
                flat2 = kv_buf[slot].reshape(CT, 2 * Nk * D)
            key_pos = ci * CT + jax.lax.broadcasted_iota(
                jnp.int32, (1, CT), 1)                       # [1, CT]
            if tree:
                # prefix keys fully visible; segment keys by ancestor bit
                jseg = key_pos - seg_start                   # [1, CT]
                allow = jnp.bitwise_and(jnp.right_shift(
                    bits, jnp.clip(jseg, 0, 31)), 1) == 1    # [BQ, CT]
                valid = (key_pos < kv_len) & ((jseg < 0) | allow)
            else:
                # causal: key <= query position; bounded by kv_len
                valid = (key_pos <= row_pos) & (key_pos < kv_len)  # [BQ, CT]
                win = window_ref[0]
                if chunked:
                    # Llama-4 chunked local attention: keys visible iff
                    # floor(kpos/C) == floor(qpos/C) (with causality)
                    valid &= (win < 0) | (key_pos >= (row_pos // win) * win)
                else:
                    valid &= (win < 0) | (key_pos > row_pos - win)
            # GQA: broadcast the per-token mask over the G heads per kv head
            valid_g = jnp.repeat(valid, G, axis=0)           # [BQ*G, CT]

            new_ms, new_ls, new_accs = [], [], []
            for h in range(Nk):
                if split:
                    k_h = kr_all[:, h * D:(h + 1) * D]           # [CT, D]
                    v_h = vr_all[:, h * D:(h + 1) * D]
                else:
                    k_h = flat2[:, (2 * h) * D:(2 * h + 1) * D]
                    v_h = flat2[:, (2 * h + 1) * D:(2 * h + 2) * D]
                if k_h.dtype != q.dtype:   # fp8 KV: upcast for the MXU
                    k_h = k_h.astype(q.dtype)
                    v_h = v_h.astype(q.dtype)
                q_h = q[:, h * G:(h + 1) * G, :].reshape(BQ * G, D)
                scores = jax.lax.dot_general(
                    q_h, k_h, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                                     # [BQ*G, CT]
                if logit_softcap:
                    scores = logit_softcap * jnp.tanh(scores / logit_softcap)
                scores = jnp.where(valid_g, scores, -jnp.inf)
                m_c = jnp.max(scores, axis=-1, keepdims=True)
                m_n = jnp.maximum(ms[h], m_c)
                alpha = jnp.exp(ms[h] - m_n)
                p = jnp.exp(scores - m_n)
                l_n = alpha * ls[h] + jnp.sum(p, axis=-1, keepdims=True)
                pv = jax.lax.dot_general(
                    p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                new_ms.append(m_n)
                new_ls.append(l_n)
                new_accs.append(alpha * accs[h] + pv)
            return tuple(new_ms), tuple(new_ls), tuple(new_accs)

        m0 = tuple(jnp.full((BQ * G, 1), -jnp.inf, jnp.float32)
                   for _ in range(Nk))
        l0 = tuple(jnp.zeros((BQ * G, 1), jnp.float32) for _ in range(Nk))
        a0 = tuple(jnp.zeros((BQ * G, D), jnp.float32) for _ in range(Nk))
        ms, ls, accs = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))

        out = jnp.concatenate(
            [(accs[h] / jnp.maximum(ls[h], 1e-30)).reshape(BQ, G, D)
             for h in range(Nk)], axis=1)                   # [BQ, Nq, D]
        o_buf[:] = out.astype(o_buf.dtype)
        out_dma = pltpu.make_async_copy(
            o_buf, o_hbm.at[pl.ds(row0, bq)], o_sem)
        out_dma.start()
        out_dma.wait()


def _mla_extend_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B]
    page_indices_ref,  # i32[B, MP]
    cu_q_lens_ref,     # i32[B+1]
    # inputs (ANY: manual DMA)
    q_hbm,             # [Tpad, Nq, Dk]
    kv_hbm,            # [NP, ps, Dk]  (entry axis squeezed)
    # output (ANY: manual DMA)
    o_hbm,             # [Tpad, Nq, v_dim]
    # scratch
    q_buf,             # VMEM [BQ, Nq, Dk]
    kv_buf,            # VMEM [2, CP, ps, Dk]
    o_buf,             # VMEM [BQ, Nq, v_dim]
    q_sem, o_sem, kv_sems,
    *,
    bq: int,
    chunk_pages: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    v_dim: int,
):
    """Ragged MLA extend: all heads share ONE latent K/V entry per token,
    so each chunk is a single [BQ*Nq, CT] matmul (MQA) with causal masking
    broadcast over heads — the prefill companion of mla_paged_decode."""
    s = pl.program_id(0)
    qt = pl.program_id(1)
    CP = chunk_pages
    CT = CP * page_size

    q_start = cu_q_lens_ref[s]
    q_len = cu_q_lens_ref[s + 1] - q_start
    kv_len = kv_lens_ref[s]

    @pl.when((qt * bq < q_len) & (q_len > 0))
    def _run():
        row0 = q_start + qt * bq
        pos0 = kv_len - q_len + qt * bq
        pos_last = jnp.minimum(pos0 + bq - 1, kv_len - 1)
        n_chunks = pl.cdiv(jnp.minimum(pos_last + 1, kv_len), CT)

        in_q = pltpu.make_async_copy(
            q_hbm.at[pl.ds(row0, bq)], q_buf, q_sem)
        in_q.start()

        def start_chunk(ci, slot):
            for j in range(CP):
                pidx = jnp.minimum(ci * CP + j, max_pages - 1)
                page = page_indices_ref[s, pidx]
                pltpu.make_async_copy(
                    kv_hbm.at[page], kv_buf.at[slot, j], kv_sems.at[slot, j],
                ).start()

        def wait_chunk(slot):
            for j in range(CP):
                pltpu.make_async_copy(
                    kv_hbm.at[0], kv_buf.at[slot, j], kv_sems.at[slot, j],
                ).wait()

        start_chunk(0, 0)
        in_q.wait()
        BQ, Nq, Dk = q_buf.shape
        q = q_buf[:].reshape(BQ * Nq, Dk)     # heads flattened into rows

        # per-ROW token position (repeat each token's position over heads)
        row_pos = pos0 + jax.lax.broadcasted_iota(
            jnp.int32, (BQ * Nq, 1), 0) // Nq

        def body(ci, carry):
            m, l, acc = carry                  # [BQ*Nq,1] x2, [BQ*Nq,v_dim]
            slot = jax.lax.rem(ci, 2)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk(ci + 1, jax.lax.rem(ci + 1, 2))

            wait_chunk(slot)
            kv = kv_buf[slot].reshape(CT, Dk)
            if kv.dtype != q.dtype:            # fp8 KV: upcast for the MXU
                kv = kv.astype(q.dtype)
            key_pos = ci * CT + jax.lax.broadcasted_iota(
                jnp.int32, (1, CT), 1)
            valid = (key_pos <= row_pos) & (key_pos < kv_len)

            scores = jax.lax.dot_general(
                q, kv, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * sm_scale                       # [BQ*Nq, CT]
            scores = jnp.where(valid, scores, -jnp.inf)
            m_c = jnp.max(scores, axis=-1, keepdims=True)
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(scores - m_n)
            l_n = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            v = kv[:, :v_dim]
            pv = jax.lax.dot_general(
                p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_n, l_n, alpha * acc + pv

        m0 = jnp.full((BQ * Nq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((BQ * Nq, 1), jnp.float32)
        a0 = jnp.zeros((BQ * Nq, v_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, (m0, l0, a0))
        o_buf[:] = (acc / jnp.maximum(l, 1e-30)).reshape(
            BQ, Nq, v_dim).astype(o_buf.dtype)
        out_dma = pltpu.make_async_copy(
            o_buf, o_hbm.at[pl.ds(row0, bq)], o_sem)
        out_dma.start()
        out_dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "v_dim", "bq", "chunk_pages", "interpret"),
)
def mla_ragged_extend_attention(
    q: jnp.ndarray,             # [T, Nq, Dk]
    kv_pages: jnp.ndarray,      # [NP, ps, 1, Dk]
    kv_lens: jnp.ndarray,       # i32[B]
    page_indices: jnp.ndarray,  # i32[B, MP]
    cu_q_lens: jnp.ndarray,     # i32[B+1]
    num_seqs: jnp.ndarray,
    *,
    sm_scale: float,
    v_dim: int,
    bq: int = 0,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: bool = False,
) -> jnp.ndarray:
    T, Nq, Dk = q.shape
    NP, ps, _, _ = kv_pages.shape
    kv_flat = kv_pages.reshape(NP, ps, Dk)
    B, MP = page_indices.shape
    CP = min(chunk_pages, MP)
    # tile size bounded so q/score/acc buffers fit VMEM at 128-head MLA
    BQ = bq or max(8, min(128, 4096 // Nq))
    BQ = min(BQ, max(T, 8))
    q_pad = jnp.pad(q, ((0, BQ), (0, 0), (0, 0)))
    QT = cdiv(T, BQ)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B, QT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((BQ, Nq, Dk), q.dtype),
            pltpu.VMEM((2, CP, ps, Dk), kv_pages.dtype),
            pltpu.VMEM((BQ, Nq, v_dim), q.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2, CP)),
        ],
    )
    kernel = functools.partial(
        _mla_extend_kernel,
        bq=BQ, chunk_pages=CP, page_size=ps,
        max_pages=MP, sm_scale=sm_scale, v_dim=v_dim,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + BQ, Nq, v_dim), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, cu_q_lens, q_pad, kv_flat)
    return out[:T]


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "logit_softcap", "bq", "chunk_pages",
                     "window_chunked", "interpret"),
)
def ragged_extend_attention(
    q: jnp.ndarray,             # [T, Nq, D]
    kv_pages: jnp.ndarray,      # [NP, ps, 2Nk, D]
    kv_lens: jnp.ndarray,       # i32[B]
    page_indices: jnp.ndarray,  # i32[B, MP]
    cu_q_lens: jnp.ndarray,     # i32[B+1]
    num_seqs: jnp.ndarray,      # i32[] (unused; padding seqs have q_len 0)
    sliding_window=None,        # None | int | traced i32 scalar (-1 = off)
    tree_bits=None,             # i32[B, 32] spec-tree masks | None
    *,
    sm_scale: float,
    logit_softcap: Optional[float] = None,
    window_chunked: bool = False,
    bq: int = DEFAULT_BQ,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    interpret: bool = False,
) -> jnp.ndarray:
    T, Nq, D = q.shape
    from iaas_sglang_tpu.ops.attention import is_split_layout

    split = is_split_layout(kv_pages)   # [2, NP, ps, NkD] stored flat
    if split:
        _, NP, ps, NkD = kv_pages.shape
        Nk = NkD // D
    else:
        NP, ps, NK2, _ = kv_pages.shape
        Nk = NK2 // 2
    B, MP = page_indices.shape
    CP = min(chunk_pages, MP)
    tree = tree_bits is not None
    if tree:
        # tree-verify segments are <= 32 rows; one q tile covers a segment
        BQ = 32
        tree_arg = tree_bits.astype(jnp.int32)
    else:
        BQ = min(bq, max(T, 16))
        tree_arg = jnp.zeros((1, 1), jnp.int32)
    window = jnp.full((1,), -1, jnp.int32) if sliding_window is None \
        else jnp.asarray(sliding_window, jnp.int32).reshape(1)
    # slack so a tile's full-BQ write never clips past the buffer
    q_pad = jnp.pad(q, ((0, BQ), (0, 0), (0, 0)))
    QT = cdiv(T, BQ)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B, QT),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((BQ, Nq, D), q.dtype),
            (pltpu.VMEM((2, 2, CP, ps, Nk * D), kv_pages.dtype) if split
             else pltpu.VMEM((2, CP, ps, 2 * Nk, D), kv_pages.dtype)),
            pltpu.VMEM((BQ, Nq, D), q.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
            (pltpu.SemaphoreType.DMA((2, 2, CP)) if split
             else pltpu.SemaphoreType.DMA((2, CP))),
        ],
    )
    kernel = functools.partial(
        _extend_kernel,
        num_kv_heads=Nk, bq=BQ, chunk_pages=CP, page_size=ps,
        max_pages=MP, sm_scale=sm_scale, logit_softcap=logit_softcap,
        tree=tree, chunked=window_chunked, split=split,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + BQ, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, cu_q_lens, window, tree_arg, q_pad, kv_pages)
    return out[:T]
