"""Pallas TPU kernel: batched paged-KV decode attention.

The serving hot loop (TPU re-design of the reference's decode attention
backends — flashinfer_backend.py / triton decode_attention.py). One query
token per sequence attends over that sequence's paged KV:

    q            [B, Nq, D]
    kv_pages     [NP, page_size, 2*Nk, D]   K at even, V at odd head index
    kv_lens      i32[B]
    page_indices i32[B, MP]

Design: grid over sequences; one GLOBAL double-buffered DMA pipeline runs
across grid steps (scratch persists on the sequential TPU grid): while
sequence s computes, the first chunk of sequence s+1 is already in flight,
so the only pipeline fill/drain is at the batch boundary instead of per
sequence. Page-granular DMA guards skip pages beyond ceil(kv_len/ps) and
chunks before the sliding-window start. Compute is head-packed: queries are
zero-padded into the flat [2*Nk*D] lane layout of the KV buffer so scores
for ALL kv heads are ONE [Nq, 2NkD]x[2NkD, CT] MXU dot and PV is ONE
[Nq, CT]x[CT, 2NkD] dot with accumulation kept in the flat lane space; the
per-head [G, D] views are extracted once at the end. Decode is
HBM-bandwidth bound — the kernel's job is to keep the DMA engine saturated
while the VPU/MXU hides under it. (The first-cut kernel — per-sequence
double buffering + per-head small dots — measured 220 GB/s on the 32-layer
bs=32 stack; this layout removes the per-sequence DMA drain and ~8x of the
per-chunk op dispatches.)
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
    kv_buf,            # [NBUF, CP, ps, 2Nk, D] VMEM (persists across grid)
    sems,              # DMA sems (NBUF, CP)
    pipe_ref,          # i32[2] SMEM: [global chunk counter, prefetched seq]
    *,
    num_kv_heads: int,
    num_seqs: int,
    num_bufs: int,
    chunk_pages: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    logit_softcap: Optional[float],
    win_chunked: bool = False,
    compute: str = "packed",   # "packed" | "perhead" | "split" | "split_t"
    interpret: bool = False,
):
    # NOTE on num_bufs: the pipeline issues exactly ONE chunk ahead of the
    # wait (slot (gc+1)%NBUF), so NBUF is the buffer-ROTATION depth, not a
    # prefetch depth — NBUF>2 only cycles idle VMEM and cannot deepen the
    # pipeline (the r2 "NBUF=4 regresses" A/B measured exactly that
    # rotation cost). Fixed double-buffering (2) is the operating point;
    # the knob stays for interpret-mode correctness coverage.
    s = pl.program_id(0)
    B = num_seqs
    NBUF = num_bufs
    CP = chunk_pages
    CT = CP * page_size  # tokens per chunk
    Nk = num_kv_heads

    def first_chunk(kvl):
        """Index of the first chunk holding any in-window position."""
        win = window_ref[0]
        if win_chunked:
            # Llama-4 chunked local attention: the query at kv_len-1 only
            # sees keys from its own attention chunk
            start = ((kvl - 1) // jnp.maximum(win, 1)) * jnp.maximum(win, 1)
        else:
            start = kvl - win
        start = jnp.where(win < 0, 0, jnp.maximum(start, 0))
        return start // CT

    def start_chunk(s2, ci, slot):
        """DMA chunk ci of sequence s2; pages past ceil(kv_len/ps) skipped."""
        npg = pl.cdiv(kv_lens_ref[s2], page_size)
        for j in range(CP):
            idx = ci * CP + j

            @pl.when(idx < npg)
            def _():
                page = page_indices_ref[s2, jnp.minimum(idx, max_pages - 1)]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page],
                    kv_buf.at[slot, j],
                    sems.at[slot, j],
                ).start()

    def wait_chunk(s2, ci, slot):
        npg = pl.cdiv(kv_lens_ref[s2], page_size)
        for j in range(CP):

            @pl.when(ci * CP + j < npg)
            def _():
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0],  # shape-only; sem carries identity
                    kv_buf.at[slot, j],
                    sems.at[slot, j],
                ).wait()

    @pl.when(s == 0)
    def _boot():
        pipe_ref[0] = 0   # global chunk counter: slot = gc % NBUF
        pipe_ref[1] = -1  # highest seq whose first chunk has been prefetched
        # zero the staging buffer once: pages skipped by the npg guard are
        # then benign zeros (never uninitialized bits) — their positions are
        # masked to -inf, and 0-valued V rows contribute exactly 0 to the
        # flat PV dot (NaN garbage would poison it: 0 * NaN = NaN)
        for n in range(NBUF):
            for j in range(CP):
                kv_buf[n, j] = jnp.zeros_like(kv_buf[n, j])

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, CT)

    @pl.when(n_chunks > 0)
    def _run():
        # predecessor could not prefetch us (s == 0, or s-1 was a pad row
        # that itself needed fixing up): start our first chunk now
        @pl.when(pipe_ref[1] < s)
        def _():
            start_chunk(s, first_chunk(kv_len), jax.lax.rem(pipe_ref[0], NBUF))
            pipe_ref[1] = s

        q = q_ref[0]                          # [Nq, D] bf16 (MXU-native)
        Nq, D = q.shape
        G = Nq // Nk
        W = 2 * Nk * D

        if compute == "packed":
            # zero-pad q into the flat KV lane layout: row i (query head
            # i) gets q[i] at the K-lane block of its kv head, so ONE dot
            # against the flat [CT, W] buffer yields scores for every
            # head at once
            row = jax.lax.broadcasted_iota(jnp.int32, (Nq, 1), 0)
            pieces = []
            for h in range(Nk):
                mask = (row >= h * G) & (row < (h + 1) * G)
                pieces.append(jnp.where(mask, q, 0))     # K block of head h
                pieces.append(jnp.zeros_like(q))         # V block of head h
            q_pad = jnp.concatenate(pieces, axis=1)      # [Nq, W]
        elif compute == "split":
            # K-only lane layout [Nq, Nk*D]: half the packed dot width —
            # the K/V halves are deinterleaved in-register per chunk via
            # the u32 bitcast trick (see _deinterleave), so the score dot
            # contracts NkD instead of 2NkD and PV produces NkD lanes
            row = jax.lax.broadcasted_iota(jnp.int32, (Nq, 1), 0)
            q_pad = jnp.concatenate(
                [jnp.where((row >= h * G) & (row < (h + 1) * G), q, 0)
                 for h in range(Nk)], axis=1)            # [Nq, NkD]
        elif compute == "split_t":
            # transposed formulation: scores_t [CT, Nq] puts the long dim
            # (tokens) on MXU rows — M=CT instead of M=Nq=32, so short-
            # context chunks stop wasting 3/4 of the systolic rows
            col = jax.lax.broadcasted_iota(jnp.int32, (1, Nq), 1)
            qT = q.astype(jnp.float32).T.astype(q.dtype)  # [D, Nq]
            q_padT = jnp.concatenate(
                [jnp.where((col >= h * G) & (col < (h + 1) * G), qT, 0)
                 for h in range(Nk)], axis=0)            # [NkD, Nq]

        def _deinterleave(slot):
            """K/V halves of the interleaved chunk buffer as two
            [CT, Nk*D] arrays. TPU path: bitcast the [CT*2Nk, D] bf16
            row view to u32 (adjacent K/V rows share a 32-bit word —
            K in the low half), shift/mask to split, then fold the head
            rows into lanes. Same trick as jax's ragged_paged_attention
            strided_load_kv (kernel.py:361-393)."""
            if interpret:
                f3 = kv_buf[slot].reshape(CT, 2 * Nk, D)
                kf = f3[:, 0::2, :].reshape(CT, Nk * D)
                vf = f3[:, 1::2, :].reshape(CT, Nk * D)
                return kf, vf
            kvr = kv_buf.at[slot].reshape(CT * 2 * Nk, D)
            b = kvr.bitcast(jnp.uint32)[...]             # [CT*Nk, D]
            kf = pltpu.bitcast(b << 16, jnp.float32).astype(jnp.bfloat16)
            vf = pltpu.bitcast(b & jnp.uint32(0xFFFF0000),
                               jnp.float32).astype(jnp.bfloat16)
            return kf.reshape(CT, Nk * D), vf.reshape(CT, Nk * D)

        c0 = first_chunk(kv_len)

        def body(ci, carry):
            m, l, acc = carry       # [Nq,1], [Nq,1] f32; acc f32
            gc = pipe_ref[0]
            slot = jax.lax.rem(gc, NBUF)
            wait_chunk(s, ci, slot)

            # keep the DMA engine busy: queue the next work item — our next
            # chunk, or the first chunk of the next live sequence
            nslot = jax.lax.rem(gc + 1, NBUF)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk(s, ci + 1, nslot)

            @pl.when((ci + 1 >= n_chunks) & (s + 1 < B))
            def _():
                nxt = jnp.minimum(s + 1, B - 1)

                @pl.when(kv_lens_ref[nxt] > 0)
                def _():
                    start_chunk(nxt, first_chunk(kv_lens_ref[nxt]), nslot)
                    pipe_ref[1] = nxt

            pipe_ref[0] = gc + 1

            if compute in ("split", "split_t"):
                kr, vr = _deinterleave(slot)             # [CT, NkD] x2
                if kr.dtype != q.dtype:
                    kr = kr.astype(q.dtype)
                    vr = vr.astype(q.dtype)
                win = window_ref[0]
                if compute == "split":
                    pos = ci * CT + jax.lax.broadcasted_iota(
                        jnp.int32, (1, CT), 1)
                else:
                    pos = ci * CT + jax.lax.broadcasted_iota(
                        jnp.int32, (CT, 1), 0)
                valid = pos < kv_len
                if win_chunked:
                    valid &= (win < 0) | (
                        pos >= ((kv_len - 1) // win) * win)
                else:
                    valid &= (win < 0) | (pos > kv_len - 1 - win)
                if compute == "split":
                    scores = jax.lax.dot_general(
                        q_pad, kr, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * sm_scale                         # f32 [Nq, CT]
                    if logit_softcap:
                        scores = logit_softcap * jnp.tanh(
                            scores / logit_softcap)
                    scores = jnp.where(valid, scores, -jnp.inf)
                    m_c = jnp.max(scores, axis=-1, keepdims=True)
                    m_n = jnp.maximum(m, m_c)
                    alpha = jnp.exp(m - m_n)
                    p = jnp.exp(scores - m_n)
                    l_n = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
                    pv = jax.lax.dot_general(
                        p.astype(vr.dtype), vr, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # f32 [Nq, NkD]
                else:
                    scores = jax.lax.dot_general(
                        kr, q_padT, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ) * sm_scale                         # f32 [CT, Nq]
                    if logit_softcap:
                        scores = logit_softcap * jnp.tanh(
                            scores / logit_softcap)
                    scores = jnp.where(valid, scores, -jnp.inf)
                    m_c = jnp.max(scores, axis=0, keepdims=True)
                    m_n = jnp.maximum(m, m_c)            # [1, Nq]
                    alpha = jnp.exp(m - m_n)
                    p = jnp.exp(scores - m_n)            # [CT, Nq]
                    l_n = alpha * l + jnp.sum(p, axis=0, keepdims=True)
                    pv = jax.lax.dot_general(
                        vr, p.astype(vr.dtype), (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )                                    # f32 [NkD, Nq]
                return m_n, l_n, alpha * acc + pv

            flat2 = kv_buf[slot].reshape(CT, W)
            if flat2.dtype != q.dtype:   # fp8 KV: upcast for the MXU
                flat2 = flat2.astype(q.dtype)

            pos = ci * CT + jax.lax.broadcasted_iota(jnp.int32, (1, CT), 1)
            valid = pos < kv_len
            win = window_ref[0]
            if win_chunked:
                valid &= (win < 0) | (pos >= ((kv_len - 1) // win) * win)
            else:
                valid &= (win < 0) | (pos > kv_len - 1 - win)

            if compute == "perhead":
                # per-kv-head dots on static lane slices of the SAME
                # interleaved buffer: no q zero-padding, contraction D
                # instead of W — removes the Nk-fold MXU redundancy of the
                # packed dot at short contexts (where the kernel is
                # MXU-bound, not DMA-bound)
                scores_l = []
                for h in range(Nk):
                    k_h = flat2[:, (2 * h) * D:(2 * h + 1) * D]  # [CT, D]
                    q_h = q[h * G:(h + 1) * G, :]                # [G, D]
                    scores_l.append(jax.lax.dot_general(
                        q_h, k_h, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
                scores = jnp.concatenate(scores_l, 0) * sm_scale  # [Nq, CT]
            else:
                scores = jax.lax.dot_general(
                    q_pad, flat2,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                ) * sm_scale                                # f32 [Nq, CT]
            if logit_softcap:
                scores = logit_softcap * jnp.tanh(scores / logit_softcap)
            scores = jnp.where(valid, scores, -jnp.inf)

            m_c = jnp.max(scores, axis=-1, keepdims=True)
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(scores - m_n)                   # f32 [Nq, CT]
            l_n = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            if compute == "perhead":
                pv_l = []
                for h in range(Nk):
                    v_h = flat2[:, (2 * h + 1) * D:(2 * h + 2) * D]
                    p_h = p[h * G:(h + 1) * G, :]
                    pv_l.append(jax.lax.dot_general(
                        p_h.astype(v_h.dtype), v_h,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32))
                pv = jnp.concatenate(pv_l, 0)           # f32 [Nq, D]
            else:
                # PV in the flat lane space: row i of p @ flat2 holds its
                # head's V product at the V-lane block (K-block lanes carry
                # p@K garbage that the final extraction never reads)
                pv = jax.lax.dot_general(
                    p.astype(flat2.dtype), flat2,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                       # f32 [Nq, W]
            return m_n, l_n, alpha * acc + pv

        if compute == "split_t":
            m0 = jnp.full((1, Nq), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((1, Nq), jnp.float32)
            acc0 = jnp.zeros((Nk * D, Nq), jnp.float32)
        else:
            m0 = jnp.full((Nq, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((Nq, 1), jnp.float32)
            acc_w = {"perhead": D, "split": Nk * D}.get(compute, W)
            acc0 = jnp.zeros((Nq, acc_w), jnp.float32)
        m, l, acc = jax.lax.fori_loop(c0, n_chunks, body, (m0, l0, acc0))
        acc = acc / jnp.maximum(l, 1e-30)
        if compute == "perhead":
            out = acc                                   # already [Nq, D]
        elif compute == "split":
            out = jnp.concatenate(
                [acc[h * G:(h + 1) * G, h * D:(h + 1) * D]
                 for h in range(Nk)], axis=0)
        elif compute == "split_t":
            accT = acc.T                                # [Nq, NkD] once/seq
            out = jnp.concatenate(
                [accT[h * G:(h + 1) * G, h * D:(h + 1) * D]
                 for h in range(Nk)], axis=0)
        else:
            out = jnp.concatenate(
                [acc[h * G:(h + 1) * G, (2 * h + 1) * D:(2 * h + 2) * D]
                 for h in range(Nk)],
                axis=0,
            )
        o_ref[0] = out.astype(o_ref.dtype)

    @pl.when(n_chunks == 0)
    def _pad():
        o_ref[0] = jnp.zeros_like(o_ref[0])

        # pad row: if nothing is in flight for our successor, bootstrap it so
        # runs of pad rows don't stall the pipeline
        @pl.when(s + 1 < B)
        def _():
            nxt = jnp.minimum(s + 1, B - 1)

            @pl.when((pipe_ref[1] < nxt) & (kv_lens_ref[nxt] > 0))
            def _():
                start_chunk(nxt, first_chunk(kv_lens_ref[nxt]),
                            jax.lax.rem(pipe_ref[0], NBUF))
                pipe_ref[1] = nxt


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
    kv_buf,            # [NBUF, CP, ps, Dk] VMEM (persists across grid)
    sems,
    pipe_ref,          # i32[2] SMEM: [global chunk counter, prefetched seq]
    *,
    num_seqs: int,
    num_bufs: int,
    chunk_pages: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    v_dim: int,
):
    """MLA decode: MQA over one shared latent KV entry per token
    (absorbed-query formulation; V = entry[:, :v_dim]). All heads hit the
    same K chunk, so each chunk is ONE [Nq, CT] matmul + ONE [Nq, v_dim]
    matmul — the MXU shape the 128-head DeepSeek geometry wants. Same
    global cross-sequence DMA pipeline as _decode_kernel."""
    s = pl.program_id(0)
    B = num_seqs
    NBUF = num_bufs
    CP = chunk_pages
    CT = CP * page_size

    def start_chunk(s2, ci, slot):
        npg = pl.cdiv(kv_lens_ref[s2], page_size)
        for j in range(CP):
            idx = ci * CP + j

            @pl.when(idx < npg)
            def _():
                page = page_indices_ref[s2, jnp.minimum(idx, max_pages - 1)]
                pltpu.make_async_copy(
                    kv_hbm_ref.at[page], kv_buf.at[slot, j], sems.at[slot, j]
                ).start()

    def wait_chunk(s2, ci, slot):
        npg = pl.cdiv(kv_lens_ref[s2], page_size)
        for j in range(CP):

            @pl.when(ci * CP + j < npg)
            def _():
                pltpu.make_async_copy(
                    kv_hbm_ref.at[0], kv_buf.at[slot, j], sems.at[slot, j]
                ).wait()

    @pl.when(s == 0)
    def _boot():
        pipe_ref[0] = 0
        pipe_ref[1] = -1
        for n in range(NBUF):
            for j in range(CP):
                kv_buf[n, j] = jnp.zeros_like(kv_buf[n, j])

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, CT)

    @pl.when(n_chunks > 0)
    def _run():
        @pl.when(pipe_ref[1] < s)
        def _():
            start_chunk(s, 0, jax.lax.rem(pipe_ref[0], NBUF))
            pipe_ref[1] = s

        q = q_ref[0]                              # [Nq, Dk]
        Nq, Dk = q.shape

        def body(ci, carry):
            m, l, acc = carry                     # [Nq,1], [Nq,1], [Nq,v_dim]
            gc = pipe_ref[0]
            slot = jax.lax.rem(gc, NBUF)
            wait_chunk(s, ci, slot)

            nslot = jax.lax.rem(gc + 1, NBUF)

            @pl.when(ci + 1 < n_chunks)
            def _():
                start_chunk(s, ci + 1, nslot)

            @pl.when((ci + 1 >= n_chunks) & (s + 1 < B))
            def _():
                nxt = jnp.minimum(s + 1, B - 1)

                @pl.when(kv_lens_ref[nxt] > 0)
                def _():
                    start_chunk(nxt, 0, nslot)
                    pipe_ref[1] = nxt

            pipe_ref[0] = gc + 1
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

        @pl.when(s + 1 < B)
        def _():
            nxt = jnp.minimum(s + 1, B - 1)

            @pl.when((pipe_ref[1] < nxt) & (kv_lens_ref[nxt] > 0))
            def _():
                start_chunk(nxt, 0, jax.lax.rem(pipe_ref[0], NBUF))
                pipe_ref[1] = nxt


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "v_dim", "chunk_pages", "num_bufs",
                     "interpret"),
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
    num_bufs: int = 2,
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
            pltpu.VMEM((num_bufs, CP, ps, Dk), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((num_bufs, CP)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _mla_decode_kernel,
        num_seqs=B,
        num_bufs=num_bufs,
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
                     "window_chunked", "num_bufs", "compute", "interpret"),
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
    num_bufs: int = 2,
    compute: str = "packed",
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, D = q.shape
    NP, ps, NK2, _ = kv_pages.shape
    Nk = NK2 // 2
    MP = page_indices.shape[1]
    CP = min(chunk_pages, MP)
    if compute in ("split", "split_t") and kv_pages.dtype != jnp.bfloat16 \
            and not interpret:
        # the u32 deinterleave trick is bf16-specific; fp8 KV keeps the
        # packed path (upcast dominates there anyway — PARITY.md)
        compute = "packed"
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
            pltpu.VMEM((num_bufs, CP, ps, NK2, D), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((num_bufs, CP)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel,
        num_kv_heads=Nk,
        num_seqs=B,
        num_bufs=num_bufs,
        chunk_pages=CP,
        page_size=ps,
        max_pages=MP,
        sm_scale=sm_scale,
        logit_softcap=logit_softcap,
        win_chunked=window_chunked,
        compute=compute,
        interpret=interpret,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, window, q, kv_pages)
