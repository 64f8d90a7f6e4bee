"""Pallas TPU kernels for the K/V-SPLIT page layout.

Layout: the pool is PHYSICALLY [2, NP, ps, Nk*D] — plane 0 holds K of
all heads lane-flat per token, plane 1 holds V. The flat lane dim is the
STORED shape, not a view: an XLA reshape from [.., Nk, D] re-tiles and
silently copies the entire pool per layer call (xprof r4: 4.9 ms/call of
a 1.6 GB pool — 2.3x the kernel itself). Plane-outermost also keeps
every kernel ref index LEADING-dim only (Mosaic rejects DMA sources
indexed through a middle dim). Detection: ndim == 4 and shape[0] == 2
(an interleaved pool's dim 0 is the page count, always > 2).

Why (r4, VERDICT #1): with the interleaved [ps, 2Nk, D] layout the
decode kernel's one-wide-dot formulation contracts 2*Nk*D lanes of which
only D are live per head — in-register deinterleaving (u32 bitcast
shifts, probed r4) costs as much as it saves (394 -> 409 GB/s at
ctx 192). The split layout gives the kernels native [CT, Nk*D] K and V
chunks: the decode score dot contracts NkD (half the packed width, no
V-lane waste) and the extend kernel takes per-head [CT, D] K/V as free
static lane slices.

The price is jax_rpa (which hard-codes interleaved K at even combined
head indices, ragged_paged_attention/kernel.py:118): the extend kernel
here replaces it — same flat-q-block / per-sequence streaming structure,
with our global cross-block DMA pipeline, plus the features jax_rpa
lacks (traced per-layer sliding windows, chunked local attention, logit
softcap, speculative tree masks).

Reference bars: sgl-kernel FA3/FlashInfer extend+decode backends
(srt/layers/attention/flashattention_backend.py:65-337).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_CHUNK_PAGES = 16
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


# ------------------------------------------------------------------ decode


def _decode_split_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B]            (SMEM)
    page_indices_ref,  # i32[B, MP]        (SMEM)
    window_ref,        # i32[1] sliding window, -1 = full attention (SMEM)
    # inputs
    q_ref,             # [1, Nq, D]        (VMEM block)
    kv_hbm_ref,        # [2, NP, ps, NkD]  (ANY/HBM)
    # outputs
    o_ref,             # [1, Nq, D]        (VMEM block)
    # scratch
    kv_buf,            # [NBUF, 2, CP, ps, NkD] VMEM (persists across grid)
    sems,              # DMA sems (NBUF, 2, CP)
    pipe_ref,          # i32[4] SMEM: [consumed, issued, seq_ptr, chunk_ptr]
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
    head_group: int = 4,
):
    """Same global cross-sequence DMA pipeline as the interleaved decode
    kernel (ops/decode_attention.py), with plane-separated page copies:
    each page issues one K-plane and one V-plane DMA, so compute reads
    native [CT, NkD] K/V with no lane games. The score dot contracts NkD
    (vs 2NkD packed) and PV produces NkD — half the MXU work at short
    contexts where the kernel is MXU-bound (367 of 819 GB/s at ctx 192,
    PARITY.md r3)."""
    s = pl.program_id(0)
    B = num_seqs
    NBUF = num_bufs
    CP = chunk_pages
    CT = CP * page_size
    Nk = num_kv_heads

    def first_chunk(kvl):
        win = window_ref[0]
        if win_chunked:
            start = ((kvl - 1) // jnp.maximum(win, 1)) * jnp.maximum(win, 1)
        else:
            start = kvl - win
        start = jnp.where(win < 0, 0, jnp.maximum(start, 0))
        return start // CT

    def start_chunk(s2, ci, slot):
        npg = pl.cdiv(kv_lens_ref[s2], page_size)
        for j in range(CP):
            idx = ci * CP + j

            @pl.when(idx < npg)
            def _():
                page = page_indices_ref[s2, jnp.minimum(idx, max_pages - 1)]
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[e, page],
                        kv_buf.at[slot, e, j],
                        sems.at[slot, e, j],
                    ).start()

    def wait_chunk(s2, ci, slot):
        npg = pl.cdiv(kv_lens_ref[s2], page_size)
        for j in range(CP):

            @pl.when(ci * CP + j < npg)
            def _():
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm_ref.at[e, 0],
                        kv_buf.at[slot, e, j],
                        sems.at[slot, e, j],
                    ).wait()

    # ---- depth-(NBUF-1) prefetch (VERDICT r3 #8): a central ISSUE
    # pointer (pipe[2] = seq, pipe[3] = chunk) walks the global
    # consumption order; after every consumed chunk the pipeline tops
    # back up to NBUF-1 chunks in flight. pipe[0] = consumed count,
    # pipe[1] = issued count (slot = count % NBUF on both sides).
    def fchunk_of(s2):
        return first_chunk(kv_lens_ref[jnp.minimum(s2, B - 1)])

    def norm_ptr(st):
        """Skip to the next (seq, chunk) with real work (pad rows and
        fully-consumed seqs advance; terminates at seq == B)."""
        def cond(t):
            s3, c3 = t
            s3c = jnp.minimum(s3, B - 1)
            return (s3 < B) & (c3 >= pl.cdiv(kv_lens_ref[s3c], CT))

        def bdy(t):
            s3, _ = t
            return s3 + 1, fchunk_of(s3 + 1)

        return jax.lax.while_loop(cond, bdy, st)

    def issue_one():
        @pl.when(pipe_ref[2] < B)
        def _():
            s2, c2 = pipe_ref[2], pipe_ref[3]
            start_chunk(s2, c2, jax.lax.rem(pipe_ref[1], NBUF))
            pipe_ref[1] = pipe_ref[1] + 1
            s3, c3 = norm_ptr((s2, c2 + 1))
            pipe_ref[2] = s3
            pipe_ref[3] = c3

    def top_up():
        for _d in range(NBUF - 1):
            @pl.when(pipe_ref[1] - pipe_ref[0] < NBUF - 1)
            def _():
                issue_one()

    @pl.when(s == 0)
    def _boot():
        pipe_ref[0] = 0
        pipe_ref[1] = 0
        s3, c3 = norm_ptr((jnp.int32(0), fchunk_of(jnp.int32(0))))
        pipe_ref[2] = s3
        pipe_ref[3] = c3
        for n in range(NBUF):
            for e in range(2):
                for j in range(CP):
                    kv_buf[n, e, j] = jnp.zeros_like(kv_buf[n, e, j])
        top_up()

    kv_len = kv_lens_ref[s]
    n_chunks = pl.cdiv(kv_len, CT)

    @pl.when(n_chunks > 0)
    def _run():
        q = q_ref[0]                          # [Nq, D]
        Nq, D = q.shape
        G = Nq // Nk
        HG = min(head_group, Nk)              # kv heads per packed dot
        ng = Nk // HG

        # K-plane lane layout per head GROUP: within group g, query row i
        # (head g*HG + i//G) sits at the lane block of its kv head, so one
        # [HG*G, HG*D] x [HG*D, CT] dot scores the whole group. HG trades
        # packed-dot redundancy (MAC ∝ HG) against dot count (ng): HG=Nk
        # is the r2 single-wide-dot; smaller HG deletes redundancy until
        # the dots go MXU-latency-bound.
        row = jax.lax.broadcasted_iota(jnp.int32, (HG * G, 1), 0)
        q_pads = []
        for g in range(ng):
            qg = q[g * HG * G:(g + 1) * HG * G]          # [HG*G, D]
            q_pads.append(jnp.concatenate(
                [jnp.where((row >= h * G) & (row < (h + 1) * G), qg, 0)
                 for h in range(HG)], axis=1))           # [HG*G, HG*D]

        c0 = first_chunk(kv_len)

        def body(ci, carry):
            m, l, acc = carry
            slot = jax.lax.rem(pipe_ref[0], NBUF)
            wait_chunk(s, ci, slot)
            pipe_ref[0] = pipe_ref[0] + 1
            top_up()

            LD = kv_buf.shape[-1]
            kr = kv_buf[slot, 0].reshape(CT, LD)
            vr = kv_buf[slot, 1].reshape(CT, LD)
            if kr.dtype == jnp.int8:
                # int8 KV: per-token power-of-two scales live INLINE in
                # the page row (lane block [NkD, NkD+128), exponent
                # replicated) — dequant rides the existing upcast as one
                # [CT, 1]-broadcast multiply; no score-side folding, no
                # relayout (r4 Narrow-KV A/B: bf16-parity latency)
                ks = jnp.exp2(
                    kr[:, Nk * D:Nk * D + 1].astype(jnp.float32))
                vs = jnp.exp2(
                    vr[:, Nk * D:Nk * D + 1].astype(jnp.float32))
                kr = (kr[:, :Nk * D].astype(jnp.float32)
                      * ks).astype(q.dtype)
                vr = (vr[:, :Nk * D].astype(jnp.float32)
                      * vs).astype(q.dtype)
            elif kr.dtype != q.dtype:
                kr = kr[:, :Nk * D].astype(q.dtype)
                vr = vr[:, :Nk * D].astype(q.dtype)

            pos = ci * CT + jax.lax.broadcasted_iota(jnp.int32, (1, CT), 1)
            valid = pos < kv_len
            win = window_ref[0]
            if win_chunked:
                valid &= (win < 0) | (pos >= ((kv_len - 1) // win) * win)
            else:
                valid &= (win < 0) | (pos > kv_len - 1 - win)

            scores = jnp.concatenate([
                jax.lax.dot_general(
                    q_pads[g], kr[:, g * HG * D:(g + 1) * HG * D],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
                for g in range(ng)], axis=0) * sm_scale   # f32 [Nq, CT]
            if logit_softcap:
                scores = logit_softcap * jnp.tanh(scores / logit_softcap)
            scores = jnp.where(valid, scores, -jnp.inf)

            m_c = jnp.max(scores, axis=-1, keepdims=True)
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(scores - m_n)
            l_n = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
            # accumulator is [HG*G, Nk*D] with group-major column blocks:
            # block g holds group g's query rows, so each block scales by
            # ITS rows' alpha slice
            blocks = []
            for g in range(ng):
                pv_g = jax.lax.dot_general(
                    p[g * HG * G:(g + 1) * HG * G].astype(vr.dtype),
                    vr[:, g * HG * D:(g + 1) * HG * D],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # [HG*G, HG*D]
                a_g = alpha[g * HG * G:(g + 1) * HG * G]
                blocks.append(
                    a_g * acc[:, g * HG * D:(g + 1) * HG * D] + pv_g)
            return m_n, l_n, jnp.concatenate(blocks, axis=1)

        m0 = jnp.full((Nq, 1), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((Nq, 1), jnp.float32)
        acc0 = jnp.zeros((HG * G, Nk * D), jnp.float32)
        m, l, acc = jax.lax.fori_loop(c0, n_chunks, body, (m0, l0, acc0))
        if D % 128 == 0:
            # whole-vreg lane offsets: the concat epilogue lowers fine and
            # is ~0.17 ms faster than per-head stores at ctx 192 (575 vs
            # 512 GB/s, r4 A/B)
            outs = []
            for g in range(ng):
                acc_g = acc[:, g * HG * D:(g + 1) * HG * D]  # [HG*G, HG*D]
                l_g = l[g * HG * G:(g + 1) * HG * G]
                for h in range(HG):
                    outs.append(
                        acc_g[h * G:(h + 1) * G, h * D:(h + 1) * D]
                        / jnp.maximum(l_g[h * G:(h + 1) * G], 1e-30))
            o_ref[0] = jnp.concatenate(outs, axis=0).astype(o_ref.dtype)
        else:
            # D < 128: the per-head slices sit at distinct (sublane, lane)
            # vreg offsets and Mosaic cannot relayout them through a
            # concat ("result/input offset mismatch on non-concat
            # dimension" — hit at head_dim 32/64 geometries); store each
            # head's rows directly instead
            for g in range(ng):
                acc_g = acc[:, g * HG * D:(g + 1) * HG * D]  # [HG*G, HG*D]
                l_g = l[g * HG * G:(g + 1) * HG * G]
                for h in range(HG):
                    hq = (g * HG + h) * G
                    o_ref[0, hq:hq + G, :] = (
                        acc_g[h * G:(h + 1) * G, h * D:(h + 1) * D]
                        / jnp.maximum(l_g[h * G:(h + 1) * G], 1e-30)
                    ).astype(o_ref.dtype)

    @pl.when(n_chunks == 0)
    def _pad():
        # pad rows consume nothing; the central issue pointer already
        # skipped them
        o_ref[0] = jnp.zeros_like(o_ref[0])


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "logit_softcap", "chunk_pages",
                     "window_chunked", "num_bufs", "head_group",
                     "interpret"),
)
def paged_decode_attention_split(
    q: jnp.ndarray,             # [B, Nq, D]
    kv_pages: jnp.ndarray,      # [2, NP, ps, NkD] split layout
    kv_lens: jnp.ndarray,       # i32[B]
    page_indices: jnp.ndarray,  # i32[B, MP]
    sliding_window=None,
    *,
    sm_scale: float,
    logit_softcap: Optional[float] = None,
    window_chunked: bool = False,
    chunk_pages: int = DEFAULT_CHUNK_PAGES,
    # depth-3 prefetch (4 buffers): 557 -> 729 GB/s at ctx 1024 (DMA-
    # latency-bound regime); no effect at short ctx (MXU-bound)
    num_bufs: int = 4,
    head_group: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    B, Nq, D = q.shape
    _, NP, ps, LD = kv_pages.shape
    # int8 pools carry an inline 128-lane per-token scale block
    NkD = LD - 128 if kv_pages.dtype == jnp.int8 else LD
    Nk = NkD // D
    kv_flat = kv_pages                      # stored flat: NO reshape
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
            pltpu.VMEM((num_bufs, 2, CP, ps, LD), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((num_bufs, 2, CP)),
            pltpu.SMEM((4,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _decode_split_kernel,
        num_kv_heads=Nk,
        num_seqs=B,
        num_bufs=num_bufs,
        chunk_pages=CP,
        page_size=ps,
        max_pages=MP,
        sm_scale=sm_scale,
        logit_softcap=logit_softcap,
        win_chunked=window_chunked,
        head_group=head_group,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, window, q, kv_flat)


# ------------------------------------------------------------------ extend


def _extend_split_kernel(
    # scalar prefetch
    kv_lens_ref,       # i32[B]
    page_indices_ref,  # i32[B, MP]
    cu_q_lens_ref,     # i32[B+1]
    seq_buf_ref,       # i32[2] (seq, buf) carry across grid steps
    num_seqs_ref,      # i32[1]
    window_ref,        # i32[1]
    # inputs
    q_ref,             # [NQB, Nq, D] (VMEM block, auto-pipelined)
    kv_hbm,            # [2, NP, ps, NkD] (ANY)
    # outputs
    o_ref,             # [NQB, Nq, D]
    # scratch
    kv_buf,            # [2, 2, KVP, ps, NkD]
    sems,              # DMA (2, 2, KVP)
    m_scr,             # f32 [Nk, NQB*G, 128]
    l_scr,             # f32 [Nk, NQB*G, 128]
    acc_scr,           # f32 [NQB, Nq, D]
    *,
    num_kv_heads: int,
    kv_pages_per_blk: int,
    page_size: int,
    max_pages: int,
    sm_scale: float,
    logit_softcap: Optional[float],
    chunked: bool = False,
    debug_heads: int = 0,   # probe-only: limit flash to N heads (0 = all)
):
    """Flat-q-block ragged extend over split-layout pages.

    Structure follows jax's ragged_paged_attention (q blocks tile the
    flat token stream; a while loop walks the sequences overlapping each
    block; per sequence, a while loop walks its KV blocks with the next
    consumer's first block always in flight — the (seq, buf) carry keeps
    ONE global double-buffered DMA pipeline alive across grid steps).
    Improvements over the library kernel: causal KV-block SKIPPING (a q
    block only walks KV blocks its rows can see — jax_rpa walks every
    block below kv_len for every q block and masks), sliding-window
    block skipping from below, traced per-layer windows, chunked local
    attention, and logit softcap. The split layout makes per-head K/V
    free static lane slices (no u32 deinterleave games)."""
    NQB, Nq, D = q_ref.shape
    Nk = num_kv_heads
    G = Nq // Nk
    KVP = kv_pages_per_blk
    CT = KVP * page_size
    q_blk = pl.program_id(0)
    n_q_blks = pl.num_programs(0)
    num_seqs = num_seqs_ref[0]
    q_lo_t = q_blk * NQB
    q_hi_t = q_lo_t + NQB

    def q_len_of(s):
        return cu_q_lens_ref[s + 1] - cu_q_lens_ref[s]

    def kv_lo_blk(s, qlo):
        """First KV block any row >= qlo of seq s can see (window)."""
        base = kv_lens_ref[s] - q_len_of(s)
        minpos = base + (qlo - cu_q_lens_ref[s])
        win = window_ref[0]
        wsafe = jnp.maximum(win, 1)
        if chunked:
            lo = (minpos // wsafe) * wsafe
        else:
            lo = jnp.maximum(minpos - wsafe + 1, 0)
        lo = jnp.where(win < 0, 0, jnp.maximum(lo, 0))
        return lo // CT

    def kv_hi_blk(s, qhi):
        """One past the last KV block rows < qhi of seq s can see."""
        base = kv_lens_ref[s] - q_len_of(s)
        maxpos = base + (qhi - 1 - cu_q_lens_ref[s])
        return pl.cdiv(jnp.minimum(maxpos + 1, kv_lens_ref[s]), CT)

    def start_kv(s, blk, buf):
        npg = pl.cdiv(kv_lens_ref[s], page_size)
        for j in range(KVP):
            idx = blk * KVP + j

            @pl.when(idx < npg)
            def _():
                page = page_indices_ref[s, jnp.minimum(idx, max_pages - 1)]
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm.at[e, page],
                        kv_buf.at[buf, e, j],
                        sems.at[buf, e, j],
                    ).start()

    def wait_kv(s, blk, buf):
        npg = pl.cdiv(kv_lens_ref[s], page_size)
        for j in range(KVP):

            @pl.when(blk * KVP + j < npg)
            def _():
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm.at[e, 0],
                        kv_buf.at[buf, e, j],
                        sems.at[buf, e, j],
                    ).wait()

    init_seq = seq_buf_ref[0]
    init_buf = seq_buf_ref[1]

    @pl.when(q_blk == 0)
    def _boot():
        # NaN safety needs no buffer zeroing here: flash() explicitly
        # zeroes KV rows past kv_len before the dots
        start_kv(init_seq, kv_lo_blk(init_seq, q_lo_t), init_buf)

    def next_ids(seq, kv_blk, hi):
        """(valid, seq', blk') of the NEXT (q_blk, seq, kv_blk) consumer
        after (this q_blk, seq, kv_blk) — what to prefetch."""
        in_cur = kv_blk + 1 < hi
        q_end = cu_q_lens_ref[seq + 1]
        seq_ends_here = q_end <= q_hi_t
        nseq1 = jnp.minimum(seq + 1, num_seqs - 1)
        c1 = seq_ends_here & (seq + 1 < num_seqs) \
            & (cu_q_lens_ref[nseq1] < q_hi_t)
        nseq2 = jnp.where(seq_ends_here, nseq1, seq)
        c2 = (q_blk + 1 < n_q_blks) & (q_hi_t < cu_q_lens_ref[num_seqs]) \
            & (jnp.where(seq_ends_here, seq + 1, seq) < num_seqs)
        seq_n = jnp.where(in_cur, seq, jnp.where(c1, nseq1, nseq2))
        qlo_n = jnp.where(
            in_cur, 0,
            jnp.where(c1,
                      jnp.maximum(cu_q_lens_ref[nseq1], q_lo_t),
                      jnp.maximum(cu_q_lens_ref[nseq2], q_hi_t)))
        blk_n = jnp.where(in_cur, kv_blk + 1, kv_lo_blk(seq_n, qlo_n))
        return in_cur | c1 | c2, seq_n, blk_n

    def flash(seq, kv_blk, lo, buf):
        q_start = cu_q_lens_ref[seq]
        q_len = q_len_of(seq)
        kvl = kv_lens_ref[seq]
        base = kvl - q_len
        store_lo = jnp.maximum(q_start - q_lo_t, 0)
        store_hi = jnp.minimum(cu_q_lens_ref[seq + 1] - q_lo_t, NQB)
        is_first = kv_blk == lo
        kv_start = kv_blk * CT

        # per-head lane-sliced buffer reads (NOT a whole-[CT, NkD]
        # materialization — that spills half a MB of vregs and measured
        # 3.7x slower than jax_rpa); rows past kv_len zero per head
        kv_rows = jax.lax.broadcasted_iota(jnp.int32, (CT, 1), 0)
        kv_ok = kv_rows < (kvl - kv_start)

        int8_kv = kv_buf.dtype == jnp.int8
        if int8_kv:
            ks_c = jnp.exp2(kv_buf[
                buf, 0, :, :, Nk * D:Nk * D + 1
            ].reshape(CT, 1).astype(jnp.float32))
            vs_c = jnp.exp2(kv_buf[
                buf, 1, :, :, Nk * D:Nk * D + 1
            ].reshape(CT, 1).astype(jnp.float32))

        def head_kv(h):
            k_h = kv_buf[buf, 0, :, :, h * D:(h + 1) * D].reshape(CT, D)
            v_h = kv_buf[buf, 1, :, :, h * D:(h + 1) * D].reshape(CT, D)
            if int8_kv:
                k_h = (k_h.astype(jnp.float32) * ks_c).astype(q_ref.dtype)
                v_h = (v_h.astype(jnp.float32) * vs_c).astype(q_ref.dtype)
            elif k_h.dtype != q_ref.dtype:
                k_h = k_h.astype(q_ref.dtype)
                v_h = v_h.astype(q_ref.dtype)
            return jnp.where(kv_ok, k_h, 0), jnp.where(kv_ok, v_h, 0)

        M = NQB * G
        # absolute position of each folded row's token
        row_pos = base + q_lo_t - q_start + jax.lax.broadcasted_iota(
            jnp.int32, (M, CT), 0) // G
        col_pos = kv_start + jax.lax.broadcasted_iota(
            jnp.int32, (M, CT), 1)
        masked = row_pos < col_pos              # causal
        win = window_ref[0]
        if chunked:
            masked |= (win >= 0) & (
                col_pos < (row_pos // jnp.maximum(win, 1))
                * jnp.maximum(win, 1))
        else:
            masked |= (win >= 0) & (row_pos - win >= col_pos)

        def masked_rows(ref_shape_rows):
            iota = jax.lax.broadcasted_iota(
                jnp.int32, ref_shape_rows, 0) // G
            return (iota >= store_lo) & (iota < store_hi)

        for h in range(debug_heads or Nk):
            q_h = q_ref[:, h * G:(h + 1) * G, :].reshape(M, D)
            k_h, v_h = head_kv(h)
            qk = jax.lax.dot_general(
                q_h, k_h, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if logit_softcap:
                qk = logit_softcap * jnp.tanh(qk / logit_softcap)
            qk = qk + jnp.where(masked, NEG_INF, 0.0)
            m_c = jnp.max(qk, axis=1, keepdims=True)       # [M, 1]
            p = jnp.exp(qk - m_c)
            pv = jax.lax.dot_general(
                p.astype(v_h.dtype), v_h, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)        # [M, D]
            l_c = jnp.sum(p, axis=1, keepdims=True)

            m_prev = jnp.where(is_first,
                               jnp.full((M, 128), -jnp.inf, jnp.float32),
                               m_scr[h])
            l_prev = jnp.where(is_first, jnp.zeros((M, 128), jnp.float32),
                               l_scr[h])
            m_cb = jnp.broadcast_to(m_c, (M, 128))
            l_cb = jnp.broadcast_to(l_c, (M, 128))
            m_next = jnp.maximum(m_prev, m_cb)
            alpha = jnp.exp(m_prev - m_next)
            beta = jnp.exp(m_cb - m_next)
            l_next = alpha * l_prev + beta * l_cb
            l_safe = jnp.where(l_next == 0.0, 1.0, l_next)

            rows_m = masked_rows((M, 128))
            pltpu.store(m_scr.at[h], m_next, mask=rows_m)
            pltpu.store(l_scr.at[h], l_next, mask=rows_m)

            o_prev = jnp.where(
                is_first, jnp.zeros((M, D), jnp.float32),
                acc_scr[:, h * G:(h + 1) * G, :].reshape(M, D))
            out = (alpha[:, :1] * l_prev[:, :1] * o_prev
                   + beta[:, :1] * pv) / l_safe[:, :1]
            rows3 = jax.lax.broadcasted_iota(
                jnp.int32, (NQB, G, D), 0)
            pltpu.store(
                acc_scr.at[:, h * G:(h + 1) * G, :],
                out.reshape(NQB, G, D),
                mask=(rows3 >= store_lo) & (rows3 < store_hi))

    def is_needed(state):
        done, seq, buf = state
        return (done == 0) & (seq < num_seqs) \
            & (q_lo_t < cu_q_lens_ref[num_seqs])

    def per_seq(state):
        done, seq, buf = state
        q_start = cu_q_lens_ref[seq]
        q_end = cu_q_lens_ref[seq + 1]
        qlo = jnp.maximum(q_start, q_lo_t)
        qhi = jnp.minimum(q_end, q_hi_t)
        lo = kv_lo_blk(seq, qlo)
        hi = kv_hi_blk(seq, qhi)

        def kv_cond(st):
            kv_blk, _ = st
            return kv_blk < hi

        def kv_body(st):
            kv_blk, buf = st
            valid, nseq, nblk = next_ids(seq, kv_blk, hi)
            nbuf = 1 - buf

            @pl.when(valid)
            def _():
                start_kv(nseq, nblk, nbuf)

            wait_kv(seq, kv_blk, buf)
            flash(seq, kv_blk, lo, buf)
            return kv_blk + 1, nbuf

        _, buf = jax.lax.while_loop(kv_cond, kv_body, (lo, buf))
        nseq = jnp.where(q_end <= q_hi_t, seq + 1, seq)
        ndone = jnp.where(q_end < q_hi_t, done, 1)
        return ndone, nseq, buf

    _, seq, buf = jax.lax.while_loop(
        is_needed, per_seq, (jnp.int32(0), init_seq, init_buf))
    seq_buf_ref[0] = jnp.where(seq < num_seqs, seq, 0)
    seq_buf_ref[1] = buf
    o_ref[...] = acc_scr[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "logit_softcap", "window_chunked",
                     "num_q_per_blk", "kv_pages_per_blk", "debug_heads",
                     "interpret"),
)
def ragged_extend_attention_split(
    q: jnp.ndarray,             # [T, Nq, D]
    kv_pages: jnp.ndarray,      # [2, NP, ps, NkD]
    kv_lens: jnp.ndarray,       # i32[B]
    page_indices: jnp.ndarray,  # i32[B, MP]
    cu_q_lens: jnp.ndarray,     # i32[B+1]
    num_seqs: jnp.ndarray,      # i32[]
    sliding_window=None,
    *,
    sm_scale: float,
    logit_softcap: Optional[float] = None,
    window_chunked: bool = False,
    num_q_per_blk: int = 64,
    kv_pages_per_blk: int = 32,
    debug_heads: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    T, Nq, D = q.shape
    _, NP, ps, LD = kv_pages.shape
    NkD = LD - 128 if kv_pages.dtype == jnp.int8 else LD
    Nk = NkD // D
    kv_flat = kv_pages                     # stored flat: NO reshape
    B, MP = page_indices.shape
    KVP = min(kv_pages_per_blk, MP)
    NQB = min(num_q_per_blk, max(16, T))
    T_pad = ((T + NQB - 1) // NQB) * NQB
    q_pad = jnp.pad(q, ((0, T_pad - T), (0, 0), (0, 0)))
    window = jnp.full((1,), -1, jnp.int32) if sliding_window is None \
        else jnp.asarray(sliding_window, jnp.int32).reshape(1)
    G = Nq // Nk

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(T_pad // NQB,),
        in_specs=[
            pl.BlockSpec((NQB, Nq, D), lambda qb, *_: (qb, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((NQB, Nq, D), lambda qb, *_: (qb, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 2, KVP, ps, LD), kv_pages.dtype),
            pltpu.SemaphoreType.DMA((2, 2, KVP)),
            pltpu.VMEM((Nk, NQB * G, 128), jnp.float32),
            pltpu.VMEM((Nk, NQB * G, 128), jnp.float32),
            pltpu.VMEM((NQB, Nq, D), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _extend_split_kernel,
        num_kv_heads=Nk,
        kv_pages_per_blk=KVP,
        page_size=ps,
        max_pages=MP,
        sm_scale=sm_scale,
        logit_softcap=logit_softcap,
        chunked=window_chunked,
        debug_heads=debug_heads,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T_pad, Nq, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=interpret,
    )(kv_lens, page_indices, cu_q_lens,
      jnp.zeros(2, jnp.int32), num_seqs.reshape(1), window, q_pad, kv_flat)
    return out[:T]
