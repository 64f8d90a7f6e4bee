"""Fused whole-layer decode megakernel: ONE Pallas call runs ALL decoder
layers of a quantized llama-family model for one decode step, with a
single persistent weight-DMA pipeline spanning every projection of every
layer AND the attention in between.

Why (VERDICT r4 -> r5 #1): with one pallas_call per GEMM, each call runs
a private DMA pipeline, so weight DMA idles during attention + XLA glue —
the measured in-model GEMM rate was exactly 819 GB/s x (GEMM-time /
layer-time) ~ 550 GB/s. Per-kernel tuning was exhausted (four negative
A/Bs, PARITY.md r4); the remaining lever is structural. Here the grid is
(num_layers,) — scratch persists across grid steps, so a single global
chunk ring streams qkv -> o -> gate/up -> down -> next layer's qkv
back-to-back while attention (whose own KV-page ring also prefetches
across layers) computes. The reference hides the same glue with
full-step CUDA graphs (srt/model_executor/cuda_graph_runner.py:203);
a graph replay cannot overlap weight reads with attention — this can.

Scope (the flagship serving config; `fused_eligible` gates the rest to
the scan path): decode mode (one new token per sequence), K/V-split page
pool, GQA with head_dim 128, standard half-split rope, RMSNorm pre-norms,
gated-SiLU MLP, symmetric INT4 (W4A8 integer dots / W4A16 dequant) or
INT8 W8A16 group-quantized fused qkv + gate/up + o + down projections.

Layer math mirrors models/llama_family.py layer_body exactly (same
dtypes at every boundary: bf16 staging, f32 norm/softmax/accumulation).
Attention reads HBM pages for positions < kv_len-1 and folds the
VMEM-resident current token in with one flat online-softmax merge; the
new rows land in the (input/output-aliased) pool in-kernel by page
read-modify-write — single-ROW DMAs are impossible on TPU ((8,128)
tiling applies in HBM too), and an XLA pool scatter measured ~1.5 ms
standalone — with the target pages prefetched one layer ahead. The
greedy lm_head + argmax optionally stream as a final phase through
their own bf16 chunk ring (head_w/final_norm args), emitting tokens
directly. Reference bar: the reference hides inter-op glue with
full-step CUDA graphs (srt/model_executor/cuda_graph_runner.py:203) —
a graph replay cannot overlap weight reads with attention; this does.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)

# dequant-chain arithmetic for the non-a8 modes: "f32" (3 VPU passes,
# the r1-r4 winner) or "bf16" (2 passes — re-probed per geometry
# generation; r1 measured it slower for int4 at BN=1024)
_DEQ = __import__("os").environ.get("IAAS_FUSED_DEQ", "f32")

# projection ids (schedule order within a layer)
P_QKV, P_O, P_GU, P_DN = 0, 1, 2, 3


@dataclasses.dataclass(frozen=True)
class _Geo:
    """Static per-projection chunk geometry. BK/BN are uniform across
    projections (BK=2048 divides every K in the llama family incl.
    I=14336; BN=1024 divides every N) so every weight chunk shares one
    ring-slot shape."""
    K: int
    N: int
    BK: int
    BN: int
    nk: int
    nj: int
    off: int      # chunk offset of this projection within a layer
    soff: int     # scale-block (column-block) offset within a layer


def _build_geos(H: int, NqD: int, NkD: int, I: int, BK: int, BN: int):
    dims = [
        (H, NqD + 2 * NkD),   # qkv (fused)
        (NqD, H),             # o
        (H, 2 * I),           # gate/up (fused)
        (I, H),               # down
    ]
    geos, off, soff = [], 0, 0
    for K, N in dims:
        bk = BK if K % BK == 0 else K
        bn = BN if N % BN == 0 else N
        assert K % bk == 0 and N % bn == 0, (K, N, bk, bn)
        nk, nj = K // bk, N // bn
        geos.append(_Geo(K, N, bk, bn, nk, nj, off, soff))
        off += nk * nj
        soff += nj
    return geos, off, soff     # (geos, chunks_per_layer, scales_per_layer)


def _ns_needed(geos, cpl: int, nw: int) -> int:
    """Max scale blocks alive while a column block is consumed: a scale
    slot is read from its column's first chunk through its last (nk-1
    later), during which issue runs up to nw chunks ahead — count k==0
    chunks in every window of nw + max_nk + 1 chunks of the (periodic)
    schedule."""
    k0 = []
    for g in geos:
        for j in range(g.nj):
            for k in range(g.nk):
                k0.append(1 if k == 0 else 0)
    k0 = k0 * 4  # windows crossing layer boundaries
    win = nw + max(g.nk for g in geos) + 1
    best = 0
    for s in range(cpl):
        best = max(best, sum(k0[s:s + win]))
    return best + 1


def _fused_kernel(
    # scalar prefetch
    kv_lens_ref,        # i32[B] (INCLUDING the current token)
    page_indices_ref,   # i32[B, MP] per-layer-local page ids
    out_slots_ref,      # i32[B] layer-LOCAL pool slot of the new token
    # VMEM inputs
    hidden_in_ref,      # [T, H] bf16
    cos_ref, sin_ref,   # [T, D/2] f32 (attn_factor folded in)
    norm1_ref,          # [L, H] norm weights
    norm2_ref,          # [L, H]
    # HBM inputs
    qkv_q, qkv_s, o_q, o_s, gu_q, gu_s, dn_q, dn_s,
    kv_hbm,             # [2, NP, ps, NkD]
    slots_v_ref,        # i32[B, 1] out_slots as a VMEM column (the
    #                     masked row-insert needs them as a vector)
    norm3_ref,          # [1, 1, H] final norm | None (head fusion)
    head_hbm,           # [H, V] bf16 (ANY) | None
    # outputs
    hidden_out_ref,     # [T, H] bf16 (doubles as the residual carry)
    k_out_ref,          # [1, T, NkD] block (by layer)
    v_out_ref,          # [1, T, NkD] block
    tok_out_ref,        # [T, 128] i32 | None — greedy argmax tokens
    kv_out,             # [2, NP, ps, LD] (ANY) — ALIASED to kv_hbm: the
    #                     new token's rows land via page read-modify-
    #                     write (an XLA scatter on the 1.6 GB pool
    #                     measured ~1.5 ms/step — r5 glue attribution;
    #                     single-ROW DMAs are impossible: TPU arrays are
    #                     (8,128)-tiled in HBM too, so a 1-sublane slice
    #                     fails Mosaic's alignment)
    # scratch
    wbuf, wsem,         # [NW, WR, BN] int8, DMA[NW]
    sbuf, ssem,         # [NS, SRmax, BN] f32, DMA[NS]
    kvbuf, kvsem,       # [NKV, 2, CP, ps, NkD], DMA[NKV, 2, CP]
    kvw_sem,            # DMA (2, B) — page write-backs
    kvr_sem,            # DMA (2, B) — page reads
    kvw_scr,            # [2, T, LD] pool-dtype write rows (int8: holds
    #                     the quantized rows incl. inline scales)
    pgbuf,              # [2, B, ps, LD] page RMW staging
    hbuf,               # [2, BKH, BNH] bf16 head ring | None
    hsem,               # DMA (2,) | None
    pipe,               # i32[8] SMEM
    h_scr,              # [T, Kmax] bf16 (GEMM x staging, reused)
    stg,                # [T, Nmax] bf16 (GEMM output staging)
    q3, k3,             # [B, Nq, D] / [B, Nk, D] bf16 (roped)
    A3,                 # [B, Nq, D] f32
    m3, l3,             # [B, Nq, 128] f32
    xg_scr,             # [Gmax, T, G] int8 | None (a8 only)
    xs_scr,             # [T, 128] f32 | None
    *,
    geos, cpl, spl, L, B, MP, ppl, ps,
    num_q_heads, num_kv_heads, head_dim,
    mode, sm_scale, eps,
    nw, ns, nkv, cp, head_group, vocab=0, bkh=0, bnh=0,
    debug_attn=False,
):
    Nq, Nk, D = num_q_heads, num_kv_heads, head_dim
    G = Nq // Nk
    NqD, NkD = Nq * D, Nk * D
    H = geos[P_QKV].K
    I = geos[P_DN].K
    T = B
    CT = cp * ps
    total_chunks = cpl * L
    int4 = mode in ("w4a8", "w4a16")
    a8 = mode in ("w4a8", "w8a8")
    l = pl.program_id(0)

    # ------------------------------------------------ weight ring issue
    W_ISS, S_ISS = 0, 1
    KV_ISS, KV_CONS, KV_LYR, KV_SEQ, KV_CHK = 2, 3, 4, 5, 6

    wstacks = [qkv_q, o_q, gu_q, dn_q]
    sstacks = [qkv_s, o_s, gu_s, dn_s]

    def issue_w(c, s_count):
        """Issue weight chunk with global index c (and its scale block
        when it is a column-block head). Returns new scale count."""
        li = c // cpl
        cl = c % cpl
        slot = jax.lax.rem(c, nw)
        new_s = s_count
        for p, g in enumerate(geos):
            in_p = (cl >= g.off) & (cl < g.off + g.nk * g.nj)
            local = cl - g.off
            j = local // g.nk
            k = local - (local // g.nk) * g.nk
            wrows = g.BK // 2 if int4 else g.BK

            @pl.when(in_p)
            def _():
                wsrc = wstacks[p].at[li]
                pltpu.make_async_copy(
                    wsrc.at[pl.ds(k * wrows, wrows), pl.ds(j * g.BN, g.BN)],
                    wbuf.at[slot, pl.ds(0, wrows), pl.ds(0, g.BN)],
                    wsem.at[slot],
                ).start()

            @pl.when(in_p & (k == 0))
            def _():
                ssrc = sstacks[p].at[li]
                pltpu.make_async_copy(
                    ssrc.at[:, pl.ds(j * g.BN, g.BN)],
                    sbuf.at[jax.lax.rem(s_count, ns),
                            pl.ds(0, g.K // GROUP), pl.ds(0, g.BN)],
                    ssem.at[jax.lax.rem(s_count, ns)],
                ).start()

            new_s = jnp.where(in_p & (k == 0), new_s + 1, new_s)
        return new_s

    def top_up_w(consumed):
        """Issue ahead while every in-flight slot stays disjoint from the
        unconsumed ones: `consumed` = count of fully READ chunks, so the
        deepest safe issue is chunk consumed + nw - 1 (its ring slot is
        the last consumed chunk's). Callers pass the CURRENT chunk index
        BEFORE waiting on it (chunks < c are read, c itself is not)."""
        lim = jnp.minimum(consumed + nw, total_chunks)

        def cond(t):
            return t[0] < lim

        def body(t):
            c, sc = t
            sc2 = issue_w(c, sc)
            return c + 1, sc2

        iss, sc = jax.lax.while_loop(
            cond, body, (pipe[W_ISS], pipe[S_ISS]))
        pipe[W_ISS] = iss
        pipe[S_ISS] = sc

    def wait_w(c, g):
        wrows = g.BK // 2 if int4 else g.BK
        slot = jax.lax.rem(c, nw)
        pltpu.make_async_copy(
            wstacks[0].at[0].at[pl.ds(0, wrows), pl.ds(0, g.BN)],
            wbuf.at[slot, pl.ds(0, wrows), pl.ds(0, g.BN)],
            wsem.at[slot],
        ).wait()
        return slot

    def wait_s(sc, p):
        g = geos[p]
        slot = jax.lax.rem(sc, ns)
        pltpu.make_async_copy(
            sstacks[p].at[0, :, pl.ds(0, g.BN)],
            sbuf.at[slot, pl.ds(0, g.K // GROUP), pl.ds(0, g.BN)],
            ssem.at[slot],
        ).wait()
        return slot

    # ----------------------------------------------------- KV ring issue
    def hbm_len_of(s):
        return jnp.maximum(kv_lens_ref[jnp.minimum(s, B - 1)] - 1, 0)

    def kv_chunks_of(s):
        return pl.cdiv(hbm_len_of(s), CT)

    def norm_kv(t):
        """Advance (lyr, seq, chunk) past empty/finished sequences."""
        def cond(t):
            lyr, s, c = t
            return (lyr < L) & ((s >= B) | (c >= kv_chunks_of(s)))

        def bdy(t):
            lyr, s, c = t
            nxt_layer = s + 1 >= B
            return (jnp.where(nxt_layer, lyr + 1, lyr),
                    jnp.where(nxt_layer, 0, s + 1),
                    jnp.int32(0))

        return jax.lax.while_loop(cond, bdy, t)

    def issue_kv(count, lyr, s, c):
        slot = jax.lax.rem(count, nkv)
        npg = pl.cdiv(hbm_len_of(s), ps)
        for j in range(cp):
            idx = c * cp + j

            @pl.when(idx < npg)
            def _():
                page = page_indices_ref[
                    s, jnp.minimum(idx, MP - 1)] + lyr * ppl
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm.at[e, page],
                        kvbuf.at[slot, e, j],
                        kvsem.at[slot, e, j],
                    ).start()

    def top_up_kv():
        # prefetch depth nkv-1 on an nkv-slot ring: the consumer reads
        # kvbuf[slot] AFTER topping up, so the deepest in-flight chunk
        # must never re-target the slot being read this iteration (same
        # convention as the split decode kernel's depth-(NBUF-1))
        cons = pipe[KV_CONS]

        def cond(t):
            count, lyr, s, c = t
            return (count - cons < nkv - 1) & (lyr < L)

        def body(t):
            count, lyr, s, c = t
            issue_kv(count, lyr, s, c)
            lyr2, s2, c2 = norm_kv((lyr, s, c + 1))
            return count + 1, lyr2, s2, c2

        count, lyr, s, c = jax.lax.while_loop(
            cond, body,
            (pipe[KV_ISS], pipe[KV_LYR], pipe[KV_SEQ], pipe[KV_CHK]))
        pipe[KV_ISS] = count
        pipe[KV_LYR] = lyr
        pipe[KV_SEQ] = s
        pipe[KV_CHK] = c

    def wait_kv(s, c, slot):
        npg = pl.cdiv(hbm_len_of(s), ps)
        for j in range(cp):

            @pl.when(c * cp + j < npg)
            def _():
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm.at[e, 0],
                        kvbuf.at[slot, e, j],
                        kvsem.at[slot, e, j],
                    ).wait()

    # ------------------------------------------------------------- boot
    @pl.when(l == 0)
    def _boot():
        for i in range(8):
            pipe[i] = 0
        hidden_out_ref[...] = hidden_in_ref[...]
        # NaN safety: partial chunks leave stale buffer rows in the dots
        # (masked after) — stale must be finite, so zero once
        for n in range(nkv):
            for e in range(2):
                for j in range(cp):
                    kvbuf[n, e, j] = jnp.zeros_like(kvbuf[n, e, j])
        lyr, s, c = norm_kv((jnp.int32(0), jnp.int32(0), jnp.int32(0)))
        pipe[KV_LYR] = lyr
        pipe[KV_SEQ] = s
        pipe[KV_CHK] = c
        top_up_w(jnp.int32(0))
        top_up_kv()
        if not debug_attn:
            # prefetch layer 0's RMW target pages (inline: the pg_rd
            # helper is defined later in the trace order)
            def rd0(s2, _):
                for e in range(2):
                    pltpu.make_async_copy(
                        kv_hbm.at[e, out_slots_ref[s2] // ps],
                        pgbuf.at[0, e, s2],
                        kvr_sem.at[e, s2]).start()
                return 0
            jax.lax.fori_loop(0, B, rd0, 0)

    # --------------------------------------------------- a8 quantization
    def quantize_a8(K):
        """Quantize h_scr[:, :K] (bf16, exactly the existing GEMM input)
        per-token to int8 into the grouped xg_scr[:K/G] layout + xs_scr
        per-token scale — value semantics of quantize_act_int8."""
        x32 = h_scr[:, pl.ds(0, K)].astype(jnp.float32)
        amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
        sc = jnp.maximum(amax / 127.0, 1e-8)          # [T, 1]
        xs_scr[...] = jnp.broadcast_to(sc, (T, 128))

        def gbody(gi, _):
            blk = h_scr[:, pl.ds(gi * GROUP, GROUP)].astype(jnp.float32)
            xg_scr[gi] = jnp.clip(
                jnp.round(blk / sc), -127, 127).astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, K // GROUP, gbody, 0)

    # ------------------------------------------------------- GEMM phase
    def gemm(p, store):
        """Run projection p of layer l off the global ring; store(j, acc)
        consumes each finished [T, BN] f32 column block."""
        g = geos[p]
        nG = g.BK // GROUP

        def jbody(j, _):
            sc = l * spl + g.soff + j
            s_slot = wait_s(sc, p)

            def kbody(k, acc):
                c = l * cpl + g.off + j * g.nk + k
                top_up_w(c)
                slot = wait_w(c, g)
                s_rows = sbuf[s_slot, pl.ds(k * nG, nG), pl.ds(0, g.BN)]
                if a8:
                    if int4:
                        w8 = pltpu.bitcast(
                            wbuf[slot, pl.ds(0, g.BK // 2),
                                 pl.ds(0, g.BN)],
                            jnp.int4).astype(jnp.int8)
                    else:
                        w8 = wbuf[slot, pl.ds(0, g.BK), pl.ds(0, g.BN)]
                    xgk = xg_scr[pl.ds(k * nG, nG)]     # [nG, T, G]
                    part = jax.lax.dot_general(
                        xgk, w8.reshape(nG, GROUP, g.BN),
                        (((2,), (1,)), ((0,), (0,))),
                        preferred_element_type=jnp.int32)
                    return acc + jnp.sum(
                        part.astype(jnp.float32) * s_rows[:, None, :],
                        axis=0)
                if int4:
                    w4 = pltpu.bitcast(
                        wbuf[slot, pl.ds(0, g.BK // 2), pl.ds(0, g.BN)],
                        jnp.int4)
                else:
                    w4 = wbuf[slot, pl.ds(0, g.BK), pl.ds(0, g.BN)]
                if _DEQ == "bf16":
                    w3 = (w4.astype(jnp.bfloat16).reshape(nG, GROUP, g.BN)
                          * s_rows.astype(jnp.bfloat16)[:, None, :])
                    wf = w3.reshape(g.BK, g.BN)
                else:
                    w3 = (w4.astype(jnp.float32).reshape(nG, GROUP, g.BN)
                          * s_rows[:, None, :])
                    wf = w3.reshape(g.BK, g.BN).astype(jnp.bfloat16)
                xk = h_scr[:, pl.ds(k * g.BK, g.BK)]
                return acc + jax.lax.dot_general(
                    xk, wf, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            acc = jax.lax.fori_loop(
                0, g.nk, kbody, jnp.zeros((T, g.BN), jnp.float32))
            if a8:
                acc = acc * xs_scr[:, :1]
            store(j, acc, g)
            return 0

        jax.lax.fori_loop(0, g.nj, jbody, 0)

    def store_stg(j, acc, g):
        stg[:, pl.ds(j * g.BN, g.BN)] = acc.astype(jnp.bfloat16)

    def store_resid(j, acc, g):
        cur = hidden_out_ref[:, pl.ds(j * g.BN, g.BN)]
        hidden_out_ref[:, pl.ds(j * g.BN, g.BN)] = \
            cur + acc.astype(jnp.bfloat16)

    def rmsnorm_to_h(src, w):
        x32 = src.astype(jnp.float32)
        var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
        h_scr[:, pl.ds(0, H)] = normed.astype(jnp.bfloat16)
        if a8:
            quantize_a8(H)

    # ===================================================== layer program
    # 1. input norm (norm refs arrive as per-layer (1, H) blocks — a
    # traced-sublane read of the [L, H] stack cannot prove 8-alignment)
    rmsnorm_to_h(hidden_out_ref[...], norm1_ref[0, 0])

    # 2. qkv GEMM
    gemm(P_QKV, store_stg)

    # 3. rope into q3 / k3 (f32 math, bf16 storage — apply_rope parity)
    half = D // 2
    cos3 = cos_ref[...][:, None, :]              # [T, 1, D/2] f32
    sin3 = sin_ref[...][:, None, :]
    qr = stg[:, pl.ds(0, NqD)].reshape(T, Nq, D).astype(jnp.float32)
    q1, q2 = qr[:, :, :half], qr[:, :, half:]
    q3[:, :, :half] = (q1 * cos3 - q2 * sin3).astype(jnp.bfloat16)
    q3[:, :, half:] = (q2 * cos3 + q1 * sin3).astype(jnp.bfloat16)
    kr = stg[:, pl.ds(NqD, NkD)].reshape(T, Nk, D).astype(jnp.float32)
    k1, k2 = kr[:, :, :half], kr[:, :, half:]
    k3[:, :, :half] = (k1 * cos3 - k2 * sin3).astype(jnp.bfloat16)
    k3[:, :, half:] = (k2 * cos3 + k1 * sin3).astype(jnp.bfloat16)
    k_out_ref[0] = k3[...].reshape(T, NkD)
    v_out_ref[0] = stg[:, pl.ds(NqD + NkD, NkD)]

    # 3b. pool write-back: DMA the new token's K/V rows into the pool
    # (aliased in/out). int8 pools quantize here (inline po2 scales,
    # matching ops/attention.quantize_kv_int8 exactly).
    int8_kv = kv_hbm.dtype == jnp.int8
    LD = kv_out.shape[-1]

    def q_rows(rows):     # [T, NkD] f32 -> int8 row block + exponents
        amax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True)
        e = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / 127.0)), -62, 61)
        qq = jnp.clip(jnp.round(rows * jnp.exp2(-e)),
                      -127, 127).astype(jnp.int8)
        return qq, e

    if int8_kv:
        kq, ke = q_rows(k3[...].reshape(T, NkD).astype(jnp.float32))
        vq, ve = q_rows(
            stg[:, pl.ds(NqD + NkD, NkD)].astype(jnp.float32))
        kvw_scr[0] = jnp.concatenate(
            [kq, jnp.broadcast_to(ke.astype(jnp.int8), (T, 128))], axis=1)
        kvw_scr[1] = jnp.concatenate(
            [vq, jnp.broadcast_to(ve.astype(jnp.int8), (T, 128))], axis=1)
    else:
        kvw_scr[0] = k3[...].reshape(T, NkD).astype(kvw_scr.dtype)
        kvw_scr[1] = stg[:, pl.ds(NqD + NkD, NkD)].astype(kvw_scr.dtype)

    # layer l's target pages prefetch into pgbuf[l%2] during layer l-1
    # (layer 0's at boot), so only the sem wait — not the read latency —
    # sits on the critical path; layer l's write-backs source the same
    # half while l+1's reads land in the other, freed once l-1's writes
    # drain
    par = jax.lax.rem(l, 2)

    def pg_of(s2, lyr):
        return lyr * ppl + out_slots_ref[s2] // ps

    def pg_rd(e, s2, lyr):
        return pltpu.make_async_copy(
            kv_hbm.at[e, pg_of(s2, lyr)],
            pgbuf.at[jax.lax.rem(lyr, 2), e, s2],
            kvr_sem.at[e, s2])

    def pg_wr(e, s2):
        return pltpu.make_async_copy(
            pgbuf.at[par, e, s2], kv_out.at[e, pg_of(s2, l)],
            kvw_sem.at[e, s2])

    def wait_writes():
        def wb(s2, _):
            for e in range(2):
                pg_wr(e, s2).wait()
            return 0
        jax.lax.fori_loop(0, B, wb, 0)

    if not debug_attn:
        def rdw(s2, _):
            for e in range(2):
                pg_rd(e, s2, l).wait()
            return 0

        jax.lax.fori_loop(0, B, rdw, 0)

        @pl.when(l > 0)
        def _wait_prev_writes():
            wait_writes()   # frees write sems + the other pgbuf half

        # insert the new row into every sequence's page (history rows
        # rewrite with identical bytes — safe vs concurrent attention
        # page reads; pads hit the garbage page)
        row_col = jax.lax.rem(slots_v_ref[...], ps)        # [B, 1]
        mask = (jax.lax.broadcasted_iota(jnp.int32, (B, ps, 1), 1)
                == row_col[:, :, None])
        for e in range(2):
            new3 = jnp.broadcast_to(
                kvw_scr[e].reshape(T, 1, LD), (B, ps, LD))
            pgbuf[par, e] = jnp.where(mask, new3, pgbuf[par, e])

        def wr(s2, _):
            for e in range(2):
                pg_wr(e, s2).start()
            return 0

        jax.lax.fori_loop(0, B, wr, 0)

        @pl.when(l + 1 < L)
        def _prefetch_next():
            def rdn(s2, _):
                for e in range(2):
                    pg_rd(e, s2, l + 1).start()
                return 0
            jax.lax.fori_loop(0, B, rdn, 0)

    # 4. paged attention over HBM (positions < kv_len-1), per sequence
    HG = min(head_group, Nk)
    ng = Nk // HG

    def seq_body(s, _):
        hbm_len = hbm_len_of(s)
        n_chunks = pl.cdiv(hbm_len, CT)

        @pl.when(n_chunks > 0)
        def _run():
            q = q3[s]                          # [Nq, D] bf16
            row = jax.lax.broadcasted_iota(jnp.int32, (HG * G, 1), 0)
            q_pads = []
            for gg in range(ng):
                qg = q[gg * HG * G:(gg + 1) * HG * G]
                q_pads.append(jnp.concatenate(
                    [jnp.where((row >= h * G) & (row < (h + 1) * G), qg, 0)
                     for h in range(HG)], axis=1))      # [HG*G, HG*D]

            def body(ci, carry):
                m, lse, acc = carry
                slot = jax.lax.rem(pipe[KV_CONS], nkv)
                wait_kv(s, ci, slot)
                pipe[KV_CONS] = pipe[KV_CONS] + 1
                top_up_kv()
                top_up_w(l * cpl + geos[P_O].off)

                LD = kvbuf.shape[-1]
                kr_c = kvbuf[slot, 0].reshape(CT, LD)
                vr_c = kvbuf[slot, 1].reshape(CT, LD)
                if kr_c.dtype == jnp.int8:
                    # inline per-token po2 scales (ops/attention.py
                    # quantize_kv_int8): dequant rides the upcast
                    ksc = jnp.exp2(
                        kr_c[:, NkD:NkD + 1].astype(jnp.float32))
                    vsc = jnp.exp2(
                        vr_c[:, NkD:NkD + 1].astype(jnp.float32))
                    kr_c = (kr_c[:, :NkD].astype(jnp.float32)
                            * ksc).astype(q.dtype)
                    vr_c = (vr_c[:, :NkD].astype(jnp.float32)
                            * vsc).astype(q.dtype)
                elif kr_c.dtype != q.dtype:
                    kr_c = kr_c[:, :NkD].astype(q.dtype)
                    vr_c = vr_c[:, :NkD].astype(q.dtype)

                pos = ci * CT + jax.lax.broadcasted_iota(
                    jnp.int32, (1, CT), 1)
                valid = pos < hbm_len
                scores = jnp.concatenate([
                    jax.lax.dot_general(
                        q_pads[gg],
                        kr_c[:, gg * HG * D:(gg + 1) * HG * D],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    for gg in range(ng)], axis=0) * sm_scale
                scores = jnp.where(valid, scores, -jnp.inf)

                m_c = jnp.max(scores, axis=-1, keepdims=True)
                m_n = jnp.maximum(m, m_c)
                alpha = jnp.exp(m - m_n)
                pr = jnp.exp(scores - m_n)
                l_n = alpha * lse + jnp.sum(pr, axis=-1, keepdims=True)
                blocks = []
                for gg in range(ng):
                    pv_g = jax.lax.dot_general(
                        pr[gg * HG * G:(gg + 1) * HG * G].astype(
                            vr_c.dtype),
                        vr_c[:, gg * HG * D:(gg + 1) * HG * D],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    a_g = alpha[gg * HG * G:(gg + 1) * HG * G]
                    blocks.append(
                        a_g * acc[:, gg * HG * D:(gg + 1) * HG * D]
                        + pv_g)
                return m_n, l_n, jnp.concatenate(blocks, axis=1)

            m0 = jnp.full((Nq, 1), -jnp.inf, jnp.float32)
            l0 = jnp.zeros((Nq, 1), jnp.float32)
            acc0 = jnp.zeros((HG * G, NkD), jnp.float32)
            m, lse, acc = jax.lax.fori_loop(
                0, n_chunks, body, (m0, l0, acc0))
            outs = []
            for gg in range(ng):
                acc_g = acc[:, gg * HG * D:(gg + 1) * HG * D]
                l_g = lse[gg * HG * G:(gg + 1) * HG * G]
                for h in range(HG):
                    outs.append(
                        acc_g[h * G:(h + 1) * G, h * D:(h + 1) * D]
                        / jnp.maximum(l_g[h * G:(h + 1) * G], 1e-30))
            A3[s] = jnp.concatenate(outs, axis=0)
            m3[s] = jnp.broadcast_to(
                jnp.where(m == -jnp.inf, NEG_INF, m), (Nq, 128))
            l3[s] = jnp.broadcast_to(lse, (Nq, 128))

        @pl.when(n_chunks == 0)
        def _empty():
            A3[s] = jnp.zeros((Nq, D), jnp.float32)
            m3[s] = jnp.full((Nq, 128), NEG_INF, jnp.float32)
            l3[s] = jnp.zeros((Nq, 128), jnp.float32)

        return 0

    jax.lax.fori_loop(0, B, seq_body, 0)

    # 5. fold the current token in (flat online-softmax merge): its K/V
    # live in k3 / v_out_ref; under int8 pools the merge sees the
    # quantize->dequantize roundtrip of the row exactly as the next
    # step's pool read will

    def qdq(rows):       # [T, NkD] f32 -> int8-pool roundtrip
        amax = jnp.max(jnp.abs(rows), axis=-1, keepdims=True)
        e = jnp.clip(
            jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / 127.0)), -62, 61)
        qq = jnp.clip(jnp.round(rows * jnp.exp2(-e)), -127, 127)
        return qq * jnp.exp2(e)

    vrows = v_out_ref[0].astype(jnp.float32)
    krows = k3[...].reshape(T, NkD).astype(jnp.float32)
    if int8_kv:
        vrows = qdq(vrows)
        krows = qdq(krows)
    vr3 = vrows.reshape(T, Nk, D)
    kq3 = krows.reshape(T, Nk, D)
    for hk in range(Nk):
        qg = q3[:, hk * G:(hk + 1) * G, :].astype(jnp.float32)
        kg = kq3[:, hk:hk + 1, :].astype(jnp.float32)
        sc = jnp.sum(qg * kg, axis=2, keepdims=True) * sm_scale
        scb = jnp.broadcast_to(sc, (T, G, 128))
        m_old = m3[:, hk * G:(hk + 1) * G, :]
        l_old = l3[:, hk * G:(hk + 1) * G, :]
        m_new = jnp.maximum(m_old, scb)
        alpha = jnp.exp(m_old - m_new)
        beta = jnp.exp(scb - m_new)
        l_new = alpha * l_old + beta
        vg = jnp.broadcast_to(vr3[:, hk:hk + 1, :], (T, G, D))
        A3[:, hk * G:(hk + 1) * G, :] = (
            alpha * l_old * A3[:, hk * G:(hk + 1) * G, :] + beta * vg
        ) / l_new

    attn_flat = A3[...].astype(jnp.bfloat16).reshape(T, NqD)
    if debug_attn:
        hidden_out_ref[:, pl.ds(0, NqD)] = attn_flat
        return
    h_scr[:, pl.ds(0, NqD)] = attn_flat
    if a8:
        quantize_a8(NqD)

    # 6. o projection + residual
    gemm(P_O, store_resid)

    # 7. post-attention norm
    rmsnorm_to_h(hidden_out_ref[...], norm2_ref[0, 0])

    # 8. gate/up GEMM
    gemm(P_GU, store_stg)

    # 9. silu(gate) * up
    gate = stg[:, pl.ds(0, I)].astype(jnp.float32)
    up = stg[:, pl.ds(I, I)].astype(jnp.float32)
    inter = gate * jax.nn.sigmoid(gate) * up
    h_scr[:, pl.ds(0, I)] = inter.astype(jnp.bfloat16)
    if a8:
        quantize_a8(I)

    # 10. down projection + residual
    gemm(P_DN, store_resid)

    # outstanding pool write-backs must complete before the call ends
    @pl.when(l == L - 1)
    def _final_write_wait():
        wait_writes()

    # 11. (optional) greedy head: final norm + lm_head GEMM streamed
    # through its own double-buffered bf16 ring + in-kernel argmax —
    # deletes the XLA lm_head/argmax tail (~1.3 ms at 8B) from the
    # chain's critical path glue
    if head_hbm is not None:
        nkh, njh = geos[P_QKV].K // bkh, vocab // bnh
        total_h = nkh * njh

        @pl.when(l == L - 1)
        def _head():
            x32 = hidden_out_ref[...].astype(jnp.float32)
            var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
            hh = (x32 * jax.lax.rsqrt(var + eps)
                  * norm3_ref[0].astype(jnp.float32))
            h_scr[:, pl.ds(0, geos[P_QKV].K)] = hh.astype(jnp.bfloat16)

            def h_issue(c, slot):
                j = c // nkh
                k = c - (c // nkh) * nkh
                pltpu.make_async_copy(
                    head_hbm.at[pl.ds(k * bkh, bkh), pl.ds(j * bnh, bnh)],
                    hbuf.at[slot], hsem.at[slot]).start()

            for c0 in range(3):
                @pl.when(c0 < total_h)
                def _():
                    h_issue(jnp.int32(c0), jnp.int32(c0))

            def h_body(c, carry):
                best_m, best_i, acc = carry
                slot = jax.lax.rem(c, 4)
                pltpu.make_async_copy(
                    head_hbm.at[pl.ds(0, bkh), pl.ds(0, bnh)],
                    hbuf.at[slot], hsem.at[slot]).wait()

                @pl.when(c + 3 < total_h)
                def _():
                    # slot (c+3)%4 == (c-1)%4: consumed last iteration
                    h_issue(c + 3, jax.lax.rem(c + 3, 4))
                j = c // nkh
                k = c - (c // nkh) * nkh
                acc = acc + jax.lax.dot_general(
                    h_scr[:, pl.ds(k * bkh, bkh)], hbuf[slot],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                done = k == nkh - 1
                cols = j * bnh + jax.lax.broadcasted_iota(
                    jnp.int32, (T, bnh), 1)
                m_j = jnp.max(acc, axis=1, keepdims=True)
                # first-index tie-break, matching XLA argmax
                i_j = jnp.min(jnp.where(acc == m_j, cols, vocab),
                              axis=1, keepdims=True)
                upd = done & (m_j > best_m)
                best_i = jnp.where(upd, i_j, best_i)
                best_m = jnp.where(upd, m_j, best_m)
                acc = jnp.where(done, jnp.zeros_like(acc), acc)
                return best_m, best_i, acc

            best_m0 = jnp.full((T, 1), -jnp.inf, jnp.float32)
            best_i0 = jnp.zeros((T, 1), jnp.int32)
            acc0 = jnp.zeros((T, bnh), jnp.float32)
            _, best_i, _ = jax.lax.fori_loop(
                0, total_h, h_body, (best_m0, best_i0, acc0))
            tok_out_ref[...] = jnp.broadcast_to(best_i, (T, 128))


@functools.partial(
    jax.jit,
    static_argnames=("num_q_heads", "num_kv_heads", "head_dim", "mode",
                     "sm_scale", "eps", "pages_per_layer", "head_group",
                     "nw", "nkv", "block_k", "block_n", "chunk_pages",
                     "interpret", "debug_attn"))
def fused_decode_layers(
    hidden_in: jnp.ndarray,      # [T, H] bf16
    cos: jnp.ndarray,            # [T, D/2] f32
    sin: jnp.ndarray,            # [T, D/2] f32
    kv_lens: jnp.ndarray,        # i32[B] incl. current token
    out_slots: jnp.ndarray,      # i32[B] layer-local slot of the new token
    page_indices: jnp.ndarray,   # i32[B, MP] per-layer-local
    kv_pages: jnp.ndarray,       # [2, NP, ps, NkD]
    norm1: jnp.ndarray,          # [L, H]
    norm2: jnp.ndarray,          # [L, H]
    qkv_q, qkv_s, o_q, o_s, gu_q, gu_s, dn_q, dn_s,
    *,
    num_q_heads: int,
    num_kv_heads: int,
    head_dim: int,
    mode: str,                   # "w4a8" | "w4a16" | "w8a16"
    sm_scale: float,
    eps: float,
    pages_per_layer: int,
    head_group: int = 4,
    nw: int = 0,                 # 0 = mode default
    # KV-chunk prefetch ring: depth 5 (nkv-1) across sequences AND layers
    # — the same-session sweep put nkv=6 at 5.83 ms vs nkv=4's 6.29 on
    # the 32L stack (KV latency, not bandwidth, gates the attention
    # phase at ctx 192)
    nkv: int = 6,
    block_k: int = 2048,
    # BN=2048 halves the dot count per K-chunk: the T=32-row dots are
    # MXU-latency-bound, so fewer/wider wins (r5 sweep: w4a8 5.91 ms vs
    # 6.98 at BN=1024; w8a16 10.8 vs 25.1 — the f32 dequant chain
    # degrades catastrophically at BN=1024 in-kernel)
    block_n: int = 2048,
    chunk_pages: int = 16,
    interpret: bool = False,
    debug_attn: bool = False,
    head_w: Optional[jnp.ndarray] = None,   # [H, V] bf16: fuse the
    # greedy lm_head + argmax into the kernel (own bf16 chunk ring)
    final_norm: Optional[jnp.ndarray] = None,   # [H] (required w/ head)
):
    """Returns (hidden_out [T, H] bf16, k_out [L, T, NkD] bf16,
    v_out [L, T, NkD] bf16, kv_pages updated in place via aliasing
    [, tokens i32[T] when head_w is given])."""
    T, H = hidden_in.shape
    B = kv_lens.shape[0]
    assert T == B, "fused decode needs one token per sequence"
    MP = page_indices.shape[1]
    _, NP, ps, LD = kv_pages.shape
    NkD = LD - 128 if kv_pages.dtype == jnp.int8 else LD
    Nq, Nk, D = num_q_heads, num_kv_heads, head_dim
    NqD = Nq * D
    assert NkD == Nk * D
    L = norm1.shape[0]
    int4 = mode in ("w4a8", "w4a16")
    I = dn_q.shape[1] * 2 if int4 else dn_q.shape[1]

    geos, cpl, spl = _build_geos(H, NqD, NkD, I, block_k, block_n)
    if nw == 0:
        nw = 16 if int4 else 10   # ~32/40 MB weight ring (r5 sweep)
    ns = _ns_needed(geos, cpl, nw)
    BKmax = max(g.BK for g in geos)
    WR = BKmax // 2 if int4 else BKmax
    BNmax = max(g.BN for g in geos)
    SRmax = max(g.K // GROUP for g in geos)
    Kmax = max(g.K for g in geos)
    Nmax = max(g.N for g in geos)
    cp = min(chunk_pages, MP)

    with_head = head_w is not None
    vocab = bkh = bnh = 0
    if with_head:
        Hh, vocab = head_w.shape
        assert Hh == H and final_norm is not None
        bkh = 2048 if H % 2048 == 0 else H
        for cand in (1024, 768, 512, 384, 256, 128):
            if vocab % cand == 0:
                bnh = cand
                break
        assert bnh, f"vocab {vocab} has no 128-multiple block divisor"

    kernel = functools.partial(
        _fused_kernel,
        geos=geos, cpl=cpl, spl=spl, L=L, B=B, MP=MP,
        ppl=pages_per_layer, ps=ps,
        num_q_heads=Nq, num_kv_heads=Nk, head_dim=D,
        mode=mode, sm_scale=sm_scale, eps=eps,
        nw=nw, ns=ns, nkv=nkv, cp=cp, head_group=head_group,
        vocab=vocab, bkh=bkh, bnh=bnh,
        debug_attn=debug_attn,
    )

    base_scratch = [
        pltpu.VMEM((nw, WR, BNmax), jnp.int8),         # wbuf
        pltpu.SemaphoreType.DMA((nw,)),
        pltpu.VMEM((ns, SRmax, BNmax), jnp.float32),   # sbuf
        pltpu.SemaphoreType.DMA((ns,)),
        pltpu.VMEM((nkv, 2, cp, ps,
                    kv_pages.shape[3]), kv_pages.dtype),
        pltpu.SemaphoreType.DMA((nkv, 2, cp)),
        pltpu.SemaphoreType.DMA((2, B)),               # kvw_sem
        pltpu.SemaphoreType.DMA((2, B)),               # kvr_sem
        pltpu.VMEM((2, B, kv_pages.shape[3]),
                   kv_pages.dtype),                    # kvw_scr
        pltpu.VMEM((2, 2, B, ps, kv_pages.shape[3]),
                   kv_pages.dtype),                    # pgbuf [parity,
        #                                                plane, seq, ...]
    ]
    head_scratch = ([pltpu.VMEM((4, bkh, bnh), jnp.bfloat16),
                     pltpu.SemaphoreType.DMA((4,))] if with_head else [])
    tail_scratch = [
        pltpu.SMEM((8,), jnp.int32),
        pltpu.VMEM((T, Kmax), jnp.bfloat16),           # h_scr
        pltpu.VMEM((T, Nmax), jnp.bfloat16),           # stg
        pltpu.VMEM((B, Nq, D), jnp.bfloat16),          # q3
        pltpu.VMEM((B, Nk, D), jnp.bfloat16),          # k3
        pltpu.VMEM((B, Nq, D), jnp.float32),           # A3
        pltpu.VMEM((B, Nq, 128), jnp.float32),         # m3
        pltpu.VMEM((B, Nq, 128), jnp.float32),         # l3
    ]
    a8 = mode in ("w4a8", "w8a8")
    a8_scratch = ([pltpu.VMEM((Kmax // GROUP, T, GROUP), jnp.int8),
                   pltpu.VMEM((T, 128), jnp.float32)] if a8 else [])
    scratch = base_scratch + head_scratch + tail_scratch + a8_scratch
    n_out = 5 if with_head else 4

    def kern(*refs):
        i = 18                      # 3 prefetch + 15 fixed inputs
        norm3 = head = None
        if with_head:
            norm3, head = refs[i], refs[i + 1]
            i += 2
        if with_head:
            hid_o, k_o, v_o, kv_o, tok_o = refs[i:i + 5]
        else:
            hid_o, k_o, v_o, kv_o = refs[i:i + 4]
            tok_o = None
        i += n_out
        scr = list(refs[i:])
        base = scr[:10]
        si = 10
        hbuf = hsem = None
        if with_head:
            hbuf, hsem = scr[si], scr[si + 1]
            si += 2
        rest = scr[si:si + 8]
        xg = scr[si + 8] if a8 else None
        xs = scr[si + 9] if a8 else None
        return kernel(*refs[:18], norm3, head,
                      hid_o, k_o, v_o, tok_o, kv_o,
                      *base, hbuf, hsem, *rest, xg, xs)

    in_specs = [
        pl.BlockSpec((T, H), lambda li, *_: (0, 0)),
        pl.BlockSpec((T, D // 2), lambda li, *_: (0, 0)),
        pl.BlockSpec((T, D // 2), lambda li, *_: (0, 0)),
        # [L, 1, H] with (1, 1, H) blocks: a (1, H) block of [L, H]
        # violates the (8, 128)-divisible block rule; a middle
        # singleton matching the array dim is allowed
        pl.BlockSpec((1, 1, H), lambda li, *_: (li, 0, 0)),
        pl.BlockSpec((1, 1, H), lambda li, *_: (li, 0, 0)),
    ] + [pl.BlockSpec(memory_space=pl.ANY)] * 9 + [
        pl.BlockSpec((B, 1), lambda li, *_: (0, 0)),   # slots column
    ]
    args = [kv_lens, page_indices,
            jnp.asarray(out_slots, jnp.int32),
            hidden_in, cos, sin,
            norm1.reshape(L, 1, H), norm2.reshape(L, 1, H),
            qkv_q, qkv_s, o_q, o_s, gu_q, gu_s, dn_q, dn_s, kv_pages,
            jnp.asarray(out_slots, jnp.int32).reshape(B, 1)]
    out_shape = [
        jax.ShapeDtypeStruct((T, H), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, T, NkD), jnp.bfloat16),
        jax.ShapeDtypeStruct((L, T, NkD), jnp.bfloat16),
        jax.ShapeDtypeStruct(kv_pages.shape, kv_pages.dtype),
    ]
    out_specs = [
        pl.BlockSpec((T, H), lambda li, *_: (0, 0)),
        pl.BlockSpec((1, T, NkD), lambda li, *_: (li, 0, 0)),
        pl.BlockSpec((1, T, NkD), lambda li, *_: (li, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),             # kv pool (aliased)
    ]
    if with_head:
        in_specs += [pl.BlockSpec((1, H), lambda li, *_: (0, 0)),
                     pl.BlockSpec(memory_space=pl.ANY)]
        args += [final_norm.reshape(1, H).astype(jnp.bfloat16),
                 head_w]
        out_shape.append(jax.ShapeDtypeStruct((T, 128), jnp.int32))
        out_specs.append(pl.BlockSpec((T, 128), lambda li, *_: (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
    )
    outs = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=out_shape,
        # flat arg 16 = kv_pages (3 scalar-prefetch + inputs; kv_pages
        # sits before the slots column and the optional head inputs)
        input_output_aliases={16: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return outs
