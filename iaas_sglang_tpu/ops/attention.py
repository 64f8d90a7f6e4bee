"""Ragged paged attention: the single attention interface of the framework.

This is the TPU re-design of the reference's whole attention-backend zoo
(srt/layers/attention/, 12k LoC of FlashInfer/FA3/Triton wrappers behind
base_attn_backend.py:14): ONE metadata-driven ragged paged-attention op
that serves prefill, chunked extend, and batched decode in the same call.

Calling convention (shared by every backend):
    q            f32/bf16 [T, Nq, D]   -- all new tokens of the batch, ragged
    kv_pages     [NP, page_size, 2*Nk, D] -- K at even, V at odd head index
    kv_lens      i32[Bmax]             -- total tokens per seq (incl. new)
    page_indices i32[Bmax, MP]         -- page table per sequence
    cu_q_lens    i32[Bmax+1]           -- prefix sum of new-token counts
    num_seqs     i32[]                 -- number of real sequences
Returns [T, Nq, D].

Backends:
    "jnp"     -- gather-based reference; runs anywhere (CPU tests)
    "pallas"  -- our Pallas TPU kernel (ops/ragged_paged_attention.py)
    "jax_rpa" -- jax.experimental built-in ragged paged attention (cross-check)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


def is_split_layout(kv_pages) -> bool:
    """K/V-split plane-outermost pool [2, NP, ps, Nk*D] (r4). An
    interleaved pool [NP, ps, 2Nk, D] always has dim 0 = page count > 2
    (>= num_layers * 17 pages)."""
    return kv_pages.ndim == 4 and kv_pages.shape[0] == 2


def paged_attention(
    q: jnp.ndarray,
    kv_pages: jnp.ndarray,
    kv_lens: jnp.ndarray,
    page_indices: jnp.ndarray,
    cu_q_lens: jnp.ndarray,
    num_seqs: jnp.ndarray,
    *,
    sm_scale: float,
    sliding_window=None,     # None | int | traced i32 scalar (-1 = off)
    window_chunked: bool = False,  # static: window = Llama-4 chunked local
    #   attention (keys visible iff floor(kpos/C) == floor(qpos/C))
    logit_softcap: Optional[float] = None,   # gemma2 tanh soft-capping
    backend: str = "jnp",
    mode: str = "extend",   # static: "extend" (ragged q) | "decode" (q_len==1)
    tree_bits: Optional[jnp.ndarray] = None,  # i32[Bmax, 32] spec-tree mask
) -> jnp.ndarray:
    # Tree-mask verify (EAGLE tree speculation, reference
    # build_eagle_tree.py:45 custom mask): each sequence's q segment is a
    # draft TREE, row r may attend segment slot j iff bit j of
    # tree_bits[seq, r] is set; prefix KV (slots before the segment) stays
    # fully visible. Replaces the in-segment causal mask.
    # hybrid-SWA models (gemma2/3) scan one layer body over layers, so the
    # per-layer window arrives as a TRACED scalar — only the jnp path and
    # our own kernels support that; jax's builtin rpa needs a static int.
    window_traced = isinstance(sliding_window, jnp.ndarray)
    if backend == "jnp":
        return _jnp_paged_attention(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=sm_scale, sliding_window=sliding_window,
            window_chunked=window_chunked,
            logit_softcap=logit_softcap, tree_bits=tree_bits,
        )
    split = is_split_layout(kv_pages)
    if tree_bits is not None:
        # only our own extend kernel supports the tree mask on TPU
        from iaas_sglang_tpu.ops.extend_attention import (
            ragged_extend_attention,
        )

        return ragged_extend_attention(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=sm_scale, sliding_window=sliding_window,
            logit_softcap=logit_softcap, tree_bits=tree_bits,
        )
    if backend in ("pallas", "pallas_own"):
        if mode == "decode":
            if split:
                from iaas_sglang_tpu.ops.split_attention import (
                    paged_decode_attention_split,
                )

                return paged_decode_attention_split(
                    q, kv_pages, kv_lens, page_indices,
                    sm_scale=sm_scale, sliding_window=sliding_window,
                    window_chunked=window_chunked,
                    logit_softcap=logit_softcap,
                )
            from iaas_sglang_tpu.ops.decode_attention import (
                paged_decode_attention,
            )

            return paged_decode_attention(
                q, kv_pages, kv_lens, page_indices,
                sm_scale=sm_scale, sliding_window=sliding_window,
                window_chunked=window_chunked,
                logit_softcap=logit_softcap,
            )
        if split and backend != "pallas_own":
            # jax_rpa hard-codes interleaved pages: the split layout's
            # extend default is our flat-q-block kernel
            from iaas_sglang_tpu.ops.split_attention import (
                ragged_extend_attention_split,
            )

            return ragged_extend_attention_split(
                q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
                sm_scale=sm_scale, sliding_window=sliding_window,
                window_chunked=window_chunked,
                logit_softcap=logit_softcap,
            )
        if (backend == "pallas_own" or window_traced or logit_softcap
                or window_chunked):
            from iaas_sglang_tpu.ops.extend_attention import (
                ragged_extend_attention,
            )

            return ragged_extend_attention(
                q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
                sm_scale=sm_scale, sliding_window=sliding_window,
                window_chunked=window_chunked,
                logit_softcap=logit_softcap,
            )
        # default extend path: jax's built-in ragged paged attention
        # (ours above, selected via --attention-backend pallas_own, is the
        # in-house replacement being tuned against it)
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention as jax_rpa,
        )

        return jax_rpa(
            q, kv_pages, kv_lens, page_indices, cu_q_lens,
            num_seqs.reshape(1),
            sm_scale=sm_scale, sliding_window=sliding_window,
        )
    if backend == "jax_rpa":
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention as jax_rpa,
        )

        return jax_rpa(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=sm_scale, sliding_window=sliding_window,
        )
    raise ValueError(f"unknown attention backend {backend!r}")


def _jnp_paged_attention(
    q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
    *, sm_scale, sliding_window=None, window_chunked=False,
    logit_softcap=None, tree_bits=None,
):
    T, Nq, D = q.shape
    split = is_split_layout(kv_pages)
    int8_kv = split and kv_pages.dtype == jnp.int8
    if split:
        _, NP, ps, LD = kv_pages.shape
        NkD = LD - 128 if int8_kv else LD
        Nk = NkD // D
    else:
        NP, ps, NK2, _ = kv_pages.shape
        Nk = NK2 // 2
    Bmax, MP = page_indices.shape
    S = MP * ps
    group = Nq // Nk

    # token -> sequence id (tokens of seq s live in [cu_q_lens[s], cu_q_lens[s+1]))
    t_idx = jnp.arange(T, dtype=jnp.int32)
    seg_ids = jnp.searchsorted(cu_q_lens[1:], t_idx, side="right").astype(jnp.int32)
    seg_ids = jnp.minimum(seg_ids, Bmax - 1)
    # absolute key-position of each query token within its sequence
    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]  # [Bmax]
    q_pos = (
        t_idx
        - cu_q_lens[seg_ids]
        + kv_lens[seg_ids]
        - q_lens[seg_ids]
    )  # [T]

    # gather whole sequences (reference path only; kernels stream pages)
    if int8_kv:
        k_seq = dequantize_kv_int8(
            kv_pages[0][page_indices], jnp.float32).reshape(Bmax, S, Nk, D)
        v_seq = dequantize_kv_int8(
            kv_pages[1][page_indices], jnp.float32).reshape(Bmax, S, Nk, D)
    elif split:   # plane-outermost [2, NP, ps, NkD]
        k_seq = kv_pages[0][page_indices].reshape(Bmax, S, Nk, D)
        v_seq = kv_pages[1][page_indices].reshape(Bmax, S, Nk, D)
    else:
        kv_seq = kv_pages[page_indices].reshape(Bmax, S, 2 * Nk, D)
        k_seq = kv_seq[:, :, 0::2, :]  # [Bmax, S, Nk, D]
        v_seq = kv_seq[:, :, 1::2, :]

    k_tok = k_seq[seg_ids]  # [T, S, Nk, D]
    v_tok = v_seq[seg_ids]

    qf = q.astype(jnp.float32).reshape(T, Nk, group, D)
    kf = k_tok.astype(jnp.float32)
    vf = v_tok.astype(jnp.float32)
    scores = jnp.einsum("tkgd,tskd->tkgs", qf, kf) * sm_scale  # [T, Nk, g, S]
    if logit_softcap:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)

    key_pos = jnp.arange(S, dtype=jnp.int32)[None, :]  # [1, S]
    if tree_bits is not None:
        # speculative tree mask: within the q segment (the last q_len KV
        # slots of the sequence) visibility follows the per-row ancestor
        # bitmask; prefix slots stay fully visible
        seg_start = (kv_lens - q_lens)[seg_ids]            # [T]
        jseg = key_pos - seg_start[:, None]                # [T, S]
        r_seg = jnp.clip(t_idx - cu_q_lens[seg_ids], 0, 31)
        bits = tree_bits[seg_ids, r_seg]                   # i32[T]
        allow = (jnp.right_shift(
            bits[:, None], jnp.clip(jseg, 0, 31)) & 1) == 1
        valid = (key_pos < kv_lens[seg_ids][:, None]) & (
            (jseg < 0) | allow)
    else:
        valid = (key_pos <= q_pos[:, None]) \
            & (key_pos < kv_lens[seg_ids][:, None])
    if sliding_window is not None and tree_bits is None:
        win = jnp.asarray(sliding_window, jnp.int32)
        if window_chunked:
            # Llama-4 chunked local attention
            valid &= (win < 0) | (
                key_pos >= (q_pos[:, None] // jnp.where(win < 0, 1, win))
                * win)
        else:
            valid &= (win < 0) | (key_pos > q_pos[:, None] - win)
    # padding tokens (seg beyond num_seqs) get a degenerate but finite row;
    # only all-invalid rows get the key-0 escape (a blanket key-0 pass
    # would defeat the sliding-window mask for rows past the window)
    any_valid = jnp.any(valid, axis=-1, keepdims=True)
    valid = valid | (~any_valid & (jnp.arange(S)[None, :] == 0))
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgs,tskd->tkgd", probs, vf)
    return out.reshape(T, Nq, D).astype(q.dtype)


def mla_paged_attention(
    q: jnp.ndarray,            # [T, Nq, Dk]  Dk = kv_lora_rank + rope_dim
    kv_pages: jnp.ndarray,     # [NP, ps, 1, Dk] compressed latent + roped k_pe
    kv_lens: jnp.ndarray,      # i32[Bmax]
    page_indices: jnp.ndarray, # i32[Bmax, MP]
    cu_q_lens: jnp.ndarray,    # i32[Bmax+1]
    num_seqs: jnp.ndarray,
    *,
    sm_scale: float,
    v_dim: int,                # kv_lora_rank; V = entry[..., :v_dim]
    backend: str = "jnp",
    mode: str = "extend",
) -> jnp.ndarray:
    """Multi-head Latent Attention over the paged compressed-KV pool.

    The absorbed-MLA formulation (reference: DeepSeek MLA decode backends,
    srt/layers/attention/flashinfer_mla_backend.py / flashmla_backend.py):
    queries are pre-absorbed into latent space by the caller, so attention
    itself is MQA with one shared KV entry per token whose first `v_dim`
    channels double as V. Returns the latent context [T, Nq, v_dim].
    """
    if backend in ("pallas", "pallas_own"):
        if mode == "decode":
            from iaas_sglang_tpu.ops.decode_attention import (
                mla_paged_decode_attention,
            )

            return mla_paged_decode_attention(
                q, kv_pages, kv_lens, page_indices,
                sm_scale=sm_scale, v_dim=v_dim,
            )
        from iaas_sglang_tpu.ops.extend_attention import (
            mla_ragged_extend_attention,
        )

        return mla_ragged_extend_attention(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=sm_scale, v_dim=v_dim,
        )
    T, Nq, Dk = q.shape
    NP, ps, _, _ = kv_pages.shape
    Bmax, MP = page_indices.shape
    S = MP * ps

    t_idx = jnp.arange(T, dtype=jnp.int32)
    seg_ids = jnp.searchsorted(cu_q_lens[1:], t_idx, side="right").astype(jnp.int32)
    seg_ids = jnp.minimum(seg_ids, Bmax - 1)
    q_lens = cu_q_lens[1:] - cu_q_lens[:-1]
    q_pos = t_idx - cu_q_lens[seg_ids] + kv_lens[seg_ids] - q_lens[seg_ids]

    kv_seq = kv_pages[page_indices].reshape(Bmax, S, Dk)
    k_tok = kv_seq[seg_ids]                      # [T, S, Dk]

    qf = q.astype(jnp.float32)
    kf = k_tok.astype(jnp.float32)
    scores = jnp.einsum("tnd,tsd->tns", qf, kf) * sm_scale  # [T, Nq, S]

    key_pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = (key_pos <= q_pos[:, None]) & (key_pos < kv_lens[seg_ids][:, None])
    valid = valid | (jnp.arange(S)[None, :] == 0)
    scores = jnp.where(valid[:, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tns,tsd->tnd", probs, kf[..., :v_dim])
    return out.astype(q.dtype)


# ------------------------------------------------------ double sparsity


def ds_paged_decode_attention(
    q: jnp.ndarray,              # [B, Nq, D] (one new token per seq)
    kv_pages: jnp.ndarray,       # [NP, ps, 2*Nk, D]
    label_pages: jnp.ndarray,    # [NP, ps, Nk, r] heavy-channel K labels
    q_heavy: jnp.ndarray,        # [B, Nk, r] group-summed heavy-channel q
    kv_lens: jnp.ndarray,        # i32[B]
    page_indices: jnp.ndarray,   # i32[B, MP]
    *,
    sm_scale: float,
    heavy_tokens: int,           # top-k tokens attended per kv head
    logit_softcap=None,
) -> jnp.ndarray:
    """Double-sparsity decode (reference double_sparsity_backend.py +
    sgl-kernel vertical_slash/heavy-token kernels): the tiny label cache
    (r channels per token, r << D) scores EVERY cached token, and full
    attention runs over only the top `heavy_tokens` positions per kv head
    — HBM traffic drops from S*D to S*r + k*D per head."""
    B, Nq, D = q.shape
    NP, ps, NK2, _ = kv_pages.shape
    Nk = NK2 // 2
    group = Nq // Nk
    MP = page_indices.shape[1]
    S = MP * ps
    k_sel = min(heavy_tokens, S)

    labels = label_pages[page_indices].reshape(B, S, Nk, -1)   # [B,S,Nk,r]
    approx = jnp.einsum("bnr,bsnr->bns",
                        q_heavy.astype(jnp.float32),
                        labels.astype(jnp.float32))            # [B,Nk,S]
    key_pos = jnp.arange(S, dtype=jnp.int32)[None, :]
    valid = key_pos < kv_lens[:, None]                         # [B, S]
    approx = jnp.where(valid[:, None, :], approx, -jnp.inf)
    # newest token always attends itself: force-select the last position
    last = (kv_lens - 1)[:, None]
    approx = jnp.where(key_pos[None] == last[:, None], jnp.inf, approx)
    _, idx = jax.lax.top_k(approx, k_sel)                      # [B,Nk,k]

    kv_seq = kv_pages[page_indices].reshape(B, S, 2 * Nk, D)
    k_seq = kv_seq[:, :, 0::2, :]                              # [B,S,Nk,D]
    v_seq = kv_seq[:, :, 1::2, :]
    bidx = jnp.arange(B)[:, None, None]
    nidx = jnp.arange(Nk)[None, :, None]
    k_sel_rows = k_seq[bidx, idx, nidx]                        # [B,Nk,k,D]
    v_sel_rows = v_seq[bidx, idx, nidx]
    sel_valid = jnp.take_along_axis(valid[:, None, :].repeat(Nk, 1),
                                    idx, axis=2)               # [B,Nk,k]

    # padded rows (kv_lens == 0) select nothing: give them one escape key
    # so softmax stays finite (their output is discarded; a NaN here would
    # poison the shared garbage page on the next KV write)
    any_valid = jnp.any(sel_valid, axis=-1, keepdims=True)
    sel_valid = sel_valid | (
        ~any_valid & (jnp.arange(k_sel)[None, None, :] == 0))

    qf = q.astype(jnp.float32).reshape(B, Nk, group, D)
    scores = jnp.einsum("bngd,bnkd->bngk", qf,
                        k_sel_rows.astype(jnp.float32)) * sm_scale
    if logit_softcap:
        scores = logit_softcap * jnp.tanh(scores / logit_softcap)
    scores = jnp.where(sel_valid[:, :, None, :], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bngk,bnkd->bngd", probs,
                     v_sel_rows.astype(jnp.float32))
    return out.reshape(B, Nq, D).astype(q.dtype)


def write_label_pages(
    label_pages: jnp.ndarray,   # [NP, ps, Nk, r]
    out_slots: jnp.ndarray,     # i32[T]
    labels: jnp.ndarray,        # [T, Nk, r]
) -> jnp.ndarray:
    NP, ps, Nk, r = label_pages.shape
    flat = label_pages.reshape(NP * ps, Nk, r)
    flat = flat.at[out_slots].set(labels.astype(label_pages.dtype))
    return flat.reshape(NP, ps, Nk, r)


# --------------------------------------------------------- DP attention
#
# TPU re-design of the reference's DP attention (layers/dp_attention.py:61,
# scheduler.py:1821 prepare_mlp_sync_batch): attention runs batch-parallel
# with UNSPLIT heads across all G = dp*tp mesh devices; each device owns a
# private KV page space (leading rank dim on the pool, sharded over both
# axes) and only its own rows. shard_map over ('dp','tp') makes every
# gather/scatter/kernel purely shard-local — the dp_gather before the
# TP FFN is the all-gather GSPMD inserts right after (the hidden states
# leave the shard_map dp-sharded on tokens and meet tp-sharded weights).
# The reference's IDLE lockstep batches are per-rank padding rows here.

_DP_AXES = ("dp", "tp")


def _dp_shard_map(fn, mesh, n_in: int):
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P(_DP_AXES)
    return shard_map(
        fn, mesh=mesh,
        in_specs=tuple(spec for _ in range(n_in)),
        out_specs=spec,
    )


def dp_paged_attention(
    q: jnp.ndarray,            # [T, Nq, D], T = G * T_r rank-major
    kv_pages: jnp.ndarray,     # [G, NP, ps, 2*Nk, D] rank-private page spaces
    kv_lens: jnp.ndarray,      # i32[G, B_r]
    page_indices: jnp.ndarray, # i32[G, B_r, MP] rank-LOCAL page ids
    cu_q_lens: jnp.ndarray,    # i32[G, B_r+1] rank-local prefix sums
    num_seqs: jnp.ndarray,     # i32[G]
    *,
    mesh,
    **kwargs,
) -> jnp.ndarray:
    G = page_indices.shape[0]
    T, Nq, D = q.shape

    def local(qs, kvs, kls, pis, cqs, nss):
        out = paged_attention(
            qs[0], kvs[0], kls[0], pis[0], cqs[0], nss[0], **kwargs)
        return out[None]

    out = _dp_shard_map(local, mesh, 6)(
        q.reshape(G, T // G, Nq, D), kv_pages, kv_lens, page_indices,
        cu_q_lens, num_seqs)
    return out.reshape(T, Nq, D)


def dp_mla_paged_attention(
    q: jnp.ndarray,            # [T, Nq, Dk]
    kv_pages: jnp.ndarray,     # [G, NP, ps, 1, Dk]
    kv_lens: jnp.ndarray,
    page_indices: jnp.ndarray,
    cu_q_lens: jnp.ndarray,
    num_seqs: jnp.ndarray,
    *,
    mesh,
    v_dim: int,
    **kwargs,
) -> jnp.ndarray:
    G = page_indices.shape[0]
    T, Nq, Dk = q.shape

    def local(qs, kvs, kls, pis, cqs, nss):
        out = mla_paged_attention(
            qs[0], kvs[0], kls[0], pis[0], cqs[0], nss[0],
            v_dim=v_dim, **kwargs)
        return out[None]

    out = _dp_shard_map(local, mesh, 6)(
        q.reshape(G, T // G, Nq, Dk), kv_pages, kv_lens, page_indices,
        cu_q_lens, num_seqs)
    return out.reshape(T, Nq, v_dim)


def dp_write_kv_entries(
    kv_pages: jnp.ndarray,   # [G, NP, ps, NE, D]
    out_slots: jnp.ndarray,  # i32[T] rank-LOCAL slots, T = G * T_r
    entries: jnp.ndarray,    # [T, NE, D]
    *,
    mesh,
) -> jnp.ndarray:
    G = kv_pages.shape[0]
    T, NE, D = entries.shape

    def local(kvs, slots, ents):
        return write_kv_entries(kvs[0], slots[0], ents[0])[None]

    return _dp_shard_map(local, mesh, 3)(
        kv_pages, out_slots.reshape(G, T // G),
        entries.reshape(G, T // G, NE, D))


def dp_write_kv_pages(
    kv_pages: jnp.ndarray,   # [G, NP, ps, 2*Nk, D]
    out_slots: jnp.ndarray,  # i32[T] rank-LOCAL slots
    k: jnp.ndarray,          # [T, Nk, D]
    v: jnp.ndarray,          # [T, Nk, D]
    *,
    mesh,
) -> jnp.ndarray:
    G = kv_pages.shape[0]
    T, Nk, D = k.shape

    def local(kvs, slots, ks, vs):
        return write_kv_pages(kvs[0], slots[0], ks[0], vs[0])[None]

    return _dp_shard_map(local, mesh, 4)(
        kv_pages, out_slots.reshape(G, T // G),
        k.reshape(G, T // G, Nk, D), v.reshape(G, T // G, Nk, D))


def write_kv_entries(
    kv_pages: jnp.ndarray,   # [NP, ps, NE, D] flat page space
    out_slots: jnp.ndarray,  # i32[T] flat slot = page*ps + offset
    entries: jnp.ndarray,    # [T, NE, D]
) -> jnp.ndarray:
    """Scatter arbitrary per-token KV entries into the paged pool (the
    geometry-agnostic core shared by MHA [2*Nk heads] and MLA [1 latent])."""
    NP, ps, NE, D = kv_pages.shape
    flat = kv_pages.reshape(NP * ps, NE, D)
    flat = flat.at[out_slots].set(entries.astype(kv_pages.dtype))
    return flat.reshape(NP, ps, NE, D)


def quantize_kv_int8(x: jnp.ndarray) -> jnp.ndarray:
    """[T, NkD] -> [T, NkD + 128] int8 page rows: per-token power-of-two
    scale (dequant = q * 2^e), exponent replicated across the trailing
    128-lane block so every page-row copy (KV moves, PD streaming,
    HiCache) carries its scale for free and kernels read it as a free
    [CT, 1] lane slice. Reference analog: fp8 KV set_kv_buffer scaling
    (srt/mem_cache/memory_pool.py:99) — int8+po2 keeps v5e decode at
    bf16-parity latency where fp8's convert does not (PARITY.md r4)."""
    T, NkD = x.shape
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    e = jnp.clip(jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-30) / 127.0)),
                 -62, 61)
    q = jnp.clip(jnp.round(xf * jnp.exp2(-e)), -127, 127).astype(jnp.int8)
    erow = jnp.broadcast_to(e.astype(jnp.int8), (T, 128))
    return jnp.concatenate([q, erow], axis=-1)


def dequantize_kv_int8(rows: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[..., NkD + 128] int8 page rows -> [..., NkD] dequantized."""
    NkD = rows.shape[-1] - 128
    e = rows[..., NkD:NkD + 1].astype(jnp.float32)
    return (rows[..., :NkD].astype(jnp.float32) * jnp.exp2(e)).astype(dtype)


def write_kv_pages(
    kv_pages: jnp.ndarray,   # [NP, ps, 2*Nk, D] (flat page space, all layers)
    out_slots: jnp.ndarray,  # i32[T] flat slot = page*ps + offset
    k: jnp.ndarray,          # [T, Nk, D]
    v: jnp.ndarray,          # [T, Nk, D]
) -> jnp.ndarray:
    """Scatter new K/V into the paged pool. Padding lanes must point at the
    garbage page. (TPU analog of the reference's Triton
    write_req_to_token_pool / set_kv_buffer paths, schedule_batch.py:1778.)"""
    T, Nk, D = k.shape
    if is_split_layout(kv_pages):   # plane-outermost [2, NP, ps, NkD(+128)]
        _, NP, ps, LD = kv_pages.shape
        flat = kv_pages.reshape(2 * NP * ps, LD)
        if kv_pages.dtype == jnp.int8:
            kf = quantize_kv_int8(k.reshape(T, Nk * D))
            vf = quantize_kv_int8(v.reshape(T, Nk * D))
        else:
            kf = k.reshape(T, LD).astype(kv_pages.dtype)
            vf = v.reshape(T, LD).astype(kv_pages.dtype)
        flat = flat.at[out_slots].set(kf)
        flat = flat.at[NP * ps + out_slots].set(vf)
        return flat.reshape(2, NP, ps, LD)
    NP, ps, NK2, _ = kv_pages.shape
    updates = jnp.stack([k, v], axis=2).reshape(T, 2 * Nk, D).astype(kv_pages.dtype)
    flat = kv_pages.reshape(NP * ps, NK2, D)
    # NOTE: padding lanes share garbage slots, so indices are NOT unique.
    flat = flat.at[out_slots].set(updates)
    return flat.reshape(NP, ps, NK2, D)
