"""Mixture-of-Experts block (analog of sglang srt/layers/moe/: FusedMoE
Triton grouped GEMM + topk router, layers/moe/fused_moe_triton/layer.py:398).

Two compute paths:
  * "dense": every expert runs on every token, masked-weighted sum —
    O(E/K) extra FLOPs but pure jnp, GSPMD-shardable, runs anywhere.
    Used on CPU (tests) and as the multi-chip path until the shard_map
    EP kernel lands.
  * "gmm": tokens sorted by expert id + megablox grouped matmul
    (jax.experimental.pallas.ops.tpu.megablox) — the TPU-native ragged
    expert GEMM, equivalent of the reference's fused_moe Triton kernel.

Router: softmax top-k with optional renormalization (Mixtral normalizes
over the top-k; Qwen3-MoE uses norm_topk_prob).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def route_topk(router_logits: jnp.ndarray, top_k: int,
               renormalize: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[T, E] -> (weights [T, K], ids i32[T, K])."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    w, ids = jax.lax.top_k(probs, top_k)
    if renormalize:
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    return w, ids.astype(jnp.int32)


def moe_dense(h: jnp.ndarray, w_router, we_gate, we_up, we_down,
              top_k: int, renormalize: bool) -> jnp.ndarray:
    """Dense-dispatch MoE: [T, H] -> [T, H]."""
    T, H = h.shape
    E = we_gate.shape[0]
    router_logits = h @ w_router                     # [T, E]
    w, ids = route_topk(router_logits, top_k, renormalize)
    # per-token per-expert combined weight: [T, E]
    combine = jnp.zeros((T, E), jnp.float32)
    combine = jax.vmap(lambda c, i, v: c.at[i].add(v))(combine, ids, w)
    # all experts on all tokens: [E, T, I] -> [E, T, H]
    up = jnp.einsum("th,ehi->eti", h, we_up)
    gate = jnp.einsum("th,ehi->eti", h, we_gate)
    act = jax.nn.silu(gate) * up
    out = jnp.einsum("eti,eih->eth", act, we_down)   # [E, T, H]
    return jnp.einsum("eth,te->th", out.astype(jnp.float32),
                      combine).astype(h.dtype)


def moe_gmm(h: jnp.ndarray, w_router, we_gate, we_up, we_down,
            top_k: int, renormalize: bool) -> jnp.ndarray:
    """Grouped-matmul MoE via megablox (single-shard expert weights)."""
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    T, H = h.shape
    E = we_gate.shape[0]
    router_logits = h @ w_router
    w, ids = route_topk(router_logits, top_k, renormalize)  # [T, K]
    K = top_k
    flat_ids = ids.reshape(-1)                       # [T*K]
    order = jnp.argsort(flat_ids)                    # stable
    token_of = order // K                            # source token per slot
    group_sizes = jnp.bincount(flat_ids, length=E)
    x = h[token_of]                                  # [T*K, H] sorted by expert
    g = gmm(x, we_gate, group_sizes)
    u = gmm(x, we_up, group_sizes)
    act = (jax.nn.silu(g.astype(jnp.float32)) * u.astype(jnp.float32)).astype(h.dtype)
    y = gmm(act, we_down, group_sizes)               # [T*K, H]
    wt = w.reshape(-1)[order].astype(jnp.float32)    # [T*K]
    out = jnp.zeros((T, H), jnp.float32)
    out = out.at[token_of].add(y.astype(jnp.float32) * wt[:, None])
    return out.astype(h.dtype)


def moe_block(h, w_router, we_gate, we_up, we_down, *, top_k: int,
              renormalize: bool, impl: str) -> jnp.ndarray:
    if impl == "gmm":
        return moe_gmm(h, w_router, we_gate, we_up, we_down,
                       top_k, renormalize)
    return moe_dense(h, w_router, we_gate, we_up, we_down,
                     top_k, renormalize)
