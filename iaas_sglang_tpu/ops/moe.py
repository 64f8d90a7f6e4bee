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


def route_llama4(router_logits: jnp.ndarray, top_k: int
                 ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Llama-4 router (HF Llama4Router): top-k on the raw LOGITS, weights =
    sigmoid of the selected logits (no renormalization). The weights scale
    the expert INPUT, not its output — see dense_expert_mix_input_scaled."""
    top_w, ids = jax.lax.top_k(router_logits.astype(jnp.float32), top_k)
    return jax.nn.sigmoid(top_w), ids.astype(jnp.int32)


def route_sparsemixer(router_logits: jnp.ndarray, jitter_eps: float
                      ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """PhiMoE sparsemixer router, inference path (HF modeling_phimoe.py
    sparsemixer; https://huggingface.co/papers/2409.12136): pick the top-2
    experts greedily; each weight is the softmax over the logits that
    survive the relative-gap mask ((max - s)/max(|s|, max) <= 2*eps),
    evaluated at the picked expert. Always top-2."""
    s = router_logits.astype(jnp.float32)
    E = s.shape[-1]

    def pick(sc):
        # sc: candidate logits (already -inf at excluded slots)
        m = jnp.max(sc, axis=-1, keepdims=True)
        e = jnp.argmax(sc, axis=-1)
        factor = jnp.maximum(jnp.abs(s), m)     # |original scores| clamp
        mask = ((m - s) / factor) > (2 * jitter_eps)
        gates = jax.nn.softmax(jnp.where(mask, -jnp.inf, sc), axis=-1)
        w = jnp.take_along_axis(gates, e[:, None], axis=-1)[:, 0]
        return w, e

    w1, e1 = pick(s)
    s2 = jnp.where(jax.nn.one_hot(e1, E, dtype=bool), -jnp.inf, s)
    w2, e2 = pick(s2)
    return (jnp.stack([w1, w2], axis=-1),
            jnp.stack([e1, e2], axis=-1).astype(jnp.int32))


def combine_weights(ids: jnp.ndarray, w: jnp.ndarray, num_experts: int
                    ) -> jnp.ndarray:
    """(ids i32[T, K], weights f32[T, K]) -> dense combine matrix f32[T, E]."""
    T = ids.shape[0]
    combine = jnp.zeros((T, num_experts), jnp.float32)
    return jax.vmap(lambda c, i, v: c.at[i].add(v))(combine, ids, w)


def dense_expert_mix(h: jnp.ndarray, combine: jnp.ndarray,
                     we_gate, we_up, we_down,
                     act: str = "silu") -> jnp.ndarray:
    """All experts on all tokens, combined by [T, E] weights (the
    GSPMD-shardable dense dispatch path)."""
    up = jnp.einsum("th,ehi->eti", h, we_up)
    gate = jnp.einsum("th,ehi->eti", h, we_gate)
    act_fn = jax.nn.gelu if "gelu" in act else jax.nn.silu
    act = act_fn(gate) * up
    out = jnp.einsum("eti,eih->eth", act, we_down)   # [E, T, H]
    return jnp.einsum("eth,te->th", out.astype(jnp.float32),
                      combine).astype(h.dtype)


def dense_expert_mix_input_scaled(h: jnp.ndarray, combine: jnp.ndarray,
                                  we_gate, we_up, we_down) -> jnp.ndarray:
    """Input-scaled variant (Llama-4): each selected expert e sees x * w_e
    and outputs sum unweighted — f(x*w) != w*f(x) through the gated MLP, so
    this cannot reuse the output-combine path."""
    xe = jnp.einsum("te,th->eth", combine, h.astype(jnp.float32)).astype(
        h.dtype)                                   # [E, T, H] scaled inputs
    up = jnp.einsum("eth,ehi->eti", xe, we_up)
    gate = jnp.einsum("eth,ehi->eti", xe, we_gate)
    act = jax.nn.silu(gate) * up
    out = jnp.einsum("eti,eih->eth", act, we_down)  # [E, T, H]
    return jnp.sum(out.astype(jnp.float32), axis=0).astype(h.dtype)


def deepseek_route(
    h: jnp.ndarray,              # [T, H]
    w_router: jnp.ndarray,       # [H, E]
    e_bias,                      # f32[E] | None (V3 noaux_tc correction bias)
    *,
    top_k: int,
    scoring_func: str,           # "softmax" (V2) | "sigmoid" (V3)
    topk_method: str,            # greedy | group_limited_greedy | noaux_tc
    n_group: int,
    topk_group: int,
    norm_topk_prob: bool,
    routed_scaling_factor: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """DeepSeek grouped top-k router (HF DeepseekV2MoEGate /
    DeepseekV3TopkRouter semantics; reference srt/layers/moe/topk.py
    grouped_topk / biased_grouped_topk). Returns (weights [T,K], ids [T,K])."""
    logits = h.astype(jnp.float32) @ w_router.astype(jnp.float32)  # [T, E]
    E = logits.shape[-1]
    if scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    choice = scores + e_bias[None, :] if e_bias is not None else scores
    if topk_method in ("group_limited_greedy", "noaux_tc") and n_group > 1:
        T = choice.shape[0]
        grouped = choice.reshape(T, n_group, E // n_group)
        if topk_method == "noaux_tc":
            # V3: group score = sum of the group's top-2 choices
            top2, _ = jax.lax.top_k(grouped, 2)
            group_scores = top2.sum(axis=-1)
        else:
            group_scores = grouped.max(axis=-1)
        _, gidx = jax.lax.top_k(group_scores, topk_group)      # [T, topk_group]
        gmask = combine_weights(gidx, jnp.ones_like(gidx, jnp.float32), n_group)
        choice = jnp.where(
            (gmask > 0)[:, :, None], grouped, 0.0).reshape(T, E)
    _, ids = jax.lax.top_k(choice, top_k)
    ids = ids.astype(jnp.int32)
    if topk_method == "noaux_tc":
        # weights come from the *unbiased* scores at the chosen experts
        w = jnp.take_along_axis(scores, ids, axis=-1)
    else:
        w = jnp.take_along_axis(choice, ids, axis=-1)
    if norm_topk_prob:
        w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
    return w * routed_scaling_factor, ids


def moe_ep_mix(h: jnp.ndarray, combine: jnp.ndarray,
               we_gate, we_up, we_down, *, mesh, axis="tp"
               ) -> jnp.ndarray:
    """Expert-parallel dispatch: experts sharded over the mesh axis (a
    name, or the ("ep","tp") super-axis of a dedicated-ep mesh), the
    (replicated) activations processed against each shard's LOCAL experts
    only, partial outputs combined with one psum over ICI/DCN.

    This is the TPU re-design of the reference's EPMoE grouped-GEMM +
    all-to-all dispatcher (srt/layers/moe/ep_moe/layer.py:148,
    token_dispatcher.py): with TP-replicated activations no token shuffle
    is needed — the combine matrix is sharded on the expert dim and the
    psum IS the combine-reduce. Compute per chip is E/ep experts.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def shard_fn(h_l, combine_l, wg_l, wu_l, wd_l):
        out = dense_expert_mix(h_l, combine_l, wg_l, wu_l, wd_l)
        return jax.lax.psum(out, axis)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(None, axis), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False,
    )(h, combine, we_gate, we_up, we_down)


def moe_ep_a2a(h: jnp.ndarray, combine_unused, we_gate, we_up, we_down,
               w_router, *, top_k: int, renormalize: bool, mesh,
               axis: str = "tp", capacity_factor: float = 2.0
               ) -> jnp.ndarray:
    """Expert-parallel MoE with all-to-all TOKEN dispatch — the TPU
    re-design of the reference's DeepEP dispatcher
    (srt/layers/moe/ep_moe/token_dispatcher.py:639): activations are
    token-sharded over the mesh axis, each rank routes its own tokens,
    ships (token, expert, weight) copies to the owning rank through
    `lax.all_to_all` over ICI, computes its LOCAL experts, and ships
    results back for a weighted scatter-add.

    Fixed-capacity buffers keep shapes static: each rank sends up to
    C = ceil(Tl*K/G * capacity_factor) copies per destination; overflow
    copies are dropped (the standard capacity-factor trade — exact parity
    with dense dispatch whenever capacity suffices). Compute per rank is
    O(Tl*K*cf) token-rows against E/G local experts, vs O(T) rows against
    E/G experts for the replicated-activation EP path — the win grows
    with the mesh.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    G = mesh.shape[axis]
    E = we_gate.shape[0]
    E_loc = E // G
    K = top_k

    def shard_fn(h_l, wr, wg, wu, wd):
        Tl, H = h_l.shape
        C = -(-(Tl * K) // G)
        C = int(C * capacity_factor)
        w, ids = route_topk(h_l @ wr, K, renormalize)      # [Tl, K]
        flat_e = ids.reshape(-1)                           # [Tl*K]
        dst = flat_e // E_loc
        order = jnp.argsort(dst)                           # stable
        dst_s = dst[order]
        bucket_start = jnp.searchsorted(dst_s, jnp.arange(G, dtype=dst_s.dtype))
        pos = jnp.arange(Tl * K, dtype=jnp.int32) - bucket_start[dst_s]
        src_tok = (order // K).astype(jnp.int32)
        # capacity-bounded send buffers (overflow rows dropped)
        send_x = jnp.zeros((G, C, H), h_l.dtype).at[dst_s, pos].set(
            h_l[src_tok], mode="drop")
        send_e = jnp.full((G, C), -1, jnp.int32).at[dst_s, pos].set(
            (flat_e[order] % E_loc).astype(jnp.int32), mode="drop")
        send_w = jnp.zeros((G, C), jnp.float32).at[dst_s, pos].set(
            w.reshape(-1)[order], mode="drop")
        send_slot = jnp.zeros((G, C), jnp.int32).at[dst_s, pos].set(
            src_tok, mode="drop")

        recv_x = jax.lax.all_to_all(send_x, axis, 0, 0)    # [G, C, H]
        recv_e = jax.lax.all_to_all(send_e, axis, 0, 0)
        recv_w = jax.lax.all_to_all(send_w, axis, 0, 0)

        # local-expert compute on the received copies
        x = recv_x.reshape(G * C, H)
        e_loc = recv_e.reshape(-1)
        wt = recv_w.reshape(-1)
        combine = jnp.zeros((G * C, E_loc), jnp.float32).at[
            jnp.arange(G * C), e_loc].set(wt, mode="drop")  # -1 dropped
        y = dense_expert_mix(x, combine, wg, wu, wd)        # [G*C, H]

        back = jax.lax.all_to_all(y.reshape(G, C, H), axis, 0, 0)
        out = jnp.zeros((Tl, H), jnp.float32).at[
            send_slot.reshape(-1)].add(
            back.reshape(G * C, H).astype(jnp.float32))
        return out.astype(h_l.dtype)

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(axis), P(), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
        check_rep=False,
    )(h, w_router, we_gate, we_up, we_down)


def moe_dense(h: jnp.ndarray, w_router, we_gate, we_up, we_down,
              top_k: int, renormalize: bool) -> jnp.ndarray:
    """Dense-dispatch MoE: [T, H] -> [T, H]."""
    E = we_gate.shape[0]
    router_logits = h @ w_router                     # [T, E]
    w, ids = route_topk(router_logits, top_k, renormalize)
    combine = combine_weights(ids, w, E)             # [T, E]
    return dense_expert_mix(h, combine, we_gate, we_up, we_down)


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


def remap_combine(combine: jnp.ndarray, expert_map: jnp.ndarray,
                  expert_scale: jnp.ndarray) -> jnp.ndarray:
    """EPLB live relocation (reference eplb/expert_location_updater.py):
    combine [T, E_logical] -> [T, P] over PHYSICAL expert slots; slot p
    serves logical expert expert_map[p] with weight split 1/replicas
    (expert_scale) — mathematically identical output, balanced ranks."""
    return (combine[:, expert_map]
            * expert_scale[None].astype(combine.dtype))


def moe_block(h, w_router, we_gate, we_up, we_down, *, top_k: int,
              renormalize: bool, impl: str, mesh=None, axis="tp",
              return_combine: bool = False, capacity_factor: float = 2.0,
              expert_map=None, expert_scale=None):
    """When return_combine: also returns the dense combine matrix [T, E]
    (nonzero = expert selected) — the EPLB expert-distribution tap.
    expert_map/expert_scale: EPLB physical-slot relocation (the stacks are
    then PHYSICAL [P, ...]; routing stays over logical experts)."""
    E = w_router.shape[-1]       # logical experts (routing width)
    remapped = expert_map is not None
    if impl == "gmm" and not return_combine and not remapped:
        return moe_gmm(h, w_router, we_gate, we_up, we_down,
                       top_k, renormalize)
    if impl == "ep_a2a" and not return_combine and not remapped:
        assert isinstance(axis, str), \
            "a2a dispatch needs a single mesh axis; dedicated-ep meshes " \
            "use the psum-combine EP path"
        return moe_ep_a2a(h, None, we_gate, we_up, we_down, w_router,
                          top_k=top_k, renormalize=renormalize, mesh=mesh,
                          axis=axis, capacity_factor=capacity_factor)
    w, ids = route_topk(h @ w_router, top_k, renormalize)
    combine = combine_weights(ids, w, E)
    mix = remap_combine(combine, expert_map, expert_scale) if remapped \
        else combine
    if impl in ("ep", "ep_a2a"):
        out = moe_ep_mix(h, mix, we_gate, we_up, we_down, mesh=mesh,
                         axis=axis)
    else:
        out = dense_expert_mix(h, mix, we_gate, we_up, we_down)
    return (out, combine) if return_combine else out
