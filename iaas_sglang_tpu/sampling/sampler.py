"""Token sampling on device (analog of sglang layers/sampler.py:29).

Exact top-k / top-p / min-p via a single descending sort of the probability
vector — the TPU-friendly formulation (one XLA sort, no data-dependent
shapes). Greedy rows take a pure argmax. Randomness is a counter-based
fold-in of (per-request seed, decode step), so sampling is reproducible
per request regardless of batch composition.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.model_executor.forward_batch import (
    PenaltyMetadata,
    SamplingMetadata,
)

NEG_INF = -1e30


def output_token_counts(pen: PenaltyMetadata, V: int) -> jnp.ndarray:
    """f32[B, V] per-token output counts from the padded history (the
    penalty state; multi-step decode carries and updates this on device)."""
    B = pen.output_ids.shape[0]
    valid = pen.output_ids >= 0                         # [B, L]
    safe_ids = jnp.where(valid, pen.output_ids, 0)
    ones = valid.astype(jnp.float32)
    counts = jnp.zeros((B, V), jnp.float32)
    # the scatter may hit token 0 from padding lanes with add(0): fine
    return jax.vmap(lambda c, i, o: c.at[i].add(o))(counts, safe_ids, ones)


def apply_penalties(logits: jnp.ndarray, pen: PenaltyMetadata) -> jnp.ndarray:
    """Frequency / presence / repetition penalties + disallow mask + logit
    bias (analog of sampling/penaltylib/orchestrator.py + Sampler's logit
    bias application). Applied to OUTPUT tokens (vLLM/sglang convention)."""
    return apply_penalties_with_counts(
        logits, pen, output_token_counts(pen, logits.shape[1]))


def apply_penalties_with_counts(logits: jnp.ndarray, pen: PenaltyMetadata,
                                counts: jnp.ndarray,
                                step=0) -> jnp.ndarray:
    """Penalty application against an explicit count state [B, V].

    `step` (static or traced i32): decode steps already taken THIS
    dispatch — the min_new_tokens disallow mask stays active only while
    step < pen.min_remaining, so a chain can cross the boundary
    in-program (no host-side mask flip needed mid-chain)."""
    B, V = logits.shape
    logits = logits - pen.frequency_penalties[:, None] * counts
    logits = logits - pen.presence_penalties[:, None] * (counts > 0)
    rep = pen.repetition_penalties[:, None]
    appeared = counts > 0
    logits = jnp.where(
        appeared,
        jnp.where(logits > 0, logits / rep, logits * rep),
        logits,
    )
    # logit bias
    bias_valid = pen.bias_ids >= 0
    bias_safe = jnp.where(bias_valid, pen.bias_ids, 0)
    bias = jnp.zeros((B, V), jnp.float32)
    bias = jax.vmap(lambda b, i, v: b.at[i].add(v))(
        bias, bias_safe, jnp.where(bias_valid, pen.bias_values, 0.0))
    logits = logits + bias
    # hard-disallowed tokens (min_new_tokens EOS masking etc.)
    dis_valid = pen.disallow_ids >= 0
    if pen.min_remaining is not None:
        dis_valid &= (pen.min_remaining > step)[:, None]
    dis_safe = jnp.where(dis_valid, pen.disallow_ids, 0)
    mask = jnp.zeros((B, V), jnp.bool_)
    mask = jax.vmap(lambda m, i, o: m.at[i].set(o))(mask, dis_safe, dis_valid)
    return jnp.where(mask, NEG_INF, logits)


def apply_grammar_mask(logits: jnp.ndarray, packed: jnp.ndarray) -> jnp.ndarray:
    """packed: uint8[B, ceil(V/8)] little-bit-order vocab bitmask; 1 = allowed
    (TPU analog of sgl-kernel apply_token_bitmask_inplace_cuda)."""
    B, V = logits.shape
    idx = jnp.arange(V, dtype=jnp.int32)
    bytes_ = jnp.take_along_axis(
        packed, jnp.broadcast_to(idx[None, :] >> 3, (B, V)), axis=1)
    bits = (bytes_ >> (idx[None, :] & 7).astype(jnp.uint8)) & 1
    return jnp.where(bits == 1, logits, NEG_INF)


def compute_logprobs(logits: jnp.ndarray, tokens: jnp.ndarray,
                     top_k: int = 0):
    """log-softmax logprob of the chosen tokens (+ optional top-k table)
    (analog of layers/logits_processor.py logprob paths)."""
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    chosen = jnp.take_along_axis(
        logprobs, tokens[:, None].astype(jnp.int32), axis=-1)[:, 0]
    if top_k > 0:
        top_vals, top_ids = jax.lax.top_k(logprobs, top_k)
        return chosen, top_vals, top_ids
    return chosen, None, None


def sample_tokens(
    logits: jnp.ndarray,          # f32[B, V]
    meta: SamplingMetadata,
) -> jnp.ndarray:                 # i32[B]
    B, V = logits.shape
    greedy = meta.temperatures < 1e-5
    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temps = jnp.maximum(meta.temperatures, 1e-5)[:, None]
    scaled = logits / temps
    probs = jax.nn.softmax(scaled, axis=-1)

    # one sort serves top-k, top-p and min-p
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]          # desc [B, V]
    cumsum = jnp.cumsum(sorted_probs, axis=-1)
    # rank of each vocab entry (0 = most probable). Ties broken consistently
    # by using the threshold value.
    # top-p: smallest set whose cumulative prob >= top_p
    keep_sorted = cumsum - sorted_probs < meta.top_ps[:, None]
    # top-k: ranks < k (k == -1 -> all)
    ranks = jnp.arange(V, dtype=jnp.int32)[None, :]
    ks = jnp.where(meta.top_ks <= 0, V, meta.top_ks)[:, None]
    keep_sorted &= ranks < ks
    # min-p: prob >= min_p * max_prob
    pmax = sorted_probs[:, :1]
    keep_sorted &= sorted_probs >= meta.min_ps[:, None] * pmax
    # threshold = smallest kept probability
    thresh = jnp.min(
        jnp.where(keep_sorted, sorted_probs, jnp.inf), axis=-1, keepdims=True
    )
    masked_logits = jnp.where(probs >= thresh, scaled, NEG_INF)

    # counter-based per-request randomness
    def row_key(seed, step):
        k = jax.random.key(seed)
        return jax.random.fold_in(k, step)

    keys = jax.vmap(row_key)(meta.seeds, meta.steps)
    sampled = jax.vmap(lambda k, lg: jax.random.categorical(k, lg))(
        keys, masked_logits
    ).astype(jnp.int32)

    return jnp.where(greedy, greedy_tokens, sampled)
