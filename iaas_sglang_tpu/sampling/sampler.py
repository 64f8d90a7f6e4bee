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

from iaas_sglang_tpu.model_executor.forward_batch import SamplingMetadata

NEG_INF = -1e30


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
