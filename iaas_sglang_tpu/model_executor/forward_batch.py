"""Device-side batch metadata (analog of sglang
model_executor/forward_batch_info.py:61,151 ForwardMode / ForwardBatch).

All arrays are statically shaped per compile bucket: T (padded token count),
Bmax (padded sequence count), MP (padded pages-per-seq). The scheduler pads
with garbage-page slots so every lane is safe to execute — the TPU analog
of padded CUDA-graph replay (cuda_graph_runner.py:203).
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
from flax import struct


class ForwardMode(enum.IntEnum):
    EXTEND = 1   # prefill or chunked continuation (ragged q lens)
    DECODE = 2   # one new token per running sequence
    IDLE = 3     # lockstep no-op batch (DP attention, later milestone)

    def is_extend(self) -> bool:
        return self == ForwardMode.EXTEND

    def is_decode(self) -> bool:
        return self == ForwardMode.DECODE


@struct.dataclass
class ForwardBatch:
    """Pytree of device arrays passed into the compiled step function."""

    input_ids: jnp.ndarray      # i32[T]
    positions: jnp.ndarray      # i32[T]
    out_slots: jnp.ndarray      # i32[T]  per-layer-relative kv slot (page*ps+off)
    page_indices: jnp.ndarray   # i32[Bmax, MP] per-layer-relative page ids
    kv_lens: jnp.ndarray        # i32[Bmax] total tokens per seq incl. new
    cu_q_lens: jnp.ndarray      # i32[Bmax+1]
    num_seqs: jnp.ndarray       # i32[] number of real sequences
    last_token_idx: jnp.ndarray # i32[Bmax] index into [0,T) of seq's last token
    # speculative verify: token indices of each seq's K+1 query positions
    verify_idx: jnp.ndarray = None  # i32[Bmax, K+1] | None
    # speculative TREE verify (EAGLE topk>1): per-row ancestor bitmask over
    # the verify segment; None = chain (causal) verify
    tree_bits: jnp.ndarray = None   # i32[Bmax, 32] | None
    # KV slot canonicalization: accepted tree rows from the PREVIOUS verify
    # step are moved src->dst (layer-relative slots) before this forward
    move_src: jnp.ndarray = None    # i32[M] | None
    move_dst: jnp.ndarray = None    # i32[M] | None
    # multi-LoRA: per-token adapter slot (0 = none) | None when LoRA unused
    lora_ids: jnp.ndarray = None    # i32[T] | None
    # prompt logprobs: per-row target token (the NEXT prompt token) | None
    lp_targets: jnp.ndarray = None  # i32[T] | None
    # multimodal: projected image-embedding rows scattered over the
    # image-placeholder token positions (pad position = T -> dropped)
    mm_embeds: jnp.ndarray = None    # [Tm, H] | None
    mm_positions: jnp.ndarray = None  # i32[Tm] | None
    # MRope (Qwen2-VL): 3D (t, h, w) rope positions; None = standard rope
    mrope_positions: jnp.ndarray = None  # i32[3, T] | None
    # cross-attention (Mllama): per-TOKEN encoder lengths and page tables
    # into the cross layers' page-space slices (0 / garbage for sequences
    # without an image); None on non-cross-attention models
    enc_lens: jnp.ndarray = None         # i32[T] | None
    enc_page_indices: jnp.ndarray = None  # i32[T, EP] | None


@struct.dataclass
class SamplingMetadata:
    """Per-sequence sampling tensors (analog of
    sampling/sampling_batch_info.py:22)."""

    temperatures: jnp.ndarray   # f32[Bmax]
    top_ks: jnp.ndarray         # i32[Bmax]  (-1 = all)
    top_ps: jnp.ndarray         # f32[Bmax]
    min_ps: jnp.ndarray         # f32[Bmax]
    seeds: jnp.ndarray          # u32[Bmax] per-request fold-in seeds
    steps: jnp.ndarray          # i32[Bmax] decode step per request (rng stream)


@struct.dataclass
class PenaltyMetadata:
    """Optional penalty tensors (analog of sampling/penaltylib/) — only
    materialized (and only compiled in) when some request in the batch uses
    penalties; the common penalty-free batch pays nothing."""

    output_ids: jnp.ndarray     # i32[Bmax, L] generated-so-far, -1 padded
    frequency_penalties: jnp.ndarray   # f32[Bmax]
    presence_penalties: jnp.ndarray    # f32[Bmax]
    repetition_penalties: jnp.ndarray  # f32[Bmax] (1.0 = off)
    disallow_ids: jnp.ndarray   # i32[Bmax, K] tokens masked to -inf, -1 padded
    bias_ids: jnp.ndarray       # i32[Bmax, Kb] logit-bias tokens, -1 padded
    bias_values: jnp.ndarray    # f32[Bmax, Kb]
    # steps (from this dispatch) during which disallow_ids stay masked:
    # min_new_tokens boundaries flip IN-PROGRAM at step == min_remaining,
    # so chains spanning the boundary stay eligible (VERDICT r3 #4)
    min_remaining: jnp.ndarray = None  # i32[Bmax]
