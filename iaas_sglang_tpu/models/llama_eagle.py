"""EAGLE draft model (Llama-style, 1 decoder layer).

TPU re-design of the reference's LlamaForCausalLMEagle
(srt/models/llama_eagle.py, EAGLE cnets.py): the draft consumes
(token, target-feature) PAIRS — x = fc([embed(token); feature]) — runs one
Llama decoder layer whose layer-0 input_layernorm is removed, and emits
hidden states scored by the TARGET's lm_head (no final norm).

The draft keeps its own small paged KV space (1 layer) addressed by
(page, position) slots, so speculative chain writes need no rollback —
identical to the target's KV discipline.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.layers.rotary import apply_rope, compute_inv_freq
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.ops.attention import paged_attention, write_kv_pages


class LlamaEagleDraft:
    """Functional EAGLE-1 draft. Weight keys follow the HF EAGLE layout
    ('model.' prefix; checkpoints without it are normalized by the loader
    wrapper in the EagleWorker)."""

    def __init__(self, config: ModelConfig):
        # config geometry mirrors the TARGET model (EAGLE requirement)
        self.config = config
        c = config
        self.inv_freq = jnp.asarray(
            compute_inv_freq(c.head_dim, c.rope_theta, c.rope_scaling))
        self.sm_scale = c.head_dim ** -0.5

    def kv_entry_shape(self) -> tuple[int, int]:
        return (2 * self.config.num_kv_heads, self.config.head_dim)

    def kv_shard_dims(self) -> tuple:
        return (None, None, "tp", None)

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H, D = c.hidden_size, c.head_dim
        Nq, Nk, I = c.num_heads, c.num_kv_heads, c.intermediate_size
        out = {
            "fc_w": WeightSpec((2 * H, H), (None, None), "model.fc.weight",
                               transpose=True),
            "fc_b": WeightSpec((H,), (None,), "model.fc.bias"),
            "wq": WeightSpec((H, Nq * D), (None, "tp"),
                             "model.layers.0.self_attn.q_proj.weight",
                             transpose=True),
            "wk": WeightSpec((H, Nk * D), (None, "tp"),
                             "model.layers.0.self_attn.k_proj.weight",
                             transpose=True),
            "wv": WeightSpec((H, Nk * D), (None, "tp"),
                             "model.layers.0.self_attn.v_proj.weight",
                             transpose=True),
            "wo": WeightSpec((Nq * D, H), ("tp", None),
                             "model.layers.0.self_attn.o_proj.weight",
                             transpose=True),
            "post_norm": WeightSpec(
                (H,), (None,),
                "model.layers.0.post_attention_layernorm.weight"),
            "w_gate": WeightSpec((H, I), (None, "tp"),
                                 "model.layers.0.mlp.gate_proj.weight",
                                 transpose=True),
            "w_up": WeightSpec((H, I), (None, "tp"),
                               "model.layers.0.mlp.up_proj.weight",
                               transpose=True),
            "w_down": WeightSpec((I, H), ("tp", None),
                                 "model.layers.0.mlp.down_proj.weight",
                                 transpose=True),
        }
        if c.attention_bias:
            # qwen2-family EAGLE drafts (reference models/qwen2_eagle.py)
            for nm, n_out, p_ in [("bq", Nq * D, "q"), ("bk", Nk * D, "k"),
                                  ("bv", Nk * D, "v")]:
                out[nm] = WeightSpec(
                    (n_out,), ("tp",),
                    f"model.layers.0.self_attn.{p_}_proj.bias",
                    optional=True)
        return out

    def forward_pairs(
        self,
        params: dict[str, Any],
        embed: jnp.ndarray,        # target embedding table [V, H]
        tokens: jnp.ndarray,       # i32[T]
        feats: jnp.ndarray,        # [T, H] paired features
        positions: jnp.ndarray,    # i32[T] draft positions (pair index)
        out_slots: jnp.ndarray,    # i32[T]
        kv_pages: jnp.ndarray,     # [P+1, ps, 2Nk, D] (single layer)
        page_indices: jnp.ndarray, # i32[B, MP]
        kv_lens: jnp.ndarray,      # i32[B] pairs incl. new
        cu_q_lens: jnp.ndarray,    # i32[B+1]
        num_seqs: jnp.ndarray,
        *,
        attn_backend: str,
        attn_mode: str,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """One ragged pair-extend; returns (hidden_out [T, H], kv_pages)."""
        c = self.config
        T = tokens.shape[0]
        x = jnp.concatenate([embed[tokens], feats.astype(embed.dtype)],
                            axis=-1)
        h = x @ params["fc_w"] + params["fc_b"]      # [T, H]
        # layer 0: input_layernorm removed (EAGLE cnets.py)
        q, k, v = h @ params["wq"], h @ params["wk"], h @ params["wv"]
        if "bq" in params:   # qwen2-family drafts carry qkv bias
            q, k, v = q + params["bq"], k + params["bk"], v + params["bv"]
        q = q.reshape(T, c.num_heads, c.head_dim)
        k = k.reshape(T, c.num_kv_heads, c.head_dim)
        v = v.reshape(T, c.num_kv_heads, c.head_dim)
        q, k = apply_rope(q, k, positions, self.inv_freq)
        kv_pages = write_kv_pages(kv_pages, out_slots, k, v)
        attn = paged_attention(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=self.sm_scale, backend=attn_backend, mode=attn_mode)
        hidden = h + (attn.reshape(T, -1) @ params["wo"])
        h2 = rms_norm(hidden, params["post_norm"], c.rms_norm_eps)
        mlp = (jax.nn.silu(h2 @ params["w_gate"]) * (h2 @ params["w_up"])) \
            @ params["w_down"]
        # EAGLE output = hidden + residual, scored directly by lm_head
        return hidden + mlp, kv_pages
