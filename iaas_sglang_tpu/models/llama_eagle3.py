"""EAGLE3 draft model (Llama-style, 1 decoder layer).

TPU re-design of the reference's LlamaForCausalLMEagle3
(srt/models/llama_eagle3.py, EAGLE cnets.py): differences vs EAGLE-1:

  * The target feature is the CONCAT of three intermediate layer inputs
    (hidden+residual entering layers [2, L//2, L-3] by default) — [T, 3*Ht].
    An `fc` maps 3*Ht -> H, applied only when the feature width differs
    from H (chain steps feed the draft's own H-wide pre-norm hidden back).
  * The decoder layer normalizes embeds (input_layernorm) and the feature
    (hidden_norm) SEPARATELY, concatenates to 2H, and runs qkv projections
    with input width 2H. The residual stream is the (fc-ed) feature.
  * The draft has its OWN embedding (target vocab) and its OWN lm_head
    over a reduced `draft_vocab_size`; checkpoint tensor `d2t` stores the
    draft-index -> target-id OFFSETS (target_id = i + d2t[i],
    reference llama_eagle3.py:216 hot_token_id).
  * Logits are computed from norm(hidden+residual); the PRE-norm value is
    the feature chained into the next draft step
    (reference llama_eagle3.py:160-166).
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


def _alts(key: str) -> str:
    # EAGLE3 exports ship keys both bare and under "model."
    return f"model.{key}|{key}"


class LlamaEagle3Draft:
    own_embed = True   # draft embeds tokens itself (not the target table)
    own_head = True    # draft scores with its own reduced-vocab lm_head

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = c.hf_config or {}
        self.target_hidden = hf.get("target_hidden_size", c.hidden_size)
        self.draft_vocab = hf.get("draft_vocab_size", c.vocab_size)
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
        Ht, Vd = self.target_hidden, self.draft_vocab
        mid = "midlayer."
        out = {
            "embed": WeightSpec((c.vocab_size, H), (None, None),
                                _alts("embed_tokens.weight")),
            "fc_w": WeightSpec((3 * Ht, H), (None, None),
                               _alts("fc.weight"), transpose=True),
            "input_norm": WeightSpec(
                (H,), (None,), _alts(mid + "input_layernorm.weight")),
            "hidden_norm": WeightSpec(
                (H,), (None,), _alts(mid + "hidden_norm.weight")),
            "wq": WeightSpec((2 * H, Nq * D), (None, "tp"),
                             _alts(mid + "self_attn.q_proj.weight"),
                             transpose=True),
            "wk": WeightSpec((2 * H, Nk * D), (None, "tp"),
                             _alts(mid + "self_attn.k_proj.weight"),
                             transpose=True),
            "wv": WeightSpec((2 * H, Nk * D), (None, "tp"),
                             _alts(mid + "self_attn.v_proj.weight"),
                             transpose=True),
            "wo": WeightSpec((Nq * D, H), ("tp", None),
                             _alts(mid + "self_attn.o_proj.weight"),
                             transpose=True),
            "post_norm": WeightSpec(
                (H,), (None,),
                _alts(mid + "post_attention_layernorm.weight")),
            "w_gate": WeightSpec((H, I), (None, "tp"),
                                 _alts(mid + "mlp.gate_proj.weight"),
                                 transpose=True),
            "w_up": WeightSpec((H, I), (None, "tp"),
                               _alts(mid + "mlp.up_proj.weight"),
                               transpose=True),
            "w_down": WeightSpec((I, H), ("tp", None),
                                 _alts(mid + "mlp.down_proj.weight"),
                                 transpose=True),
            "final_norm": WeightSpec((H,), (None,), _alts("norm.weight")),
            # d2t offsets; absent (or draft_vocab == vocab) => identity
            # mapping (default-init zeros)
            "d2t": WeightSpec((Vd,), (None,), _alts("d2t"),
                              optional=True, force_dtype="int32"),
        }
        if c.tie_word_embeddings:
            # Llama-3.2-1B-style drafts tie head to the draft embedding
            assert Vd == c.vocab_size, \
                "tied EAGLE3 head requires draft_vocab == vocab"
        else:
            out["lm_head"] = WeightSpec(
                (H, Vd), (None, "tp"), "lm_head.weight", transpose=True)
        return out

    def head_logits(self, params: dict[str, Any],
                    hidden: jnp.ndarray) -> jnp.ndarray:
        """Pre-norm hidden -> draft-vocab logits (f32)."""
        h = rms_norm(hidden, params["final_norm"], self.config.rms_norm_eps)
        w = (params["embed"].T if self.config.tie_word_embeddings
             else params["lm_head"])
        return h.astype(jnp.float32) @ w.astype(jnp.float32)

    def map_tokens(self, params: dict[str, Any],
                   tok: jnp.ndarray) -> jnp.ndarray:
        """draft-vocab index -> target token id via the d2t offsets."""
        return tok + params["d2t"][tok]

    def forward_pairs(
        self,
        params: dict[str, Any],
        embed: jnp.ndarray,        # target embedding table (UNUSED: own)
        tokens: jnp.ndarray,       # i32[T] target-vocab token ids
        feats: jnp.ndarray,        # [T, 3*Ht] aux concat | [T, H] chained
        positions: jnp.ndarray,
        out_slots: jnp.ndarray,
        kv_pages: jnp.ndarray,
        page_indices: jnp.ndarray,
        kv_lens: jnp.ndarray,
        cu_q_lens: jnp.ndarray,
        num_seqs: jnp.ndarray,
        *,
        attn_backend: str,
        attn_mode: str,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (pre-norm hidden_out [T, H], kv_pages); score with
        head_logits()."""
        c = self.config
        T = tokens.shape[0]
        eps = c.rms_norm_eps
        e = params["embed"][tokens]
        f = feats.astype(e.dtype)
        if f.shape[-1] != c.hidden_size:
            f = f @ params["fc_w"]
        residual = f
        x = jnp.concatenate([rms_norm(e, params["input_norm"], eps),
                             rms_norm(f, params["hidden_norm"], eps)],
                            axis=-1)                      # [T, 2H]
        q = (x @ params["wq"]).reshape(T, c.num_heads, c.head_dim)
        k = (x @ params["wk"]).reshape(T, c.num_kv_heads, c.head_dim)
        v = (x @ params["wv"]).reshape(T, c.num_kv_heads, c.head_dim)
        q, k = apply_rope(q, k, positions, self.inv_freq)
        kv_pages = write_kv_pages(kv_pages, out_slots, k, v)
        attn = paged_attention(
            q, kv_pages, kv_lens, page_indices, cu_q_lens, num_seqs,
            sm_scale=self.sm_scale, backend=attn_backend, mode=attn_mode)
        res2 = residual + attn.reshape(T, -1) @ params["wo"]
        h2 = rms_norm(res2, params["post_norm"], eps)
        mlp = (jax.nn.silu(h2 @ params["w_gate"]) * (h2 @ params["w_up"])) \
            @ params["w_down"]
        # pre-norm output: chained as the next step's feature; the caller
        # norms it (head_logits) for scoring
        return res2 + mlp, kv_pages
