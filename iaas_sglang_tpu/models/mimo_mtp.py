"""MiMo MTP speculative draft (reference srt/models/mimo_mtp.py:
MiMoMultiTokenPredictorLayer).

Same pair-fed MTP pattern as DeepSeek NextN but with a Qwen2 decoder
block and the combine order flipped:

    x = input_proj([hidden_layernorm(feature) ; token_layernorm(embed)])

with the token embedding ZEROED at position 0, then one full Qwen2 layer
and a final_layernorm; logits come from the target's lm_head. Checkpoint
keys live under `model.mtp_layers.0.` (mtp_block sub-names flattened).
"""

from __future__ import annotations

import copy
from typing import Any

import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.model_executor.forward_batch import ForwardBatch
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)

_PRE = "model.mtp_layers.{l}."


class MiMoMTPDraft:
    """Functional MiMo MTP draft with the EAGLE forward_pairs interface."""

    def __init__(self, config: ModelConfig):
        self.config = config
        cfg1 = copy.deepcopy(config)
        cfg1.num_layers = 1
        self.inner = LlamaFamilyForCausalLM(cfg1)

    def kv_entry_shape(self) -> tuple[int, int]:
        return self.inner.kv_entry_shape()

    def kv_shard_dims(self) -> tuple:
        return self.inner.kv_shard_dims()

    @property
    def mesh(self):
        return self.inner.mesh

    @mesh.setter
    def mesh(self, v):
        self.inner.mesh = v

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H = c.hidden_size
        specs = {}
        for name, spec in self.inner.weight_specs().items():
            if name in ("embed", "lm_head"):
                continue   # shared with the target model
            if spec.hf_key is not None:
                spec.hf_key = spec.hf_key.replace(
                    "model.layers.{l}.", _PRE)
            if name == "final_norm":
                spec.hf_key = _PRE.format(l=0) + "final_layernorm.weight"
            specs[name] = spec
        p0 = _PRE.format(l=0)
        specs["token_norm"] = WeightSpec(
            (H,), (None,), p0 + "token_layernorm.weight")
        specs["hidden_norm"] = WeightSpec(
            (H,), (None,), p0 + "hidden_layernorm.weight")
        specs["input_proj"] = WeightSpec(
            (2 * H, H), (None, None), p0 + "input_proj.weight",
            transpose=True)
        return specs

    def forward_pairs(
        self,
        params: dict[str, Any],
        embed: jnp.ndarray,
        tokens: jnp.ndarray,
        feats: jnp.ndarray,
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
        c = self.config
        e = embed[tokens].astype(jnp.float32)
        # MTP masks the token embedding at position 0 (mimo_mtp.py:60)
        e = jnp.where((positions == 0)[:, None], 0.0, e)
        e = rms_norm(e, params["token_norm"], c.rms_norm_eps)
        h = rms_norm(feats.astype(jnp.float32),
                     params["hidden_norm"], c.rms_norm_eps)
        x = (jnp.concatenate([h, e], axis=-1)
             @ params["input_proj"].astype(jnp.float32)).astype(embed.dtype)
        B = page_indices.shape[0]
        fb = ForwardBatch(
            input_ids=tokens, positions=positions, out_slots=out_slots,
            page_indices=page_indices, kv_lens=kv_lens,
            cu_q_lens=cu_q_lens, num_seqs=num_seqs,
            last_token_idx=jnp.zeros((B,), jnp.int32),
        )
        hidden, kv_pages = self.inner.forward(
            params, fb, kv_pages, attn_backend=attn_backend,
            attn_mode=attn_mode, hidden_in=x, apply_final_norm=True)
        return hidden, kv_pages
