"""DeepSeek NextN (MTP) speculative draft (reference
srt/models/deepseek_nextn.py: DeepseekModelNextN).

The MTP head is ONE full DeepSeek decoder layer (MLA attention +
DeepSeekMoE) fed EAGLE-style pairs:

    x = eh_proj([enorm(embed(token)) ; hnorm(target_feature)])

followed by `shared_head.norm`; logits come from the TARGET's lm_head.
In DeepSeek-V3 checkpoints the MTP weights live at layer index
`num_hidden_layers` (61), with enorm/hnorm/eh_proj/shared_head.norm under
the same layer prefix (reference deepseek_v2.py:2340 load_weights
is_nextn); standalone 1-layer exports use layer 0.

It plugs into the EagleWorker via the same `forward_pairs` interface as
the Llama EAGLE draft — the whole drafting chain stays one jitted
program; the draft owns a single-layer compressed-latent paged KV space.
"""

from __future__ import annotations

import copy
from typing import Any

import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.model_executor.forward_batch import (
    ForwardBatch,
    ForwardMode,
)
from iaas_sglang_tpu.models.deepseek_family import DeepseekFamilyForCausalLM
from iaas_sglang_tpu.models.llama_family import WeightSpec


class DeepseekNextNDraft:
    """Functional NextN draft with the EAGLE forward_pairs interface."""

    def __init__(self, config: ModelConfig):
        # config arrives with num_layers forced to 1 (EagleWorker) and
        # `nextn_layer_id` recording where the weights sit in the ckpt
        self.config = config
        cfg1 = copy.deepcopy(config)
        cfg1.num_layers = 1
        # the NextN layer is sparse whenever the model has routed experts
        # (deepseek_v2.py _is_layer_sparse(is_nextn=True))
        cfg1.first_k_dense_replace = 0
        self.inner = DeepseekFamilyForCausalLM(cfg1)
        self.nextn_layer_id = getattr(config, "nextn_layer_id", 0)

    # geometry delegates (MLA compressed-latent KV entries)
    def kv_entry_shape(self) -> tuple[int, int]:
        return self.inner.kv_entry_shape()

    def kv_shard_dims(self) -> tuple:
        return self.inner.kv_shard_dims()

    @property
    def moe_impl(self):
        return self.inner.moe_impl

    @moe_impl.setter
    def moe_impl(self, v):
        self.inner.moe_impl = v

    @property
    def mesh(self):
        return self.inner.mesh

    @mesh.setter
    def mesh(self, v):
        self.inner.mesh = v

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H = c.hidden_size
        nid = self.nextn_layer_id
        lp = f"model.layers.{nid}."
        specs = {}
        for name, spec in self.inner.weight_specs().items():
            if name in ("embed", "lm_head"):
                continue   # shared with the target model
            if name == "final_norm":
                spec.hf_key = lp + "shared_head.norm.weight"
            elif spec.stacked:
                # single-layer stacks: hf layer index = nextn layer id
                spec.layer_offset = nid
            specs[name] = spec
        specs["enorm"] = WeightSpec((H,), (None,), lp + "enorm.weight")
        specs["hnorm"] = WeightSpec((H,), (None,), lp + "hnorm.weight")
        specs["eh_proj"] = WeightSpec(
            (2 * H, H), (None, None), lp + "eh_proj.weight", transpose=True)
        return specs

    def forward_pairs(
        self,
        params: dict[str, Any],
        embed: jnp.ndarray,        # target embedding table [V, H]
        tokens: jnp.ndarray,       # i32[T]
        feats: jnp.ndarray,        # [T, H] paired target features
        positions: jnp.ndarray,    # i32[T]
        out_slots: jnp.ndarray,    # i32[T]
        kv_pages: jnp.ndarray,     # [P+1, ps, 1, Dk] single-layer MLA pool
        page_indices: jnp.ndarray,
        kv_lens: jnp.ndarray,
        cu_q_lens: jnp.ndarray,
        num_seqs: jnp.ndarray,
        *,
        attn_backend: str,
        attn_mode: str,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        e = rms_norm(embed[tokens].astype(jnp.float32),
                     params["enorm"], c.rms_norm_eps)
        h = rms_norm(feats.astype(jnp.float32),
                     params["hnorm"], c.rms_norm_eps)
        x = (jnp.concatenate([e, h], axis=-1)
             @ params["eh_proj"].astype(jnp.float32)).astype(embed.dtype)
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
