"""Gemma3 multimodal (reference: srt/models/gemma3_mm.py + siglip.py).

Composition over the functional Gemma3 text LM: a SigLIP vision tower and
the Gemma3 projector (4x4 average pool over the patch grid -> Gemma3-style
RMSNorm -> linear into text space) produce `mm_tokens_per_image` embedding
rows per image, scattered over the image-placeholder positions exactly
like LLaVA. Attention over image rows stays causal — the reference's
`prepare_attn_masks` (bidirectional image mask) has no callers in its
serving path, so parity is with the reference, not with HF's training
mask.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import (SiglipVisionConfig, clip_patchify,
                                            siglip_encode,
                                            siglip_vision_specs)

_LM_PREFIXES = ("model.language_model.", "language_model.model.")
_VT_PREFIX = ("model.vision_tower.vision_model."
              "|vision_tower.vision_model.")
_PROJ_PREFIXES = ("model.multi_modal_projector.", "multi_modal_projector.")


class Gemma3MMForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.vc = SiglipVisionConfig(config.vision_config)
        hf = config.hf_config
        self.mm_tokens = hf.get("mm_tokens_per_image", 256)
        tokens_per_side = int(self.mm_tokens ** 0.5)
        self.pool_k = self.vc.grid // tokens_per_side

    @property
    def mesh(self):
        return self.lm.mesh

    @mesh.setter
    def mesh(self, v):
        self.lm.mesh = v

    @property
    def moe_impl(self):
        return self.lm.moe_impl

    @moe_impl.setter
    def moe_impl(self, v):
        self.lm.moe_impl = v

    def kv_entry_shape(self):
        return self.lm.kv_entry_shape()

    def kv_shard_dims(self):
        return self.lm.kv_shard_dims()

    def num_image_tokens(self) -> int:
        return self.mm_tokens

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                if key.startswith("model."):
                    key = "|".join(p + key[len("model."):]
                                   for p in _LM_PREFIXES)
                elif key == "lm_head.weight":
                    key = "lm_head.weight|language_model.lm_head.weight"
            s[name] = dataclasses.replace(spec, hf_key=key)
        s.update(siglip_vision_specs(self.vc, _VT_PREFIX))
        Hv, Hl = self.vc.hidden_size, self.config.hidden_size

        def pk(suffix):
            return "|".join(p + suffix for p in _PROJ_PREFIXES)

        # mm_input_projection_weight is a raw [Hv, Hl] parameter (applied
        # untransposed, Gemma3MultiModalProjector)
        s["mm.proj_w"] = WeightSpec((Hv, Hl), (None, None),
                                    pk("mm_input_projection_weight"))
        s["mm.soft_emb_norm"] = WeightSpec(
            (Hv,), (None,), pk("mm_soft_emb_norm.weight"))
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows [N, mm_tokens, H]."""
        feats = siglip_encode(params, patches, self.vc)     # [N, P, Hv]
        N, P, Hv = feats.shape
        g, k = self.vc.grid, self.pool_k
        t = g // k
        x = feats.reshape(N, t, k, t, k, Hv).astype(jnp.float32)
        x = x.mean(axis=(2, 4)).reshape(N, t * t, Hv)       # avg pool
        # Gemma3RMSNorm: (1 + w) scaling at the vision layer_norm_eps
        x = rms_norm(x, params["mm"]["soft_emb_norm"] + 1.0,
                     self.vc.layer_norm_eps)
        x = x.astype(jnp.float32) @ params["mm"]["proj_w"].astype(jnp.float32)
        return x.astype(params["mm"]["proj_w"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
