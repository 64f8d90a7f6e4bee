"""LLaVA-family vision-language model (reference: srt/models/llava.py).

Composition over the functional LM: a CLIP vision tower + 2-layer MLP
projector produce per-image embedding rows; the LM runs unchanged with
those rows SCATTERED over the image-placeholder token positions
(ForwardBatch.mm_embeds/mm_positions — the TPU analog of the reference's
pad_input_ids + embedding-merge path). Image-token spans in input_ids
carry hash-derived pseudo ids, so the radix cache keys on image CONTENT
and the overwritten embedding rows never matter.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import (ClipVisionConfig, _act,
                                            clip_encode, clip_patchify,
                                            clip_vision_specs)

# transformers >= 4.52 nests towers under "model."; older checkpoints use
# the bare prefixes. The loader tries '|'-separated alternates in order.
_LM_PREFIXES = ("model.language_model.", "language_model.model.")
_VT_PREFIX = ("model.vision_tower.vision_model."
              "|vision_tower.vision_model.")
_PROJ_PREFIXES = ("model.multi_modal_projector.", "multi_modal_projector.")


class LlavaForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.vc = ClipVisionConfig(config.vision_config)

    # mesh/moe knobs set by the runner are forwarded to the LM
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
        n = self.vc.num_patches
        if self.config.vision_feature_select_strategy == "full":
            n += 1
        return n

    def patchify(self, pixel_values):
        """host-side: [N, 3, S, S] -> [N, P, 3*p*p] for encode_images."""
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
            import dataclasses

            s[name] = dataclasses.replace(spec, hf_key=key)
        s.update(clip_vision_specs(self.vc, _VT_PREFIX))
        Hv, Hl = self.vc.hidden_size, self.config.hidden_size

        def pk(suffix):
            return "|".join(p + suffix for p in _PROJ_PREFIXES)

        s["mm.proj_w1"] = WeightSpec((Hv, Hl), (None, None),
                                     pk("linear_1.weight"), transpose=True)
        s["mm.proj_b1"] = WeightSpec((Hl,), (None,), pk("linear_1.bias"))
        s["mm.proj_w2"] = WeightSpec((Hl, Hl), (None, None),
                                     pk("linear_2.weight"), transpose=True)
        s["mm.proj_b2"] = WeightSpec((Hl,), (None,), pk("linear_2.bias"))
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM-space rows
        [N, num_image_tokens, H_lm] (jit-able; bucketed on N by the runner)."""
        feats = clip_encode(params, patches, self.vc,
                            self.config.vision_feature_layer)
        if self.config.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]                 # drop CLS
        act = _act(self.config.mm_projector_act)
        x = feats.astype(jnp.float32) @ params["mm"]["proj_w1"].astype(jnp.float32)
        x = act(x + params["mm"]["proj_b1"])
        x = x @ params["mm"]["proj_w2"].astype(jnp.float32) + params["mm"]["proj_b2"]
        return x.astype(params["mm"]["proj_w1"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
