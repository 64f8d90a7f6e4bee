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


class YiVLForCausalLM(LlavaForConditionalGeneration):
    """Yi-VL (reference srt/models/yivl.py): LLaVA with a layernormed
    projector (linear -> LN -> gelu -> linear -> LN). Serves HF-layout
    checkpoints; legacy 'model.mm_projector.N' keys are accepted as
    alternates."""

    def weight_specs(self) -> dict[str, WeightSpec]:
        s = super().weight_specs()
        Hl = self.config.hidden_size

        def pk(suffix, legacy):
            alts = [p + suffix for p in _PROJ_PREFIXES]
            alts.append("model.mm_projector." + legacy)
            return "|".join(alts)

        s["mm.proj_w1"].hf_key = pk("linear_1.weight", "0.weight")
        s["mm.proj_b1"].hf_key = pk("linear_1.bias", "0.bias")
        s["mm.proj_w2"].hf_key = pk("linear_2.weight", "3.weight")
        s["mm.proj_b2"].hf_key = pk("linear_2.bias", "3.bias")
        s["mm.ln1_w"] = WeightSpec((Hl,), (None,),
                                   pk("ln_1.weight", "1.weight"))
        s["mm.ln1_b"] = WeightSpec((Hl,), (None,), pk("ln_1.bias", "1.bias"))
        s["mm.ln2_w"] = WeightSpec((Hl,), (None,),
                                   pk("ln_2.weight", "4.weight"))
        s["mm.ln2_b"] = WeightSpec((Hl,), (None,), pk("ln_2.bias", "4.bias"))
        return s

    def encode_images(self, params, patches):
        from iaas_sglang_tpu.models.vision import layer_norm

        feats = clip_encode(params, patches, self.vc,
                            self.config.vision_feature_layer)
        if self.config.vision_feature_select_strategy == "default":
            feats = feats[:, 1:]
        mm = params["mm"]
        x = feats.astype(jnp.float32) @ mm["proj_w1"].astype(jnp.float32)
        x = layer_norm(x + mm["proj_b1"], mm["ln1_w"], mm["ln1_b"], 1e-5)
        x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        x = x @ mm["proj_w2"].astype(jnp.float32) + mm["proj_b2"]
        x = layer_norm(x, mm["ln2_w"], mm["ln2_b"], 1e-5)
        return x.astype(mm["proj_w1"].dtype)


class LlavaVidForCausalLM(LlavaForConditionalGeneration):
    """LLaVA-video (reference srt/models/llavavid.py): a video is
    num_frames CLIP-encoded frames, each average-pooled by
    mm_spatial_pool_stride over the patch grid, projected and
    concatenated along the token axis."""

    def __init__(self, config):
        super().__init__(config)
        hf = config.hf_config
        self.num_frames = hf.get("num_frames", 16)
        self.pool_stride = hf.get("mm_spatial_pool_stride", 2)

    def num_image_tokens(self) -> int:
        g = self.vc.grid // self.pool_stride
        return self.num_frames * g * g

    def patchify(self, pixel_values):
        """[N, F, 3, S, S] -> [N, F, P, 3*p*p]."""
        import numpy as np

        x = np.asarray(pixel_values)
        N, F = x.shape[:2]
        flat = clip_patchify(x.reshape((N * F,) + x.shape[2:]),
                             self.vc.patch_size)
        return flat.reshape(N, F, *flat.shape[1:])

    def encode_images(self, params, patches):
        N, F, P, D = patches.shape
        feats = clip_encode(params, patches.reshape(N * F, P, D), self.vc,
                            self.config.vision_feature_layer)
        feats = feats[:, 1:]                    # per-frame patch features
        g, st = self.vc.grid, self.pool_stride
        t = g // st
        Hv = feats.shape[-1]
        x = feats.reshape(N * F, t, st, t, st, Hv).astype(jnp.float32)
        x = x.mean(axis=(2, 4)).reshape(N * F, t * t, Hv)
        act = _act(self.config.mm_projector_act)
        x = x @ params["mm"]["proj_w1"].astype(jnp.float32)
        x = act(x + params["mm"]["proj_b1"])
        x = x @ params["mm"]["proj_w2"].astype(jnp.float32) \
            + params["mm"]["proj_b2"]
        x = x.reshape(N, F * t * t, -1)
        return x.astype(params["mm"]["proj_w1"].dtype)
