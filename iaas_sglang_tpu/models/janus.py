"""DeepSeek Janus-Pro understanding path (reference:
srt/models/deepseek_janus_pro.py MultiModalityCausalLM).

Composition: a timm-layout SigLIP ViT ('vision_model.vision_tower.*' keys,
fused qkv blocks, final norm, no class token) feeds the `aligner`
MlpProjector (mlp_gelu, depth-2: Linear -> GELU -> Linear) whose rows are
scattered over the image-placeholder positions of the 'language_model.'
Llama. The image-GENERATION stack (gen_vision_model / gen_aligner /
gen_head / gen_embed) is not served — the reference's serving path is
understanding-only too (its forward routes through the general VLM
embedding merge)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import (TimmVitConfig, clip_patchify,
                                            timm_vit_encode, timm_vit_specs)

_VT_PREFIX = "vision_model.vision_tower.|model.vision_model.vision_tower."


class MultiModalityCausalLM:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        hf = config.hf_config
        vp = (hf.get("vision_config") or {}).get("params", {})
        self.vc = TimmVitConfig(
            vp.get("model_name", "siglip_large_patch16_384"),
            vp.get("image_size"), overrides=vp)
        ap = (hf.get("aligner_config") or {}).get("params", {})
        assert ap.get("projector_type", "mlp_gelu") == "mlp_gelu", \
            "only the mlp_gelu Janus aligner is supported"
        self.aligner_depth = ap.get("depth", 2)
        self.aligner_in = ap.get("input_dim", self.vc.hidden_size)
        self.aligner_out = ap.get("n_embed", config.hidden_size)

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
        return self.vc.num_patches

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                key = "|".join("language_model." + alt
                               for alt in key.split("|"))
            s[name] = dataclasses.replace(spec, hf_key=key)
        s.update(timm_vit_specs(self.vc, _VT_PREFIX))
        din, dout = self.aligner_in, self.aligner_out
        s["mm.w0"] = WeightSpec((din, dout), (None, None),
                                "aligner.layers.0.weight", transpose=True)
        s["mm.b0"] = WeightSpec((dout,), (None,), "aligner.layers.0.bias")
        for d in range(1, self.aligner_depth):
            i = 2 * d
            s[f"mm.w{d}"] = WeightSpec(
                (dout, dout), (None, None),
                f"aligner.layers.{i}.weight", transpose=True)
            s[f"mm.b{d}"] = WeightSpec(
                (dout,), (None,), f"aligner.layers.{i}.bias")
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> aligned LM rows [N, P, H]."""
        feats = timm_vit_encode(params, patches, self.vc)    # [N, P, Dv]
        mm = params["mm"]
        x = feats.astype(jnp.float32) @ mm["w0"].astype(jnp.float32) + mm["b0"]
        for d in range(1, self.aligner_depth):
            x = jax.nn.gelu(x, approximate=False)
            x = x @ mm[f"w{d}"].astype(jnp.float32) + mm[f"b{d}"]
        return x.astype(mm["w0"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
