"""VILA / NVILA vision-language model (reference: srt/models/vila.py).

Composition over the functional Qwen2 LM ('llm.'-prefixed keys): a SigLIP
vision tower tapped at mm_vision_select_layer (HF hidden_states indexing,
no post-layernorm), the cls_patch feature map run through the
mlp_downsample_3x3_fix projector — 3x3 spatial concat (zero-padded to a
multiple of 3), LayerNorm, Linear(9m->3m), GELU, LayerNorm, Linear(3m->H),
GELU, Linear(H->H) — and the projected rows scattered over the
image-placeholder positions like LLaVA.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import (SiglipVisionConfig, clip_patchify,
                                            layer_norm, siglip_encode,
                                            siglip_vision_specs)

_VT_PREFIX = "vision_tower.vision_model.|model.vision_tower.vision_model."
_PROJ = "mm_projector.layers."


class VILAForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.vc = SiglipVisionConfig(config.vision_config)
        hf = config.hf_config
        self.select_layer = hf.get("mm_vision_select_layer", -2)
        self.mm_hidden = hf.get("mm_hidden_size", self.vc.hidden_size)
        assert hf.get("mm_projector_type",
                      "mlp_downsample_3x3_fix") == "mlp_downsample_3x3_fix", \
            "only the mlp_downsample_3x3_fix VILA projector is supported"
        self.out_grid = -(-self.vc.grid // 3)   # ceil(g/3)

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
        return self.out_grid * self.out_grid

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                key = "|".join("llm." + alt for alt in key.split("|"))
            s[name] = dataclasses.replace(spec, hf_key=key)
        s.update(siglip_vision_specs(self.vc, _VT_PREFIX))
        m, H = self.mm_hidden, self.config.hidden_size
        proj = [
            ("mm.ln1_w", (9 * m,), _PROJ + "1.weight", False),
            ("mm.ln1_b", (9 * m,), _PROJ + "1.bias", False),
            ("mm.w1", (9 * m, 3 * m), _PROJ + "2.weight", True),
            ("mm.b1", (3 * m,), _PROJ + "2.bias", False),
            ("mm.ln2_w", (3 * m,), _PROJ + "4.weight", False),
            ("mm.ln2_b", (3 * m,), _PROJ + "4.bias", False),
            ("mm.w2", (3 * m, H), _PROJ + "5.weight", True),
            ("mm.b2", (H,), _PROJ + "5.bias", False),
            ("mm.w3", (H, H), _PROJ + "7.weight", True),
            ("mm.b3", (H,), _PROJ + "7.bias", False),
        ]
        for name, shape, key, tr in proj:
            s[name] = WeightSpec(shape, tuple(None for _ in shape), key,
                                 transpose=tr)
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows [N, ceil(g/3)^2, H]."""
        feats = siglip_encode(params, patches, self.vc,
                              feature_layer=self.select_layer, post_ln=False)
        N, P, m = feats.shape
        g = self.vc.grid
        t = self.out_grid
        x = feats.reshape(N, g, g, m).astype(jnp.float32)
        pad = t * 3 - g
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        x = x.reshape(N, t, 3, t, 3, m).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, t * t, 9 * m)
        mm = params["mm"]
        eps = 1e-5
        x = layer_norm(x, mm["ln1_w"], mm["ln1_b"], eps)
        x = jax.nn.gelu(x @ mm["w1"].astype(jnp.float32) + mm["b1"],
                        approximate=False)
        x = layer_norm(x, mm["ln2_w"], mm["ln2_b"], eps)
        x = jax.nn.gelu(x @ mm["w2"].astype(jnp.float32) + mm["b2"],
                        approximate=False)
        x = x @ mm["w3"].astype(jnp.float32) + mm["b3"]
        return x.astype(params["mm"]["w3"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
