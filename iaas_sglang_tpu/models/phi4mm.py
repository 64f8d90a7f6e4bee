"""Phi-4-multimodal (reference: srt/models/phi4mm.py Phi4MMForCausalLM).

Serving scope matches the reference exactly: IMAGE inputs through the
hardcoded siglip-so400m-448 Idefics2 tower (26 of 27 layers, NO post
layernorm — phi4mm.py:52 get_navit_vision_model, skip list :471), 2x2
average-pool token compression, the HD transform with learnable sub_GN /
glb_GN separators in 'sub_glb' order (phi4mm.py:260-380) and the
Linear-GELU-Linear img_projection; the AUDIO tower and the vision/speech
LoRA adapters are skipped in the reference too (load_weights skip list +
'base_layer.' strip — the base weights serve). The LM is the phi3 family
(fused qkv_proj/gate_up_proj, partial rotary) with PLAIN 'model.*' keys.

Single-crop serving: pixel = the 448px global view; the (1,1)-crop sub
view equals the global view, so the tower runs once and the rows lay out
[sub+newlines ; glb_GN ; glb+newlines] = 2*(g/2)*(g/2+1)+1 per image.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import (SiglipVisionConfig, clip_patchify,
                                            layer_norm)

_IE = "model.embed_tokens_extend.image_embed."

# hardcoded in the reference (phi4mm.py:53): the tower geometry is not in
# the HF config
PHI4MM_VISION = dict(hidden_size=1152, image_size=448,
                     intermediate_size=4304, num_attention_heads=16,
                     num_hidden_layers=26, patch_size=14,
                     layer_norm_eps=1e-6)


class Phi4MMForCausalLM:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.vc = SiglipVisionConfig(config.vision_config or PHI4MM_VISION)
        self.grid = self.vc.image_size // self.vc.patch_size   # 32
        self.pooled = self.grid // 2                           # 16

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
        p = self.pooled
        return 2 * p * (p + 1) + 1

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s = dict(self.lm.weight_specs())   # plain model.* keys

        vc = self.vc
        Hv, Iv = vc.hidden_size, vc.intermediate_size
        L = vc.num_layers
        p = vc.patch_size
        side = vc.image_size // p

        def k(suffix):
            return _IE + "img_processor." + suffix

        s["vt.patch_w"] = WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("embeddings.patch_embedding.weight"), transpose=True,
            hf_pre=lambda t: t.reshape(t.shape[0], -1))
        s["vt.patch_b"] = WeightSpec(
            (Hv,), (None,), k("embeddings.patch_embedding.bias"))
        s["vt.pos_emb"] = WeightSpec(
            (side * side, Hv), (None, None),
            k("embeddings.position_embedding.weight"))
        lk = "encoder.layers.{l}."
        per_layer = {
            "ln1_w": ("layer_norm1.weight", (Hv,), False),
            "ln1_b": ("layer_norm1.bias", (Hv,), False),
            "ln2_w": ("layer_norm2.weight", (Hv,), False),
            "ln2_b": ("layer_norm2.bias", (Hv,), False),
            "wq": ("self_attn.q_proj.weight", (Hv, Hv), True),
            "bq": ("self_attn.q_proj.bias", (Hv,), False),
            "wk": ("self_attn.k_proj.weight", (Hv, Hv), True),
            "bk": ("self_attn.k_proj.bias", (Hv,), False),
            "wv": ("self_attn.v_proj.weight", (Hv, Hv), True),
            "bv": ("self_attn.v_proj.bias", (Hv,), False),
            "wo": ("self_attn.out_proj.weight", (Hv, Hv), True),
            "bo": ("self_attn.out_proj.bias", (Hv,), False),
            "w1": ("mlp.fc1.weight", (Hv, Iv), True),
            "b1": ("mlp.fc1.bias", (Iv,), False),
            "w2": ("mlp.fc2.weight", (Iv, Hv), True),
            "b2": ("mlp.fc2.bias", (Hv,), False),
        }
        for name, (suffix, shape, tr) in per_layer.items():
            s[f"vt_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), k(lk + suffix),
                transpose=tr, stacked=True, num_stack=L)

        H = self.config.hidden_size
        C = Hv
        s["ie.glb_gn"] = WeightSpec(
            (C,), (None,), _IE + "glb_GN",
            hf_pre=lambda t: t.reshape(-1))
        s["ie.sub_gn"] = WeightSpec(
            (C,), (None,), _IE + "sub_GN",
            hf_pre=lambda t: t.reshape(-1))
        s["ie.p0_w"] = WeightSpec((C, H), (None, None),
                                  _IE + "img_projection.0.weight",
                                  transpose=True)
        s["ie.p0_b"] = WeightSpec((H,), (None,),
                                  _IE + "img_projection.0.bias")
        s["ie.p2_w"] = WeightSpec((H, H), (None, None),
                                  _IE + "img_projection.2.weight",
                                  transpose=True)
        s["ie.p2_b"] = WeightSpec((H,), (None,),
                                  _IE + "img_projection.2.bias")
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows
        [N, 2*g2*(g2+1)+1, H] (g2 = pooled grid side)."""
        vc = self.vc
        Hv, Nh = vc.hidden_size, vc.num_heads
        Dh = Hv // Nh
        eps = vc.layer_norm_eps
        N = patches.shape[0]
        g, g2 = self.grid, self.pooled

        vt = params["vt"]
        h = (patches @ vt["patch_w"] + vt["patch_b"]) + vt["pos_emb"][None]
        scale = Dh ** -0.5

        def body(carry, lp):
            x = carry
            r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = (r @ lp["wq"] + lp["bq"]).reshape(N, -1, Nh, Dh)
            k_ = (r @ lp["wk"] + lp["bk"]).reshape(N, -1, Nh, Dh)
            v = (r @ lp["wv"] + lp["bv"]).reshape(N, -1, Nh, Dh)
            s_ = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                            k_.astype(jnp.float32)) * scale
            a = jax.nn.softmax(s_, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
            ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
            x = x + (ctx @ lp["wo"] + lp["bo"])
            r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
            inter = jax.nn.gelu((r2 @ lp["w1"] + lp["b1"]).astype(
                jnp.float32), approximate=True).astype(x.dtype)
            return x + (inter @ lp["w2"] + lp["b2"]), None

        h, _ = jax.lax.scan(body, h, params["vt_layers"])
        # NO post layernorm (require_post_norm=False, phi4mm.py:64)

        # 2x2 avg-pool token compression (phi4mm.py:113)
        h = h.reshape(N, g2, 2, g2, 2, Hv).mean(axis=(2, 4))  # [N,16,16,C]

        ie = params["ie"]
        sub_col = jnp.broadcast_to(ie["sub_gn"][None, None, None],
                                   (N, g2, 1, Hv))
        view = jnp.concatenate([h, sub_col], axis=2).reshape(N, -1, Hv)
        glb = jnp.broadcast_to(ie["glb_gn"][None, None], (N, 1, Hv))
        # hd_transform_order='sub_glb': [sub ; glb_GN ; glb]; the (1,1)
        # crop's sub view IS the global view
        feats = jnp.concatenate([view, glb, view], axis=1).astype(
            jnp.float32)
        x = feats @ ie["p0_w"].astype(jnp.float32) + ie["p0_b"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ ie["p2_w"].astype(jnp.float32) + ie["p2_b"]
        return x.astype(ie["p0_w"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
