"""InternVL chat models (reference: srt/models/internvl.py
InternVLChatModel).

Composition: the InternViT tower ('vision_model.*' keys — class token +
conv patches + raw [1, P+1, D] position parameter, pre-norm blocks with
LayerScale ls1/ls2, optional full-width q/k RMSNorm, rms_norm or
layer_norm block norms, NO final norm) feeds pixel_shuffle (ps_version v2,
downsample_ratio 0.5 -> 2x2 channel fold) and the mlp1 projector
(LayerNorm -> Linear -> GELU -> Linear). The LM ('language_model.'-prefixed
Qwen2 / InternLM2 / Llama) runs with projected rows scattered over the
IMG_CONTEXT positions.

Dynamic aspect-ratio tiling is served as a single square tile (static TPU
shapes); the reference's tiling is a preprocessing-time quality lever.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import clip_patchify, layer_norm

_VT = "vision_model.|model.vision_model."


class InternVitConfig:
    def __init__(self, vc: dict[str, Any]):
        self.hidden_size = vc.get("hidden_size", 1024)
        self.intermediate_size = vc.get("intermediate_size", 4096)
        self.num_layers = vc.get("num_hidden_layers", 24)
        self.num_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 448)
        self.patch_size = vc.get("patch_size", 14)
        self.hidden_act = vc.get("hidden_act", "gelu")
        self.layer_norm_eps = vc.get("layer_norm_eps", 1e-6)
        self.norm_type = vc.get("norm_type", "layer_norm")
        self.qk_normalization = vc.get("qk_normalization", False)
        self.qkv_bias = vc.get("qkv_bias", True)
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid


class InternVLChatModel:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        hf = config.hf_config
        self.vc = InternVitConfig(hf.get("vision_config") or {})
        if hf.get("force_image_size"):
            self.vc.image_size = hf["force_image_size"]
            self.vc.grid = self.vc.image_size // self.vc.patch_size
            self.vc.num_patches = self.vc.grid * self.vc.grid
        self.select_layer = hf.get("select_layer", -1)
        self.ds = hf.get("downsample_ratio", 0.5)
        assert hf.get("ps_version", "v2") == "v2", \
            "ps_version v1 (transposed pixel shuffle) not supported"
        self.fold = int(round(1 / self.ds))

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
        return int(self.vc.num_patches * self.ds * self.ds)

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

        vc = self.vc
        Hv, Iv = vc.hidden_size, vc.intermediate_size
        L = vc.num_layers
        p = vc.patch_size
        P = vc.num_patches

        def k(suffix):
            return "|".join(pref + suffix for pref in _VT.split("|"))

        squeeze = lambda t: t.reshape(-1, t.shape[-1])
        s["vt.class_emb"] = WeightSpec(
            (1, Hv), (None, None), k("embeddings.class_embedding"),
            hf_pre=squeeze)
        s["vt.patch_w"] = WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("embeddings.patch_embedding.weight"), transpose=True)
        s["vt.patch_b"] = WeightSpec(
            (Hv,), (None,), k("embeddings.patch_embedding.bias"))
        s["vt.pos_emb"] = WeightSpec(
            (P + 1, Hv), (None, None), k("embeddings.position_embedding"),
            hf_pre=squeeze)
        lk = "encoder.layers.{l}."
        ln_bias = vc.norm_type == "layer_norm"
        per_layer = [
            ("norm1_w", lk + "norm1.weight", (Hv,), False),
            ("norm2_w", lk + "norm2.weight", (Hv,), False),
            ("ls1", lk + "ls1", (Hv,), False),
            ("ls2", lk + "ls2", (Hv,), False),
            ("wqkv", lk + "attn.qkv.weight", (Hv, 3 * Hv), True),
            ("wo", lk + "attn.proj.weight", (Hv, Hv), True),
            ("bo", lk + "attn.proj.bias", (Hv,), False),
            ("w1", lk + "mlp.fc1.weight", (Hv, Iv), True),
            ("b1", lk + "mlp.fc1.bias", (Iv,), False),
            ("w2", lk + "mlp.fc2.weight", (Iv, Hv), True),
            ("b2", lk + "mlp.fc2.bias", (Hv,), False),
        ]
        if ln_bias:
            per_layer += [("norm1_b", lk + "norm1.bias", (Hv,), False),
                          ("norm2_b", lk + "norm2.bias", (Hv,), False)]
        if vc.qkv_bias:
            per_layer.append(("bqkv", lk + "attn.qkv.bias", (3 * Hv,), False))
        if vc.qk_normalization:
            per_layer += [("q_norm", lk + "attn.q_norm.weight", (Hv,), False),
                          ("k_norm", lk + "attn.k_norm.weight", (Hv,), False)]
        for name, key, shape, tr in per_layer:
            s[f"vt_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), k(key),
                transpose=tr, stacked=True, num_stack=L)

        m = Hv * self.fold * self.fold
        H = self.config.hidden_size
        proj = [
            ("mm.ln_w", (m,), "mlp1.0.weight", False),
            ("mm.ln_b", (m,), "mlp1.0.bias", False),
            ("mm.w1", (m, H), "mlp1.1.weight", True),
            ("mm.b1", (H,), "mlp1.1.bias", False),
            ("mm.w2", (H, H), "mlp1.3.weight", True),
            ("mm.b2", (H,), "mlp1.3.bias", False),
        ]
        for name, shape, key, tr in proj:
            s[name] = WeightSpec(shape, tuple(None for _ in shape),
                                 f"{key}|model.{key}", transpose=tr)
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows [N, P*ds^2, H]."""
        vc = self.vc
        Hv, Nh = vc.hidden_size, vc.num_heads
        Dh = Hv // Nh
        eps = vc.layer_norm_eps
        N = patches.shape[0]
        rms = vc.norm_type == "rms_norm"

        vt = params["vt"]
        emb = patches @ vt["patch_w"] + vt["patch_b"]
        cls = jnp.broadcast_to(vt["class_emb"], (N, 1, Hv)).astype(emb.dtype)
        h = jnp.concatenate([cls, emb], axis=1) + vt["pos_emb"][None]

        def norm(x, w, b):
            if rms:
                return rms_norm(x, w, eps)
            return layer_norm(x, w, b, eps)

        scale = Dh ** -0.5

        def body(carry, lp):
            x = carry
            r = norm(x, lp["norm1_w"], lp.get("norm1_b"))
            qkv = r @ lp["wqkv"]
            if "bqkv" in lp:
                qkv = qkv + lp["bqkv"]
            q, k_, v = jnp.split(qkv, 3, axis=-1)
            if "q_norm" in lp:
                # InternViT-6B: RMSNorm over the FULL width before heads
                q = rms_norm(q, lp["q_norm"], eps)
                k_ = rms_norm(k_, lp["k_norm"], eps)
            q = q.reshape(N, -1, Nh, Dh)
            k_ = k_.reshape(N, -1, Nh, Dh)
            v = v.reshape(N, -1, Nh, Dh)
            s = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                           k_.astype(jnp.float32)) * scale
            a = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
            ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
            x = x + (ctx @ lp["wo"] + lp["bo"]) * lp["ls1"]
            r2 = norm(x, lp["norm2_w"], lp.get("norm2_b"))
            inter = jax.nn.gelu((r2 @ lp["w1"] + lp["b1"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            x = x + (inter @ lp["w2"] + lp["b2"]) * lp["ls2"]
            return x, None

        lp_all = params["vt_layers"]
        if self.select_layer != -1:
            n_run = (self.select_layer + vc.num_layers + 1
                     if self.select_layer < 0 else self.select_layer)
            lp_all = jax.tree.map(lambda a: a[:n_run], lp_all)
        h, _ = jax.lax.scan(body, h, lp_all)

        feats = h[:, 1:]                                   # drop CLS
        g = vc.grid
        f = self.fold
        # pixel_shuffle v2 (reference internvl.py:462): [N, w, h, C] ->
        # [N, h/f, w/f, C*f*f] with the swap-back permute
        x = feats.reshape(N, g, g, Hv)
        x = x.reshape(N, g, g // f, Hv * f)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, g // f, g // f, Hv * f * f)
        x = x.transpose(0, 2, 1, 3)
        x = x.reshape(N, (g // f) * (g // f), Hv * f * f).astype(jnp.float32)
        mm = params["mm"]
        x = layer_norm(x, mm["ln_w"], mm["ln_b"], 1e-5)
        x = jax.nn.gelu(x @ mm["w1"].astype(jnp.float32) + mm["b1"],
                        approximate=False)
        x = x @ mm["w2"].astype(jnp.float32) + mm["b2"]
        return x.astype(mm["w2"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
