"""Pixtral vision tower + Mistral-3 VLM (reference: srt/models/pixtral.py
PixtralHFVisionModel + srt/models/mistral.py Mistral3ForConditionalGeneration).

Pixtral ViT: bias-less conv patches, RMSNorm pre-norm (ln_pre), blocks of
RMSNorm -> MHA with 2D rope (even inv_freq channels encode the patch row,
odd ones the column) -> RMSNorm -> gated-SiLU MLP; no final norm. Served at
a fixed square resolution (static TPU shapes), so the block-diagonal
multi-image mask of the reference is not needed — each image is its own
batch entry.

Mistral-3: the tower output runs through RMSNorm, a 2x2 patch merger
(channel-major unfold + bias-less linear) and a 2-layer GELU projector into
the Mistral LM ('language_model.'-prefixed keys).
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
from iaas_sglang_tpu.models.vision import clip_patchify


class PixtralVisionConfig:
    def __init__(self, vc: dict[str, Any]):
        self.hidden_size = vc.get("hidden_size", 1024)
        self.intermediate_size = vc.get("intermediate_size", 4096)
        self.num_layers = vc.get("num_hidden_layers", 24)
        self.num_heads = vc.get("num_attention_heads", 16)
        self.head_dim = vc.get("head_dim",
                               self.hidden_size // self.num_heads)
        self.image_size = vc.get("image_size", 1024)
        self.patch_size = vc.get("patch_size", 16)
        self.rope_theta = vc.get("rope_theta", 10000.0)
        # serving resolution: fixed square (override via
        # vision_config["serving_image_size"]); the rope table is built on
        # the FULL image_size meshgrid so positions match HF exactly
        self.serving_size = vc.get("serving_image_size",
                                   min(self.image_size, 512))
        self.grid = self.serving_size // self.patch_size
        self.num_patches = self.grid * self.grid


def pixtral_vision_specs(vc: PixtralVisionConfig, key_prefix: str
                         ) -> dict[str, WeightSpec]:
    Hv, Iv = vc.hidden_size, vc.intermediate_size
    Dh, Nh = vc.head_dim, vc.num_heads
    L = vc.num_layers
    p = vc.patch_size

    def k(suffix: str) -> str:
        return "|".join(pref + suffix for pref in key_prefix.split("|"))

    lk = "transformer.layers.{l}."
    s: dict[str, WeightSpec] = {
        "vt.patch_w": WeightSpec((3 * p * p, Hv), (None, None),
                                 k("patch_conv.weight"), transpose=True),
        "vt.ln_pre": WeightSpec((Hv,), (None,), k("ln_pre.weight")),
    }
    per_layer = [
        ("attn_norm", lk + "attention_norm.weight", (Hv,), False),
        ("ffn_norm", lk + "ffn_norm.weight", (Hv,), False),
        ("wq", lk + "attention.q_proj.weight", (Hv, Nh * Dh), True),
        ("wk", lk + "attention.k_proj.weight", (Hv, Nh * Dh), True),
        ("wv", lk + "attention.v_proj.weight", (Hv, Nh * Dh), True),
        ("wo", lk + "attention.o_proj.weight", (Nh * Dh, Hv), True),
        ("w_gate", lk + "feed_forward.gate_proj.weight", (Hv, Iv), True),
        ("w_up", lk + "feed_forward.up_proj.weight", (Hv, Iv), True),
        ("w_down", lk + "feed_forward.down_proj.weight", (Iv, Hv), True),
    ]
    for name, key, shape, tr in per_layer:
        s[f"vt_layers.{name}"] = WeightSpec(
            shape, tuple(None for _ in shape), k(key),
            transpose=tr, stacked=True, num_stack=L)
    return s


def _pixtral_rope_angles(vc: PixtralVisionConfig) -> jnp.ndarray:
    """[num_patches, head_dim/2] rope angles for the serving grid
    (HF PixtralRotaryEmbedding: even inv_freq channels x patch row, odd x
    column; position id = row * (image_size/patch) + col)."""
    import numpy as np

    dim = vc.head_dim
    inv = 1.0 / (vc.rope_theta ** (np.arange(0, dim, 2, dtype=np.float64)
                                   / dim))
    f_h, f_w = inv[0::2], inv[1::2]
    g = vc.grid
    hh = np.arange(g, dtype=np.float64)
    ww = np.arange(g, dtype=np.float64)
    ang_h = np.outer(hh, f_h)                       # [g, dim/4]
    ang_w = np.outer(ww, f_w)                       # [g, dim/4]
    full = np.concatenate(
        [np.broadcast_to(ang_h[:, None, :], (g, g, ang_h.shape[1])),
         np.broadcast_to(ang_w[None, :, :], (g, g, ang_w.shape[1]))],
        axis=-1).reshape(g * g, dim // 2)
    return jnp.asarray(full, jnp.float32)


def pixtral_encode(params: dict[str, Any], patches: jnp.ndarray,
                   vc: PixtralVisionConfig) -> jnp.ndarray:
    """patches [N, P, 3*p*p] -> tower output [N, P, Hv] (no final norm)."""
    Hv, Nh, Dh = vc.hidden_size, vc.num_heads, vc.head_dim
    N = patches.shape[0]
    eps = 1e-5

    vt = params["vt"]
    h = patches @ vt["patch_w"]
    h = rms_norm(h, vt["ln_pre"], eps)

    ang = _pixtral_rope_angles(vc)                   # [P, Dh/2]
    cos = jnp.cos(jnp.concatenate([ang, ang], -1))   # [P, Dh]
    sin = jnp.sin(jnp.concatenate([ang, ang], -1))

    def rot(x):   # [N, P, Nh, Dh] neox half-rotation
        x1, x2 = jnp.split(x, 2, axis=-1)
        xr = jnp.concatenate([-x2, x1], axis=-1)
        return (x * cos[None, :, None, :] + xr * sin[None, :, None, :]
                ).astype(x.dtype)

    scale = Dh ** -0.5

    def body(carry, lp):
        x = carry
        r = rms_norm(x, lp["attn_norm"], eps)
        q = (r @ lp["wq"]).reshape(N, -1, Nh, Dh)
        k_ = (r @ lp["wk"]).reshape(N, -1, Nh, Dh)
        v = (r @ lp["wv"]).reshape(N, -1, Nh, Dh)
        q, k_ = rot(q.astype(jnp.float32)), rot(k_.astype(jnp.float32))
        s = jnp.einsum("bqnd,bknd->bnqk", q, k_) * scale
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
        ctx = ctx.reshape(N, -1, Nh * Dh).astype(x.dtype)
        x = x + ctx @ lp["wo"]
        r2 = rms_norm(x, lp["ffn_norm"], eps)
        mlp = (jax.nn.silu(r2 @ lp["w_gate"]) * (r2 @ lp["w_up"])) \
            @ lp["w_down"]
        return x + mlp, None

    h, _ = jax.lax.scan(body, h, params["vt_layers"])
    return h


class Mistral3ForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        hf = config.hf_config
        self.vc = PixtralVisionConfig(config.vision_config or {})
        self.merge = hf.get("spatial_merge_size", 2)
        self.proj_bias = hf.get("multimodal_projector_bias", False)

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
        return self.vc.num_patches // (self.merge * self.merge)

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                alts = []
                for alt in key.split("|"):
                    if alt.startswith("model."):
                        alts.append("model.language_model."
                                    + alt[len("model."):])
                        alts.append("language_model." + alt)
                    else:
                        alts.append(alt)
                        alts.append("language_model." + alt)
                key = "|".join(alts)
            s[name] = dataclasses.replace(spec, hf_key=key)
        s.update(pixtral_vision_specs(
            self.vc, "vision_tower.|model.vision_tower."))
        Hv, H = self.vc.hidden_size, self.config.hidden_size
        m = self.merge

        def pk(suffix):
            return (f"multi_modal_projector.{suffix}"
                    f"|model.multi_modal_projector.{suffix}")

        s["mm.norm"] = WeightSpec((Hv,), (None,), pk("norm.weight"))
        s["mm.merge_w"] = WeightSpec(
            (Hv * m * m, Hv), (None, None),
            pk("patch_merger.merging_layer.weight"), transpose=True)
        s["mm.w1"] = WeightSpec((Hv, H), (None, None),
                                pk("linear_1.weight"), transpose=True)
        s["mm.w2"] = WeightSpec((H, H), (None, None),
                                pk("linear_2.weight"), transpose=True)
        if self.proj_bias:
            s["mm.b1"] = WeightSpec((H,), (None,), pk("linear_1.bias"))
            s["mm.b2"] = WeightSpec((H,), (None,), pk("linear_2.bias"))
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows [N, P/m^2, H]."""
        vc = self.vc
        feats = pixtral_encode(params, patches, vc)      # [N, P, Hv]
        mm = params["mm"]
        x = rms_norm(feats, mm["norm"], 1e-5).astype(jnp.float32)
        N, P, Hv = x.shape
        g, m = vc.grid, self.merge
        # patch merger: channel-major unfold of the [Hv, g, g] grid into
        # m x m blocks (HF Mistral3PatchMerger uses F.unfold: feature order
        # is (c, ki, kj) with c slowest)
        x = x.reshape(N, g, g, Hv)
        x = x.reshape(N, g // m, m, g // m, m, Hv)
        x = x.transpose(0, 1, 3, 5, 2, 4)     # [N, gh, gw, Hv, ki, kj]
        x = x.reshape(N, (g // m) * (g // m), Hv * m * m)
        x = x @ mm["merge_w"].astype(jnp.float32)
        x = x @ mm["w1"].astype(jnp.float32)
        if "b1" in mm:
            x = x + mm["b1"]
        x = jax.nn.gelu(x, approximate=False)
        x = x @ mm["w2"].astype(jnp.float32)
        if "b2" in mm:
            x = x + mm["b2"]
        return x.astype(mm["w2"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)


class PixtralVisionModel:
    """Standalone Pixtral tower serving (reference pixtral.py EntryClass):
    image embedding requests through Engine.encode(image_data=...) — the
    tower output is mean-pooled and l2-normalized. Text serving is not
    meaningful for a bare vision model."""

    def __init__(self, config: ModelConfig):
        self.config = config
        self.mesh = None
        self.moe_impl = "dense"
        self.vc = PixtralVisionConfig(config.hf_config or {})

    def kv_entry_shape(self):
        return (1, 1)

    def kv_shard_dims(self):
        return (None, None, None, None)

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    def weight_specs(self) -> dict[str, WeightSpec]:
        return pixtral_vision_specs(self.vc, "")

    def embed_image(self, params, patches):
        feats = pixtral_encode(params, patches, self.vc)
        pooled = feats.astype(jnp.float32).mean(axis=1)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

    def forward(self, params, fb, kv_pages, **kw):
        raise ValueError(
            "PixtralVisionModel serves image embeddings only — send "
            "image_data through the encode route")

    def compute_logits(self, params, hidden):
        return jnp.zeros((hidden.shape[0], 1), jnp.float32)
