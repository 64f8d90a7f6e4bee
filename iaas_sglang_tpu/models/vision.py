"""Vision encoders for VLM serving (TPU re-design of the reference's
ViT attention stack, srt/layers/attention/vision.py + the per-model vision
towers in srt/models/llava.py / qwen2_vl.py).

Design: the tower is a pure function over stacked per-layer weights
(lax.scan, like the LMs) operating on a BATCH of images at once
[N, P, D] — patch counts are static per (image-size) compile bucket, so
XLA tiles the whole tower onto the MXU with zero dynamic shapes. Vision
weights are small relative to the LM and are replicated across the mesh
(no TP): encode cost is amortized by the multimodal embedding cache.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.models.llama_family import WeightSpec


def layer_norm(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray,
               eps: float) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (out * w + b).astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def _act(name: str):
    if name == "quick_gelu":
        return quick_gelu
    if "gelu" in name:
        return lambda x: jax.nn.gelu(x, approximate=("tanh" in name))
    return jax.nn.silu


# ------------------------------------------------------------------- CLIP


class ClipVisionConfig:
    def __init__(self, vc: dict[str, Any]):
        self.hidden_size = vc.get("hidden_size", 1024)
        self.intermediate_size = vc.get("intermediate_size", 4096)
        self.num_layers = vc.get("num_hidden_layers", 24)
        self.num_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 336)
        self.patch_size = vc.get("patch_size", 14)
        self.hidden_act = vc.get("hidden_act", "quick_gelu")
        self.layer_norm_eps = vc.get("layer_norm_eps", 1e-5)
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid


def clip_vision_specs(vc: ClipVisionConfig, key_prefix: str,
                      with_post_ln: bool = False) -> dict[str, WeightSpec]:
    """WeightSpecs of a CLIP vision tower. `key_prefix` is the HF key prefix
    up to (and incl.) 'vision_model.'; alternates separated by '|' are tried
    in order by the loader (transformers >=4.52 nests towers under 'model.')."""
    Hv, Iv, Nh = vc.hidden_size, vc.intermediate_size, vc.num_heads
    L = vc.num_layers
    P = vc.num_patches
    p = vc.patch_size

    def k(suffix: str) -> str:
        return "|".join(pref + suffix for pref in key_prefix.split("|"))

    lk = "encoder.layers.{l}."
    s: dict[str, WeightSpec] = {
        "vt.class_emb": WeightSpec((Hv,), (None,), k("embeddings.class_embedding")),
        # conv [Hv, 3, p, p] -> matmul over flattened (c, i, j) patches
        "vt.patch_w": WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("embeddings.patch_embedding.weight"), transpose=True),
        "vt.pos_emb": WeightSpec(
            (P + 1, Hv), (None, None), k("embeddings.position_embedding.weight")),
        "vt.pre_ln_w": WeightSpec((Hv,), (None,), k("pre_layrnorm.weight")),
        "vt.pre_ln_b": WeightSpec((Hv,), (None,), k("pre_layrnorm.bias")),
    }
    if with_post_ln:
        # CLS pooling (CLIP embedding serving) needs the final layernorm;
        # llava taps layer -2 and never uses it
        s["vt.post_ln_w"] = WeightSpec(
            (Hv,), (None,), k("post_layernorm.weight"))
        s["vt.post_ln_b"] = WeightSpec(
            (Hv,), (None,), k("post_layernorm.bias"))
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
    return s


def clip_patchify(pixel_values: np.ndarray, patch: int) -> np.ndarray:
    """[N, 3, S, S] -> [N, (S/p)^2, 3*p*p] flattened in conv (c, i, j) order."""
    N, C, S, _ = pixel_values.shape
    g = S // patch
    x = pixel_values.reshape(N, C, g, patch, g, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)          # [N, gh, gw, C, p, p]
    return x.reshape(N, g * g, C * patch * patch)


def clip_encode(params: dict[str, Any], patches: jnp.ndarray,
                vc: ClipVisionConfig, feature_layer: int,
                post_ln: bool = False) -> jnp.ndarray:
    """patches [N, P, 3*p*p] -> features [N, P+1, Hv] taken after encoder
    layer `feature_layer` (negative = from the end, llava's -2 skips the
    last layer; CLS kept — the caller selects)."""
    Hv, Nh = vc.hidden_size, vc.num_heads
    Dh = Hv // Nh
    N, P, _ = patches.shape

    vt = params["vt"]
    emb = patches @ vt["patch_w"]                     # [N, P, Hv]
    cls = jnp.broadcast_to(vt["class_emb"], (N, 1, Hv)).astype(emb.dtype)
    h = jnp.concatenate([cls, emb], axis=1) + vt["pos_emb"][None]
    h = layer_norm(h, vt["pre_ln_w"], vt["pre_ln_b"],
                   vc.layer_norm_eps)

    n_run = feature_layer + vc.num_layers + 1 if feature_layer < 0 \
        else feature_layer + 1
    act = _act(vc.hidden_act)
    scale = Dh ** -0.5

    def body(carry, lp):
        x = carry
        r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], vc.layer_norm_eps)
        q = (r @ lp["wq"] + lp["bq"]).reshape(N, -1, Nh, Dh)
        k_ = (r @ lp["wk"] + lp["bk"]).reshape(N, -1, Nh, Dh)
        v = (r @ lp["wv"] + lp["bv"]).reshape(N, -1, Nh, Dh)
        s = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                       k_.astype(jnp.float32)) * scale
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
        ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
        x = x + (ctx @ lp["wo"] + lp["bo"])
        r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], vc.layer_norm_eps)
        x = x + (act(r2 @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"])
        return x, None

    lp_all = jax.tree.map(lambda a: a[:n_run], params["vt_layers"])
    h, _ = jax.lax.scan(body, h, lp_all)
    if post_ln:
        h = layer_norm(h, vt["post_ln_w"], vt["post_ln_b"],
                       vc.layer_norm_eps)
    return h


# ----------------------------------------------------------------- SigLIP


class SiglipVisionConfig:
    def __init__(self, vc: dict[str, Any]):
        self.hidden_size = vc.get("hidden_size", 1152)
        self.intermediate_size = vc.get("intermediate_size", 4304)
        self.num_layers = vc.get("num_hidden_layers", 27)
        self.num_heads = vc.get("num_attention_heads", 16)
        self.image_size = vc.get("image_size", 224)
        self.patch_size = vc.get("patch_size", 14)
        self.hidden_act = vc.get("hidden_act", "gelu_pytorch_tanh")
        self.layer_norm_eps = vc.get("layer_norm_eps", 1e-6)
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid


def siglip_vision_specs(vc: SiglipVisionConfig, key_prefix: str
                        ) -> dict[str, WeightSpec]:
    """SigLIP tower (reference srt/models/siglip.py; HF SiglipVisionModel):
    CLIP-like pre-norm blocks but NO class token / pre-layernorm, a biased
    patch conv, and a final post_layernorm. The attention-pool `head.*`
    keys are unused for embedding extraction (gemma3_mm taps the encoder
    output) and simply not loaded."""
    Hv, Iv = vc.hidden_size, vc.intermediate_size
    L = vc.num_layers
    P = vc.num_patches
    p = vc.patch_size

    def k(suffix: str) -> str:
        return "|".join(pref + suffix for pref in key_prefix.split("|"))

    lk = "encoder.layers.{l}."
    s: dict[str, WeightSpec] = {
        "vt.patch_w": WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("embeddings.patch_embedding.weight"), transpose=True),
        "vt.patch_b": WeightSpec(
            (Hv,), (None,), k("embeddings.patch_embedding.bias")),
        "vt.pos_emb": WeightSpec(
            (P, Hv), (None, None), k("embeddings.position_embedding.weight")),
        "vt.post_ln_w": WeightSpec((Hv,), (None,), k("post_layernorm.weight")),
        "vt.post_ln_b": WeightSpec((Hv,), (None,), k("post_layernorm.bias")),
    }
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
    return s


def siglip_encode(params: dict[str, Any], patches: jnp.ndarray,
                  vc: SiglipVisionConfig, feature_layer: int = None,
                  post_ln: bool = True) -> jnp.ndarray:
    """patches [N, P, 3*p*p] -> encoder output [N, P, Hv] after the full
    depth + post_layernorm (what gemma3's projector consumes). With
    `feature_layer` (HF hidden_states indexing, e.g. VILA's -2) the encoder
    stops early and post_layernorm is the caller's choice."""
    Hv, Nh = vc.hidden_size, vc.num_heads
    Dh = Hv // Nh
    N = patches.shape[0]

    vt = params["vt"]
    h = (patches @ vt["patch_w"] + vt["patch_b"]) + vt["pos_emb"][None]
    act = _act(vc.hidden_act)
    scale = Dh ** -0.5

    def body(carry, lp):
        x = carry
        r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], vc.layer_norm_eps)
        q = (r @ lp["wq"] + lp["bq"]).reshape(N, -1, Nh, Dh)
        k_ = (r @ lp["wk"] + lp["bk"]).reshape(N, -1, Nh, Dh)
        v = (r @ lp["wv"] + lp["bv"]).reshape(N, -1, Nh, Dh)
        s = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                       k_.astype(jnp.float32)) * scale
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
        ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
        x = x + (ctx @ lp["wo"] + lp["bo"])
        r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], vc.layer_norm_eps)
        x = x + (act(r2 @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"])
        return x, None

    lp_all = params["vt_layers"]
    if feature_layer is not None:
        n_run = (feature_layer + vc.num_layers + 1 if feature_layer < 0
                 else feature_layer + 1)
        lp_all = jax.tree.map(lambda a: a[:n_run], lp_all)
    h, _ = jax.lax.scan(body, h, lp_all)
    if not post_ln:
        return h
    return layer_norm(h, vt["post_ln_w"], vt["post_ln_b"], vc.layer_norm_eps)


# ------------------------------------------------ timm-style ViT (Janus)


class TimmVitConfig:
    """Geometry of a timm VisionTransformer (Janus-Pro's SigLIP towers are
    shipped in timm layout: fused blocks.N.attn.qkv, final `norm`, a plain
    [1, P, D] pos_embed parameter, no class token; reference
    srt/models/deepseek_janus_pro.py:689 VisionTransformer +
    SigLIP_MODEL_CONFIG:1018)."""

    def __init__(self, model_name: str, image_size: int = None,
                 overrides: dict = None):
        table = {
            "siglip_so400m_patch14_384": (384, 14, 1152, 27, 16, 3.7362),
            "siglip_so400m_patch14_224": (224, 14, 1152, 27, 16, 3.7362),
            "siglip_large_patch16_384": (384, 16, 1024, 24, 16, 4.0),
            "siglip_large_patch16_256": (256, 16, 1024, 24, 16, 4.0),
        }
        if model_name not in table:
            raise ValueError(f"unknown timm ViT model {model_name!r}; "
                             f"known: {sorted(table)}")
        img, p, w, l, h, mr = table[model_name]
        ov = overrides or {}
        self.image_size = image_size or ov.get("image_size", img)
        self.patch_size = ov.get("patch_size", p)
        self.hidden_size = ov.get("width", w)
        self.num_layers = ov.get("layers", l)
        self.num_heads = ov.get("heads", h)
        self.intermediate_size = int(self.hidden_size
                                     * ov.get("mlp_ratio", mr))
        self.layer_norm_eps = 1e-6
        self.grid = self.image_size // self.patch_size
        self.num_patches = self.grid * self.grid


def timm_vit_specs(vc: TimmVitConfig, key_prefix: str
                   ) -> dict[str, WeightSpec]:
    Hv, Iv = vc.hidden_size, vc.intermediate_size
    L = vc.num_layers
    P = vc.num_patches
    p = vc.patch_size

    def k(suffix: str) -> str:
        return "|".join(pref + suffix for pref in key_prefix.split("|"))

    lk = "blocks.{l}."
    s: dict[str, WeightSpec] = {
        "vt.patch_w": WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("patch_embed.proj.weight"), transpose=True),
        "vt.patch_b": WeightSpec((Hv,), (None,), k("patch_embed.proj.bias")),
        "vt.pos_emb": WeightSpec(
            (P, Hv), (None, None), k("pos_embed"),
            hf_pre=lambda t: t.reshape(-1, t.shape[-1])),
        "vt.post_ln_w": WeightSpec((Hv,), (None,), k("norm.weight")),
        "vt.post_ln_b": WeightSpec((Hv,), (None,), k("norm.bias")),
    }
    per_layer = {
        "ln1_w": ("norm1.weight", (Hv,), False),
        "ln1_b": ("norm1.bias", (Hv,), False),
        "ln2_w": ("norm2.weight", (Hv,), False),
        "ln2_b": ("norm2.bias", (Hv,), False),
        "wqkv": ("attn.qkv.weight", (Hv, 3 * Hv), True),
        "bqkv": ("attn.qkv.bias", (3 * Hv,), False),
        "wo": ("attn.proj.weight", (Hv, Hv), True),
        "bo": ("attn.proj.bias", (Hv,), False),
        "w1": ("mlp.fc1.weight", (Hv, Iv), True),
        "b1": ("mlp.fc1.bias", (Iv,), False),
        "w2": ("mlp.fc2.weight", (Iv, Hv), True),
        "b2": ("mlp.fc2.bias", (Hv,), False),
    }
    for name, (suffix, shape, tr) in per_layer.items():
        s[f"vt_layers.{name}"] = WeightSpec(
            shape, tuple(None for _ in shape), k(lk + suffix),
            transpose=tr, stacked=True, num_stack=L)
    return s


def timm_vit_encode(params: dict[str, Any], patches: jnp.ndarray,
                    vc: TimmVitConfig) -> jnp.ndarray:
    """patches [N, P, 3*p*p] -> features [N, P, Hv] after the final norm
    (timm forward_features; the head/attn-pool is ignored)."""
    Hv, Nh = vc.hidden_size, vc.num_heads
    Dh = Hv // Nh
    N = patches.shape[0]
    eps = vc.layer_norm_eps

    vt = params["vt"]
    h = (patches @ vt["patch_w"] + vt["patch_b"]) + vt["pos_emb"][None]
    scale = Dh ** -0.5

    def body(carry, lp):
        x = carry
        r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
        qkv = r @ lp["wqkv"] + lp["bqkv"]
        q, k_, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(N, -1, Nh, Dh)
        k_ = k_.reshape(N, -1, Nh, Dh)
        v = v.reshape(N, -1, Nh, Dh)
        s = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                       k_.astype(jnp.float32)) * scale
        a = jax.nn.softmax(s, axis=-1)
        ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
        ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
        x = x + (ctx @ lp["wo"] + lp["bo"])
        r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
        x = x + (jax.nn.gelu(
            (r2 @ lp["w1"] + lp["b1"]).astype(jnp.float32),
            approximate=False).astype(x.dtype) @ lp["w2"] + lp["b2"])
        return x, None

    h, _ = jax.lax.scan(body, h, params["vt_layers"])
    return layer_norm(h, vt["post_ln_w"], vt["post_ln_b"], eps)
