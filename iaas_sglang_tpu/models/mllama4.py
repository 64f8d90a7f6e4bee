"""Llama4ForConditionalGeneration vision path (reference:
srt/models/mllama4.py + HF modeling_llama4 Llama4VisionModel).

Tower: unfold-linear patch embedding (bias-less), CLS appended at the END,
learned positions, layernorm_pre, biased-projection blocks with 2D rope
(first half of the complex pairs rotates by (col+1)*freq, second half by
(row+1)*freq; the CLS row gets zero angles — Llama4VisionRotaryEmbedding),
exact-GELU biased MLP, layernorm_post, CLS dropped, then the pixel-shuffle
adapter (ratio 0.5 double-transpose reshape + bias-less fc1/gelu/fc2/gelu,
Llama4VisionPixelShuffleMLP) and the bias-less multi_modal_projector into
the Llama-4 text family (NoPE + chunked local attention, models/llama4
handled by llama_family).

Serving uses one fixed square tile (the reference's multi-tile aspect
grids are preprocessing-side).
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
from iaas_sglang_tpu.models.vision import clip_patchify, layer_norm

_VM = "vision_model.|model.vision_model."


def llama4_vision_rope(grid: int, head_dim: int, theta: float):
    """(cos, sin) [grid*grid+1, head_dim/2]: first fd/2 pairs rotate by
    (col+1)*freq, the rest by (row+1)*freq; the trailing CLS row is zero
    (HF Llama4VisionRotaryEmbedding)."""
    fd = head_dim // 2
    rf = 1.0 / theta ** (np.arange(0, fd, 2)[: fd // 2]
                         .astype(np.float64) / fd)
    pos = np.arange(grid * grid)
    col, row = pos % grid, pos // grid
    ang = np.zeros((grid * grid + 1, fd), np.float64)
    ang[:-1, : fd // 2] = np.outer(col + 1, rf)
    ang[:-1, fd // 2:] = np.outer(row + 1, rf)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class Llama4ForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        vc = config.vision_config or {}
        self.v_hidden = vc.get("hidden_size", 1408)
        self.v_layers = vc.get("num_hidden_layers", 34)
        self.v_heads = vc.get("num_attention_heads", 16)
        self.v_inter = vc.get("intermediate_size", 5632)
        self.patch = vc.get("patch_size", 14)
        self.image_size = vc.get("image_size", 336)
        self.grid = self.image_size // self.patch
        self.shuffle = vc.get("pixel_shuffle_ratio", 0.5)
        self.pj_in = vc.get("projector_input_dim", 4096)
        self.pj_out = vc.get("projector_output_dim", 4096)
        self.v_out = vc.get("vision_output_dim", self.pj_out)
        self.v_eps = vc.get("norm_eps", 1e-5)
        self._rope = llama4_vision_rope(
            self.grid, self.v_hidden // self.v_heads,
            vc.get("rope_theta", 10000))

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
        return int(self.grid * self.grid * self.shuffle * self.shuffle)

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.patch)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                key = "|".join("language_model." + alt
                               for alt in key.split("|"))
            s[name] = dataclasses.replace(spec, hf_key=key)

        Hv, Iv, p, L = self.v_hidden, self.v_inter, self.patch, self.v_layers
        P = self.grid * self.grid

        def k(suffix):
            return "|".join(pref + suffix for pref in _VM.split("|"))

        s["vt.patch_w"] = WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("patch_embedding.linear.weight"), transpose=True)
        s["vt.cls"] = WeightSpec((Hv,), (None,), k("class_embedding"))
        s["vt.pos_emb"] = WeightSpec(
            (P + 1, Hv), (None, None), k("positional_embedding_vlm"))
        for nm in ("layernorm_pre", "layernorm_post"):
            s[f"vt.{nm}_w"] = WeightSpec((Hv,), (None,), k(nm + ".weight"))
            s[f"vt.{nm}_b"] = WeightSpec((Hv,), (None,), k(nm + ".bias"))
        lk = "model.layers.{l}."
        per_layer = {
            "ln1_w": ("input_layernorm.weight", (Hv,), False),
            "ln1_b": ("input_layernorm.bias", (Hv,), False),
            "ln2_w": ("post_attention_layernorm.weight", (Hv,), False),
            "ln2_b": ("post_attention_layernorm.bias", (Hv,), False),
            "wq": ("self_attn.q_proj.weight", (Hv, Hv), True),
            "bq": ("self_attn.q_proj.bias", (Hv,), False),
            "wk": ("self_attn.k_proj.weight", (Hv, Hv), True),
            "bk": ("self_attn.k_proj.bias", (Hv,), False),
            "wv": ("self_attn.v_proj.weight", (Hv, Hv), True),
            "bv": ("self_attn.v_proj.bias", (Hv,), False),
            "wo": ("self_attn.o_proj.weight", (Hv, Hv), True),
            "bo": ("self_attn.o_proj.bias", (Hv,), False),
            "w1": ("mlp.fc1.weight", (Hv, Iv), True),
            "b1": ("mlp.fc1.bias", (Iv,), False),
            "w2": ("mlp.fc2.weight", (Iv, Hv), True),
            "b2": ("mlp.fc2.bias", (Hv,), False),
        }
        for name, (suffix, shape, tr) in per_layer.items():
            s[f"vt_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), k(lk + suffix),
                transpose=tr, stacked=True, num_stack=L)

        sh_in = int(self.v_hidden / (self.shuffle ** 2))
        s["va.fc1_w"] = WeightSpec(
            (sh_in, self.pj_in), (None, None),
            k("vision_adapter.mlp.fc1.weight"), transpose=True)
        s["va.fc2_w"] = WeightSpec(
            (self.pj_out, self.pj_out), (None, None),
            k("vision_adapter.mlp.fc2.weight"), transpose=True)
        s["mmp.w"] = WeightSpec(
            (self.v_out, self.config.hidden_size), (None, None),
            "multi_modal_projector.linear_1.weight"
            "|model.multi_modal_projector.linear_1.weight", transpose=True)
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows
        [N, (g*shuffle)^2, H]."""
        Hv, Nh = self.v_hidden, self.v_heads
        Dh = Hv // Nh
        N = patches.shape[0]
        g = self.grid
        eps = self.v_eps

        vt = params["vt"]
        h = patches @ vt["patch_w"]                          # [N, P, Hv]
        cls = jnp.broadcast_to(vt["cls"][None, None], (N, 1, Hv))
        h = jnp.concatenate([h, cls], axis=1) + vt["pos_emb"][None]
        h = layer_norm(h, vt["layernorm_pre_w"], vt["layernorm_pre_b"], eps)

        cos = jnp.asarray(self._rope[0])[None, :, None]   # [1, P+1, 1, fd]
        sin = jnp.asarray(self._rope[1])[None, :, None]

        def rope(x):
            x0, x1 = x[..., 0::2], x[..., 1::2]
            out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos],
                            axis=-1)
            return out.reshape(x.shape)

        scale = Dh ** -0.5

        def body(carry, lp):
            x = carry
            r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = rope((r @ lp["wq"] + lp["bq"]).reshape(N, -1, Nh, Dh)
                     .astype(jnp.float32))
            k_ = rope((r @ lp["wk"] + lp["bk"]).reshape(N, -1, Nh, Dh)
                      .astype(jnp.float32))
            v = (r @ lp["wv"] + lp["bv"]).reshape(N, -1, Nh, Dh)
            s_ = jnp.einsum("bqnd,bknd->bnqk", q, k_) * scale
            a = jax.nn.softmax(s_, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
            ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
            x = x + (ctx @ lp["wo"] + lp["bo"])
            r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
            inter = jax.nn.gelu((r2 @ lp["w1"] + lp["b1"]).astype(
                jnp.float32), approximate=False).astype(x.dtype)
            return x + (inter @ lp["w2"] + lp["b2"]), None

        h, _ = jax.lax.scan(body, h, params["vt_layers"])
        h = layer_norm(h, vt["layernorm_post_w"], vt["layernorm_post_b"],
                       eps)
        h = h[:, :-1]                                    # drop CLS

        # pixel shuffle ratio r (HF pixel_shuffle double-transpose chain)
        r = self.shuffle
        C = Hv
        gh = int(g * r)
        x = h.reshape(N, g, g, C)
        x = x.reshape(N, g, gh, int(C / r)).transpose(0, 2, 1, 3)
        x = x.reshape(N, gh, gh, int(C / (r * r))).transpose(0, 2, 1, 3)
        x = x.reshape(N, gh * gh, int(C / (r * r))).astype(jnp.float32)
        va = params["va"]
        x = jax.nn.gelu(x @ va["fc1_w"].astype(jnp.float32),
                        approximate=False)
        x = jax.nn.gelu(x @ va["fc2_w"].astype(jnp.float32),
                        approximate=False)
        out = x @ params["mmp"]["w"].astype(jnp.float32)
        return out.astype(params["mmp"]["w"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
