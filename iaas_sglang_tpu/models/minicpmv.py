"""MiniCPM-V 2.5/2.6 (reference: srt/models/minicpmv.py MiniCPMV2_6 +
srt/models/idefics2.py Idefics2VisionTransformer).

Composition: the Idefics2/NaViT-style SigLIP tower ('vpm.*' keys — biased
patch conv, bucketized position-embedding lookup, biased q/k/v/out blocks,
optional post_layernorm, optionally dropping the last layer) feeds the
perceiver Resampler ('resampler.*': ln_kv(kv_proj(x)) keys with additive
2D-sincos position embedding, ln_q(query) queries, one fused
MultiheadAttention, ln_post + raw [D, D] proj) producing `query_num` rows
per image for the 'llm.'-prefixed LM (qwen2 for 2.6, llama for 2.5).

Serving uses one fixed square tile (static shapes); the reference's
adaptive slicing is preprocessing-side. Version 2.0 (timm resampler with
learned grid) is not supported.
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

_VPM = "vpm.|model.vpm."
_RS = "resampler.|model.resampler."


def sincos_2d(embed_dim: int, h: int, w: int) -> np.ndarray:
    """[h*w, embed_dim] 2D sin-cos table (reference minicpmv.py:92
    get_2d_sincos_pos_embed version (2,5): [emb_h; emb_w] concat)."""

    def sincos_1d(dim, pos):
        omega = np.arange(dim // 2, dtype=np.float32) / (dim / 2.0)
        omega = 1.0 / 10000 ** omega
        out = np.outer(pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    # reference meshgrid(w, h): grid[0][i, j] = j (COLUMN coord) — the
    # first dim-half encodes the column index, the second the row index
    col = np.tile(np.arange(w, dtype=np.float32), h)          # [h*w]
    row = np.repeat(np.arange(h, dtype=np.float32), w)
    emb_c = sincos_1d(embed_dim // 2, col)
    emb_r = sincos_1d(embed_dim // 2, row)
    return np.concatenate([emb_c, emb_r], axis=1)   # [h*w, D]


class MiniCPMV:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        hf = config.hf_config
        version = hf.get("version")
        if version is not None and float(version) < 2.5:
            raise ValueError("MiniCPM-V 2.0 (timm resampler) not supported")
        self.vc = SiglipVisionConfig(config.vision_config)
        # serving tile: fixed square (reference slices adaptively)
        self.serving_size = (config.vision_config or {}).get(
            "serving_image_size", 448)
        self.grid = self.serving_size // self.vc.patch_size
        self.drop_last = hf.get("drop_vision_last_layer", False)
        self.query_num = hf.get("query_num", 64)
        D = config.hidden_size
        # reference Resampler num_heads = embed_dim // 128 (minicpmv.py:309);
        # floor to 1 for tiny test configs
        self.rs_heads = max(1, D // 128)
        # bucketized position ids for the serving grid (idefics2.py:206)
        side = self.vc.image_size // self.vc.patch_size
        bounds = np.arange(1, side) / side
        frac = np.arange(0, 1 - 1e-6, 1 / self.grid)
        bucket = np.searchsorted(bounds, frac, side="right")
        self.pos_ids = (bucket[:, None] * side + bucket[None, :]
                        ).reshape(-1).astype(np.int32)
        self.rs_pos = sincos_2d(D, self.grid, self.grid)   # [P, D]

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
        return self.query_num

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

        vc = self.vc
        Hv, Iv = vc.hidden_size, vc.intermediate_size
        L = vc.num_layers - (1 if self.drop_last else 0)
        p = vc.patch_size
        side = vc.image_size // p

        def k(suffix):
            return "|".join(pref + suffix for pref in _VPM.split("|"))

        s["vt.patch_w"] = WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("embeddings.patch_embedding.weight"), transpose=True)
        s["vt.patch_b"] = WeightSpec(
            (Hv,), (None,), k("embeddings.patch_embedding.bias"))
        s["vt.pos_emb"] = WeightSpec(
            (side * side, Hv), (None, None),
            k("embeddings.position_embedding.weight"))
        s["vt.post_ln_w"] = WeightSpec((Hv,), (None,),
                                       k("post_layernorm.weight"))
        s["vt.post_ln_b"] = WeightSpec((Hv,), (None,),
                                       k("post_layernorm.bias"))
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

        D, Q = self.config.hidden_size, self.query_num

        def rk(suffix):
            return "|".join(pref + suffix for pref in _RS.split("|"))

        s["rs.query"] = WeightSpec((Q, D), (None, None), rk("query"))
        s["rs.kv_w"] = WeightSpec((Hv, D), (None, None),
                                  rk("kv_proj.weight"), transpose=True)
        s["rs.in_w"] = WeightSpec((D, 3 * D), (None, None),
                                  rk("attn.in_proj_weight"), transpose=True)
        s["rs.in_b"] = WeightSpec((3 * D,), (None,), rk("attn.in_proj_bias"))
        s["rs.out_w"] = WeightSpec((D, D), (None, None),
                                   rk("attn.out_proj.weight"), transpose=True)
        s["rs.out_b"] = WeightSpec((D,), (None,), rk("attn.out_proj.bias"))
        for nm in ("ln_q", "ln_kv", "ln_post"):
            s[f"rs.{nm}_w"] = WeightSpec((D,), (None,), rk(f"{nm}.weight"))
            s[f"rs.{nm}_b"] = WeightSpec((D,), (None,), rk(f"{nm}.bias"))
        s["rs.proj"] = WeightSpec((D, D), (None, None), rk("proj"))
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> resampled LM rows [N, query_num, D]."""
        vc = self.vc
        Hv, Nh = vc.hidden_size, vc.num_heads
        Dh = Hv // Nh
        eps = vc.layer_norm_eps
        N = patches.shape[0]

        vt = params["vt"]
        h = (patches @ vt["patch_w"] + vt["patch_b"]) \
            + vt["pos_emb"][jnp.asarray(self.pos_ids)][None]
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
        h = layer_norm(h, vt["post_ln_w"], vt["post_ln_b"], eps)

        # perceiver resampler (reference minicpmv.py:309 Resampler2_5)
        rs = params["rs"]
        D = self.config.hidden_size
        Rh = self.rs_heads
        Rd = D // Rh
        kv = h.astype(jnp.float32) @ rs["kv_w"].astype(jnp.float32)
        kv = layer_norm(kv, rs["ln_kv_w"], rs["ln_kv_b"], 1e-5)
        q0 = layer_norm(rs["query"].astype(jnp.float32),
                        rs["ln_q_w"], rs["ln_q_b"], 1e-5)       # [Q, D]
        wq, wk, wv = jnp.split(rs["in_w"].astype(jnp.float32), 3, axis=1)
        bq, bk, bv = jnp.split(rs["in_b"].astype(jnp.float32), 3)
        pos = jnp.asarray(self.rs_pos, jnp.float32)[None]       # [1, P, D]
        Q = q0.shape[0]
        qh = (q0 @ wq + bq).reshape(Q, Rh, Rd)
        kh = ((kv + pos) @ wk + bk).reshape(N, -1, Rh, Rd)
        vh = (kv @ wv + bv).reshape(N, -1, Rh, Rd)
        s_ = jnp.einsum("qnd,bknd->bnqk", qh, kh) * (Rd ** -0.5)
        a = jax.nn.softmax(s_, axis=-1)
        ctx = jnp.einsum("bnqk,bknd->bqnd", a, vh).reshape(N, Q, D)
        out = ctx @ rs["out_w"].astype(jnp.float32) + rs["out_b"]
        out = layer_norm(out, rs["ln_post_w"], rs["ln_post_b"], 1e-5)
        out = out @ rs["proj"].astype(jnp.float32)
        return out.astype(params["rs"]["proj"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
