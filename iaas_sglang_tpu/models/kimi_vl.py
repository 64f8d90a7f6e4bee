"""Kimi-VL (reference: srt/models/kimi_vl.py KimiVLForConditionalGeneration
+ srt/models/kimi_vl_moonvit.py MoonVitPretrainedModel).

MoonViT tower ('vision_tower.*' keys): patch conv + learnable 2D position
embedding bicubic-interpolated from the trained (init_pos_emb_height x
init_pos_emb_width) grid to the serving grid (kimi_vl_moonvit.py:193
Learnable2DInterpPosEmb), interleaved 2D rope on pairs (even pair = column
angle, odd pair = row angle; kimi_vl_moonvit.py:294 Rope2DPosEmb), pre-LN
blocks with fused biased wqkv/wo and gelu-tanh MLP2 (fc0/fc1), final
layernorm, then a 2x2 patch merger and the multi_modal_projector
(pre_norm over D, linear_1 [4D->4D], QuickGELU, linear_2 [4D->H];
kimi_vl.py:90). The LM is the DeepSeek MLA family under the
'language_model.' prefix (kimi_vl.py:130-137).

Serving uses one fixed square tile (static shapes); the reference's native
dynamic resolution is preprocessing-side.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.deepseek_family import DeepseekFamilyForCausalLM
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.models.vision import clip_patchify, layer_norm

_VT = "vision_tower.|model.vision_tower."
_MMP = "multi_modal_projector.|model.multi_modal_projector."


def torch_bicubic_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] interpolation weights replicating torch's
    upsample_bicubic2d (cubic convolution a=-0.75, align_corners=False,
    border taps clamped)."""
    A = -0.75

    def kern(t):
        at = abs(t)
        if at <= 1:
            return (A + 2) * at ** 3 - (A + 3) * at ** 2 + 1
        if at < 2:
            return A * at ** 3 - 5 * A * at ** 2 + 8 * A * at - 4 * A
        return 0.0

    scale = in_size / out_size
    W = np.zeros((out_size, in_size), np.float64)
    for i in range(out_size):
        src = (i + 0.5) * scale - 0.5
        f = int(np.floor(src))
        for m in range(-1, 3):
            idx = min(max(f + m, 0), in_size - 1)
            W[i, idx] += kern(src - (f + m))
    return W.astype(np.float32)


def moonvit_rope_tables(h: int, w: int, head_dim: int,
                        theta: float = 10000.0):
    """(cos, sin) [h*w, head_dim/2] for the interleaved 2D rope: pair 2i
    rotates by col*freqs[i], pair 2i+1 by row*freqs[i]
    (kimi_vl_moonvit.py:309 precomputed_freqs_cis)."""
    freqs = 1.0 / theta ** (np.arange(0, head_dim, 4)[: head_dim // 4]
                            .astype(np.float64) / head_dim)     # [C/4]
    pos = np.arange(h * w)
    col, row = pos % w, pos // w
    ang = np.empty((h * w, head_dim // 2), np.float64)
    ang[:, 0::2] = np.outer(col, freqs)
    ang[:, 1::2] = np.outer(row, freqs)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


class MoonViTConfig:
    def __init__(self, vc: dict[str, Any]):
        vc = vc or {}
        self.patch_size = vc.get("patch_size", 14)
        self.pos_h = vc.get("init_pos_emb_height", 64)
        self.pos_w = vc.get("init_pos_emb_width", 64)
        self.num_heads = vc.get("num_attention_heads", 16)
        self.num_layers = vc.get("num_hidden_layers", 27)
        self.hidden_size = vc.get("hidden_size", 1152)
        self.intermediate_size = vc.get("intermediate_size", 4304)
        self.merge = tuple(vc.get("merge_kernel_size", (2, 2)))
        self.serving_size = vc.get("serving_image_size", 448)
        self.grid = self.serving_size // self.patch_size


class KimiVLForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = DeepseekFamilyForCausalLM(config)
        self.vc = MoonViTConfig(config.vision_config)
        vc = self.vc
        g = vc.grid
        # host precompute: pos-emb interpolation matrices + rope tables
        self._interp_h = torch_bicubic_matrix(vc.pos_h, g)
        self._interp_w = torch_bicubic_matrix(vc.pos_w, g)
        self._rope = moonvit_rope_tables(
            g, g, vc.hidden_size // vc.num_heads)

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
        g = self.vc.grid
        return (g // self.vc.merge[0]) * (g // self.vc.merge[1])

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
        Hv, Iv, L, p = (vc.hidden_size, vc.intermediate_size,
                        vc.num_layers, vc.patch_size)

        def k(suffix):
            return "|".join(pref + suffix for pref in _VT.split("|"))

        # conv [Hv, 3, p, p] -> matmul over flattened (c, i, j) patches
        s["vt.patch_w"] = WeightSpec(
            (3 * p * p, Hv), (None, None),
            k("patch_embed.proj.weight"), transpose=True,
            hf_pre=lambda t: t.reshape(t.shape[0], -1))
        s["vt.patch_b"] = WeightSpec((Hv,), (None,),
                                     k("patch_embed.proj.bias"))
        s["vt.pos_emb"] = WeightSpec(
            (vc.pos_h * vc.pos_w, Hv), (None, None),
            k("patch_embed.pos_emb.weight"),
            hf_pre=lambda t: t.reshape(-1, t.shape[-1]))
        s["vt.final_ln_w"] = WeightSpec(
            (Hv,), (None,), k("encoder.final_layernorm.weight"))
        s["vt.final_ln_b"] = WeightSpec(
            (Hv,), (None,), k("encoder.final_layernorm.bias"))
        lk = "encoder.blocks.{l}."
        per_layer = {
            "ln0_w": ("norm0.weight", (Hv,), False),
            "ln0_b": ("norm0.bias", (Hv,), False),
            "ln1_w": ("norm1.weight", (Hv,), False),
            "ln1_b": ("norm1.bias", (Hv,), False),
            "wqkv": ("wqkv.weight", (Hv, 3 * Hv), True),
            "bqkv": ("wqkv.bias", (3 * Hv,), False),
            "wo": ("wo.weight", (Hv, Hv), True),
            "bo": ("wo.bias", (Hv,), False),
            "w0": ("mlp.fc0.weight", (Hv, Iv), True),
            "b0": ("mlp.fc0.bias", (Iv,), False),
            "w1": ("mlp.fc1.weight", (Iv, Hv), True),
            "b1": ("mlp.fc1.bias", (Hv,), False),
        }
        for name, (suffix, shape, tr) in per_layer.items():
            s[f"vt_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), k(lk + suffix),
                transpose=tr, stacked=True, num_stack=L)

        D4 = Hv * vc.merge[0] * vc.merge[1]
        H = self.config.hidden_size

        def mk(suffix):
            return "|".join(pref + suffix for pref in _MMP.split("|"))

        s["mmp.pre_w"] = WeightSpec((Hv,), (None,), mk("pre_norm.weight"))
        s["mmp.pre_b"] = WeightSpec((Hv,), (None,), mk("pre_norm.bias"))
        s["mmp.l1_w"] = WeightSpec((D4, D4), (None, None),
                                   mk("linear_1.weight"), transpose=True)
        s["mmp.l1_b"] = WeightSpec((D4,), (None,), mk("linear_1.bias"))
        s["mmp.l2_w"] = WeightSpec((D4, H), (None, None),
                                   mk("linear_2.weight"), transpose=True)
        s["mmp.l2_b"] = WeightSpec((H,), (None,), mk("linear_2.bias"))
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected LM rows [N, (g/2)^2, H]."""
        vc = self.vc
        Hv, Nh = vc.hidden_size, vc.num_heads
        Dh = Hv // Nh
        g = vc.grid
        N = patches.shape[0]

        vt = params["vt"]
        # interpolated learnable position embedding (static matrices)
        pe = vt["pos_emb"].astype(jnp.float32).reshape(vc.pos_h, vc.pos_w,
                                                       Hv)
        pe = jnp.einsum("yh,hwd,xw->yxd", jnp.asarray(self._interp_h), pe,
                        jnp.asarray(self._interp_w)).reshape(g * g, Hv)
        h = (patches @ vt["patch_w"] + vt["patch_b"]) \
            + pe[None].astype(patches.dtype)

        cos = jnp.asarray(self._rope[0])[None, :, None]   # [1, P, 1, Dh/2]
        sin = jnp.asarray(self._rope[1])[None, :, None]

        def rope(x):
            x0, x1 = x[..., 0::2], x[..., 1::2]
            out = jnp.stack([x0 * cos - x1 * sin, x0 * sin + x1 * cos],
                            axis=-1)
            return out.reshape(x.shape)

        scale = Dh ** -0.5

        def body(carry, lp):
            x = carry
            r = layer_norm(x, lp["ln0_w"], lp["ln0_b"], 1e-5)
            qkv = r @ lp["wqkv"] + lp["bqkv"]
            q, k_, v = jnp.split(qkv, 3, axis=-1)
            q = rope(q.reshape(N, -1, Nh, Dh).astype(jnp.float32))
            k_ = rope(k_.reshape(N, -1, Nh, Dh).astype(jnp.float32))
            v = v.reshape(N, -1, Nh, Dh)
            s_ = jnp.einsum("bqnd,bknd->bnqk", q, k_) * scale
            a = jax.nn.softmax(s_, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
            ctx = ctx.reshape(N, -1, Hv).astype(x.dtype)
            x = x + (ctx @ lp["wo"] + lp["bo"])
            r2 = layer_norm(x, lp["ln1_w"], lp["ln1_b"], 1e-5)
            inter = jax.nn.gelu((r2 @ lp["w0"] + lp["b0"]).astype(
                jnp.float32), approximate=True).astype(x.dtype)
            return x + (inter @ lp["w1"] + lp["b1"]), None

        h, _ = jax.lax.scan(body, h, params["vt_layers"])
        h = layer_norm(h, vt["final_ln_w"], vt["final_ln_b"], 1e-5)

        # 2x2 patch merger (kimi_vl_moonvit.py:536): [N, g, g, Hv] ->
        # [N, T, kh*kw, Hv]; projector pre-norms over Hv then flattens
        kh, kw = vc.merge
        nh, nw = g // kh, g // kw
        h = h.reshape(N, nh, kh, nw, kw, Hv).transpose(0, 1, 3, 2, 4, 5)
        h = h.reshape(N, nh * nw, kh * kw, Hv)
        mmp = params["mmp"]
        x = layer_norm(h.astype(jnp.float32), mmp["pre_w"], mmp["pre_b"],
                       1e-5).reshape(N, nh * nw, kh * kw * Hv)
        x = x @ mmp["l1_w"].astype(jnp.float32) + mmp["l1_b"]
        x = x * jax.nn.sigmoid(1.702 * x)     # QuickGELU (kimi_vl.py:104)
        x = x @ mmp["l2_w"].astype(jnp.float32) + mmp["l2_b"]
        return x.astype(mmp["l2_w"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
