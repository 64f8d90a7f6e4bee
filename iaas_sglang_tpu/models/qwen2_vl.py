"""Qwen2-VL vision-language model (reference: srt/models/qwen2_vl.py).

Pieces:
  * Qwen2 ViT: flattened-patch embedding (the host preprocess emits patches
    in 2x2 merge-block order), 2D rotary position embedding applied to q/k
    (cos/sin computed HOST-side from the static grid and passed in — no
    traced pos-id gymnastics), full attention per image, PatchMerger
    (ln_q + 2-layer MLP over 2x2 blocks) into LM space.
  * MRope in the LM (reference rotary_embedding.py:427 MRotaryEmbedding):
    3D (t, h, w) positions over the prompt + a constant per-request delta
    for decode — see compute_mrope_positions / apply_rope(mrope_section).

Static-shape discipline: images are resized to fixed grid buckets, so the
tower compiles once per bucket and the MXU sees fixed [S, E] matmuls.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import _act, layer_norm

_LM_PREFIXES = ("model.language_model.", "model.")
_VT_PREFIX = ("model.visual.", "visual.")


class Qwen2VLVisionConfig:
    def __init__(self, vc: dict[str, Any]):
        self.depth = vc.get("depth", 32)
        self.embed_dim = vc.get("embed_dim", 1280)
        self.num_heads = vc.get("num_heads", 16)
        self.mlp_ratio = vc.get("mlp_ratio", 4)
        self.patch_size = vc.get("patch_size", 14)
        self.temporal_patch_size = vc.get("temporal_patch_size", 2)
        self.spatial_merge_size = vc.get("spatial_merge_size", 2)
        self.in_channels = vc.get("in_channels", vc.get("in_chans", 3))
        self.hidden_act = vc.get("hidden_act", "quick_gelu")
        self.out_hidden = vc.get("hidden_size", 0)  # LM hidden size
        self.head_dim = self.embed_dim // self.num_heads
        self.patch_dim = (self.in_channels * self.temporal_patch_size
                          * self.patch_size * self.patch_size)


def vision_rope_cos_sin(grid: tuple[int, int, int],
                        vc: Qwen2VLVisionConfig) -> tuple[np.ndarray, np.ndarray]:
    """Host-side 2D rotary tables for one image's patch sequence
    (HF Qwen2VisionTransformer.rot_pos_emb): per-patch (h, w) ids in
    merge-block order, each feeding head_dim//4 frequency channels;
    returns cos/sin [S, head_dim] (rotate_half convention)."""
    t, h, w = grid
    m = vc.spatial_merge_size
    hpos = np.arange(h)[:, None].repeat(w, 1)
    wpos = np.arange(w)[None, :].repeat(h, 0)

    def blocked(x):
        return x.reshape(h // m, m, w // m, m).transpose(0, 2, 1, 3).reshape(-1)

    hpos, wpos = blocked(hpos), blocked(wpos)
    dim = vc.head_dim // 2
    inv = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    fh = hpos[:, None] * inv[None, :]        # [S, head_dim/4]
    fw = wpos[:, None] * inv[None, :]
    freqs = np.concatenate([fh, fw], axis=-1)           # [S, head_dim/2]
    freqs = np.tile(freqs, (t, 1))
    emb = np.concatenate([freqs, freqs], axis=-1)       # [S, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


def compute_mrope_positions(input_ids_len: int, mm_spans: list,
                            ) -> tuple[np.ndarray, int]:
    """3D (t, h, w) positions over a prompt with image spans
    (HF Qwen2VLModel.get_rope_index, images only). mm_spans:
    [(offset, num_tokens, (lt, lh, lw))] with llm-grid dims (post-merge).
    Returns (pos3 i32[3, L], mrope_delta) — decode positions are
    seq_pos + delta on all three streams."""
    pos3 = np.zeros((3, input_ids_len), dtype=np.int32)
    spans = sorted(mm_spans, key=lambda s: s[0])
    st = 0
    i = 0
    si = 0
    while i < input_ids_len:
        if si < len(spans) and spans[si][0] == i:
            off, n, (lt, lh, lw) = spans[si]
            tt = np.repeat(np.arange(lt), lh * lw)
            hh = np.tile(np.repeat(np.arange(lh), lw), lt)
            ww = np.tile(np.arange(lw), lt * lh)
            pos3[0, i : i + n] = st + tt
            pos3[1, i : i + n] = st + hh
            pos3[2, i : i + n] = st + ww
            st += max(lt, lh, lw)
            i += n
            si += 1
        else:
            pos3[:, i] = st
            st += 1
            i += 1
    return pos3, st - input_ids_len


class Qwen2VLForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.vc = Qwen2VLVisionConfig(config.vision_config)
        self.vc.out_hidden = self.vc.out_hidden or config.hidden_size

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

    def vision_host_tables(self, grid):
        """Grid-static host tables passed to encode_images (the runner
        AOT-compiles one tower program per grid bucket)."""
        cos, sin = vision_rope_cos_sin(grid, self.vc)
        return (cos, sin)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        import dataclasses

        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None and key.startswith("model."):
                key = "|".join(p + key[len("model."):] for p in _LM_PREFIXES)
            s[name] = dataclasses.replace(spec, hf_key=key)
        vc = self.vc
        E, Iv = vc.embed_dim, int(vc.embed_dim * vc.mlp_ratio)
        Hm = E * vc.spatial_merge_size ** 2
        Ho = vc.out_hidden

        def k(suffix: str) -> str:
            return "|".join(p + suffix for p in _VT_PREFIX)

        s["vt.patch_w"] = WeightSpec(
            (vc.patch_dim, E), (None, None),
            k("patch_embed.proj.weight"), transpose=True)
        per_layer = {
            "ln1_w": ("norm1.weight", (E,), False),
            "ln1_b": ("norm1.bias", (E,), False),
            "ln2_w": ("norm2.weight", (E,), False),
            "ln2_b": ("norm2.bias", (E,), False),
            "wqkv": ("attn.qkv.weight", (E, 3 * E), True),
            "bqkv": ("attn.qkv.bias", (3 * E,), False),
            "wo": ("attn.proj.weight", (E, E), True),
            "bo": ("attn.proj.bias", (E,), False),
            "w1": ("mlp.fc1.weight", (E, Iv), True),
            "b1": ("mlp.fc1.bias", (Iv,), False),
            "w2": ("mlp.fc2.weight", (Iv, E), True),
            "b2": ("mlp.fc2.bias", (E,), False),
        }
        for name, (suffix, shape, tr) in per_layer.items():
            s[f"vt_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape),
                k("blocks.{l}." + suffix),
                transpose=tr, stacked=True, num_stack=vc.depth)
        s["mm.ln_q_w"] = WeightSpec((E,), (None,), k("merger.ln_q.weight"))
        s["mm.ln_q_b"] = WeightSpec((E,), (None,), k("merger.ln_q.bias"))
        s["mm.mlp0_w"] = WeightSpec((Hm, Hm), (None, None),
                                    k("merger.mlp.0.weight"), transpose=True)
        s["mm.mlp0_b"] = WeightSpec((Hm,), (None,), k("merger.mlp.0.bias"))
        s["mm.mlp2_w"] = WeightSpec((Hm, Ho), (None, None),
                                    k("merger.mlp.2.weight"), transpose=True)
        s["mm.mlp2_b"] = WeightSpec((Ho,), (None,), k("merger.mlp.2.bias"))
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any], patches: jnp.ndarray,
                      rope_cos: jnp.ndarray, rope_sin: jnp.ndarray
                      ) -> jnp.ndarray:
        """patches [N, S, patch_dim] (same grid per batch) + host rope
        tables [S, head_dim] -> merged LM-space rows [N, S/m^2, H]."""
        vc = self.vc
        E, Nh, Dh = vc.embed_dim, vc.num_heads, vc.head_dim
        N, S, _ = patches.shape
        eps = 1e-6
        act = _act(vc.hidden_act)
        scale = Dh ** -0.5
        cos = rope_cos[None, :, None, :]        # [1, S, 1, Dh]
        sin = rope_sin[None, :, None, :]

        x = patches @ params["vt"]["patch_w"]   # [N, S, E]

        def rot_half(v):
            h1, h2 = v[..., : Dh // 2], v[..., Dh // 2 :]
            return jnp.concatenate([-h2, h1], axis=-1)

        def body(carry, lp):
            h = carry
            r = layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)
            qkv = (r @ lp["wqkv"] + lp["bqkv"]).reshape(N, S, 3, Nh, Dh)
            q = qkv[:, :, 0].astype(jnp.float32)
            k_ = qkv[:, :, 1].astype(jnp.float32)
            v = qkv[:, :, 2].astype(jnp.float32)
            q = q * cos + rot_half(q) * sin
            k_ = k_ * cos + rot_half(k_) * sin
            sc = jnp.einsum("bqnd,bknd->bnqk", q, k_) * scale
            a = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v).reshape(N, S, E)
            h = h + (ctx.astype(h.dtype) @ lp["wo"] + lp["bo"])
            r2 = layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
            h = h + (act(r2 @ lp["w1"] + lp["b1"]) @ lp["w2"] + lp["b2"])
            return h, None

        x, _ = jax.lax.scan(body, x, params["vt_layers"])
        # PatchMerger: consecutive m^2 rows are one spatial block
        mm = params["mm"]
        x = layer_norm(x, mm["ln_q_w"], mm["ln_q_b"], eps)
        m2 = vc.spatial_merge_size ** 2
        x = x.reshape(N, S // m2, m2 * E)
        x = jax.nn.gelu(x @ mm["mlp0_w"] + mm["mlp0_b"], approximate=False)
        return x @ mm["mlp2_w"] + mm["mlp2_b"]          # [N, S/m2, H]

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)


class Qwen25VLVisionConfig:
    def __init__(self, vc: dict[str, Any]):
        self.depth = vc.get("depth", 32)
        self.embed_dim = vc.get("hidden_size", 1280)
        self.num_heads = vc.get("num_heads", 16)
        self.intermediate = vc.get("intermediate_size", 3420)
        self.patch_size = vc.get("patch_size", 14)
        self.temporal_patch_size = vc.get("temporal_patch_size", 2)
        self.spatial_merge_size = vc.get("spatial_merge_size", 2)
        self.in_channels = vc.get("in_channels", vc.get("in_chans", 3))
        self.hidden_act = vc.get("hidden_act", "silu")
        self.out_hidden = vc.get("out_hidden_size", 0)
        self.window_size = vc.get("window_size", 112)
        self.fullatt_block_indexes = vc.get(
            "fullatt_block_indexes", [7, 15, 23, 31])
        self.head_dim = self.embed_dim // self.num_heads
        self.patch_dim = (self.in_channels * self.temporal_patch_size
                          * self.patch_size * self.patch_size)


def window_order(grid: tuple[int, int, int], vc: Qwen25VLVisionConfig
                 ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host replication of HF Qwen2_5_VisionTransformer.get_window_index:
    returns (patch-level window permutation [S], per-patch window segment
    id in window order [S], merge-unit inverse permutation [U])."""
    t, h, w = grid
    m = vc.spatial_merge_size
    m2 = m * m
    lh, lw = h // m, w // m
    win = vc.window_size // m // vc.patch_size
    index = np.arange(t * lh * lw).reshape(t, lh, lw)
    pad_h = (-lh) % win or 0
    pad_w = (-lw) % win or 0
    nh, nw = (lh + pad_h) // win, (lw + pad_w) // win
    padded = np.full((t, lh + pad_h, lw + pad_w), -100, np.int64)
    padded[:, :lh, :lw] = index
    padded = padded.reshape(t, nh, win, nw, win).transpose(0, 1, 3, 2, 4)
    padded = padded.reshape(t, nh * nw, win, win)
    seqlens = (padded != -100).sum(axis=(2, 3)).reshape(-1)   # units/window
    flat = padded.reshape(-1)
    unit_index = flat[flat != -100]                           # [U]
    # patch-level permutation: each merge unit is m^2 consecutive patches
    perm = (unit_index[:, None] * m2 + np.arange(m2)[None, :]).reshape(-1)
    seg = np.repeat(np.arange(len(seqlens)), seqlens * m2).astype(np.int32)
    inv_units = np.argsort(unit_index).astype(np.int32)
    return perm.astype(np.int32), seg, inv_units


class Qwen25VLForConditionalGeneration(Qwen2VLForConditionalGeneration):
    """Qwen2.5-VL (reference srt/models/qwen2_5_vl.py): windowed ViT
    (full attention only at fullatt_block_indexes), RMSNorm blocks,
    gated-SiLU vision MLP; LM side identical MRope Qwen2.5."""

    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.vc = Qwen25VLVisionConfig(config.vision_config)
        self.vc.out_hidden = self.vc.out_hidden or config.hidden_size
        self.is_full = jnp.zeros(self.vc.depth, jnp.bool_).at[
            jnp.asarray(self.vc.fullatt_block_indexes)].set(True)

    def vision_host_tables(self, grid):
        cos, sin = vision_rope_cos_sin(grid, self.vc)
        perm, seg, inv_units = window_order(grid, self.vc)
        # rope tables are built in merge-block order; the tower runs in
        # window order, so gather them by the permutation host-side
        cos, sin = cos[perm], sin[perm]
        win_mask = seg[:, None] == seg[None, :]               # [S, S]
        return (cos, sin, jnp.asarray(perm), jnp.asarray(inv_units),
                jnp.asarray(win_mask))

    def weight_specs(self) -> dict[str, WeightSpec]:
        import dataclasses

        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None and key.startswith("model."):
                key = "|".join(p + key[len("model."):] for p in _LM_PREFIXES)
            s[name] = dataclasses.replace(spec, hf_key=key)
        vc = self.vc
        E, Iv = vc.embed_dim, vc.intermediate
        Hm = E * vc.spatial_merge_size ** 2
        Ho = vc.out_hidden

        def k(suffix: str) -> str:
            return "|".join(p + suffix for p in _VT_PREFIX)

        s["vt.patch_w"] = WeightSpec(
            (vc.patch_dim, E), (None, None),
            k("patch_embed.proj.weight"), transpose=True)
        per_layer = {
            "ln1_w": ("norm1.weight", (E,), False),
            "ln2_w": ("norm2.weight", (E,), False),
            "wqkv": ("attn.qkv.weight", (E, 3 * E), True),
            "bqkv": ("attn.qkv.bias", (3 * E,), False),
            "wo": ("attn.proj.weight", (E, E), True),
            "bo": ("attn.proj.bias", (E,), False),
            "wg": ("mlp.gate_proj.weight", (E, Iv), True),
            "bg": ("mlp.gate_proj.bias", (Iv,), False),
            "wu": ("mlp.up_proj.weight", (E, Iv), True),
            "bu": ("mlp.up_proj.bias", (Iv,), False),
            "wd": ("mlp.down_proj.weight", (Iv, E), True),
            "bd": ("mlp.down_proj.bias", (E,), False),
        }
        for name, (suffix, shape, tr) in per_layer.items():
            s[f"vt_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape),
                k("blocks.{l}." + suffix),
                transpose=tr, stacked=True, num_stack=vc.depth)
        s["mm.ln_q_w"] = WeightSpec((E,), (None,), k("merger.ln_q.weight"))
        s["mm.mlp0_w"] = WeightSpec((Hm, Hm), (None, None),
                                    k("merger.mlp.0.weight"), transpose=True)
        s["mm.mlp0_b"] = WeightSpec((Hm,), (None,), k("merger.mlp.0.bias"))
        s["mm.mlp2_w"] = WeightSpec((Hm, Ho), (None, None),
                                    k("merger.mlp.2.weight"), transpose=True)
        s["mm.mlp2_b"] = WeightSpec((Ho,), (None,), k("merger.mlp.2.bias"))
        return s

    def encode_images(self, params: dict[str, Any], patches: jnp.ndarray,
                      rope_cos, rope_sin, perm, inv_units, win_mask
                      ) -> jnp.ndarray:
        """patches [N, S, patch_dim] in merge-block order -> merged
        LM-space rows [N, U, H] in merge-block (original) order."""
        from iaas_sglang_tpu.layers.norms import rms_norm

        vc = self.vc
        E, Nh, Dh = vc.embed_dim, vc.num_heads, vc.head_dim
        N, S, _ = patches.shape
        eps = 1e-6
        scale = Dh ** -0.5
        cos = rope_cos[None, :, None, :]
        sin = rope_sin[None, :, None, :]

        x = patches @ params["vt"]["patch_w"]
        x = x[:, perm]                      # window order

        def rot_half(v):
            h1, h2 = v[..., : Dh // 2], v[..., Dh // 2 :]
            return jnp.concatenate([-h2, h1], axis=-1)

        full_mask = jnp.ones_like(win_mask)

        def body(carry, xs):
            h = carry
            lp, is_full = xs
            mask = jnp.where(is_full, full_mask, win_mask)  # [S, S]
            r = rms_norm(h, lp["ln1_w"], eps)
            qkv = (r @ lp["wqkv"] + lp["bqkv"]).reshape(N, S, 3, Nh, Dh)
            q = qkv[:, :, 0].astype(jnp.float32)
            k_ = qkv[:, :, 1].astype(jnp.float32)
            v = qkv[:, :, 2].astype(jnp.float32)
            q = q * cos + rot_half(q) * sin
            k_ = k_ * cos + rot_half(k_) * sin
            sc = jnp.einsum("bqnd,bknd->bnqk", q, k_) * scale
            sc = jnp.where(mask[None, None], sc, -jnp.inf)
            a = jax.nn.softmax(sc, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v).reshape(N, S, E)
            h = h + (ctx.astype(h.dtype) @ lp["wo"] + lp["bo"])
            r2 = rms_norm(h, lp["ln2_w"], eps)
            g = r2 @ lp["wg"] + lp["bg"]
            u = r2 @ lp["wu"] + lp["bu"]
            h = h + ((jax.nn.silu(g) * u) @ lp["wd"] + lp["bd"])
            return h, None

        x, _ = jax.lax.scan(body, x, (params["vt_layers"], self.is_full))
        mm = params["mm"]
        x = rms_norm(x, mm["ln_q_w"], eps)
        m2 = vc.spatial_merge_size ** 2
        x = x.reshape(N, S // m2, m2 * E)
        x = jax.nn.gelu(x @ mm["mlp0_w"] + mm["mlp0_b"], approximate=False)
        x = x @ mm["mlp2_w"] + mm["mlp2_b"]                 # [N, U, H]
        return x[:, inv_units]                              # original order
