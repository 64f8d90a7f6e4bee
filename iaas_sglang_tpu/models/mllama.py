"""Mllama — Llama 3.2 Vision (reference: srt/models/mllama.py
MllamaForConditionalGeneration).

Text model: llama self-attention layers with gated CROSS-ATTENTION layers
interleaved at config.cross_attention_layers (mllama.py:587): per cross
layer, q (per-head RMSNorm, no rope) attends the vision encoder's
projected output; the attention and MLP branches are tanh-gated and rows
of sequences without an image are masked out entirely
(full_text_row_masked_out_mask, mllama.py:940 — per SEQUENCE, matching the
reference's decode/extend masks; the reference's per-position
cross_attention_mask is a TODO there too).

TPU-native cross-attention KV: the flat page space [L*(P+1), ps, 2Nk, D]
keeps one slice per text layer; a CROSS layer's slice stores the ENCODER
K/V for in-flight requests (written once per request by
`write_cross_kv`, read every step through the paged decode-attention path
with per-token page tables). Self layers run as ordinary llama segments:
the weight stacks are split into `self_layers` (lax.scan via the llama
family, sliced per contiguous segment) and `cross_layers`.

Vision tower (HF MllamaVisionModel): bias-less patch conv, gated
pre/post-tile aspect-ratio embeddings, prepended CLS, gated positional
embedding, pad-to-8 patch rows (padding keys masked), 2-stage encoder
(local layers + gated global layers), intermediate hidden states
(inputs of intermediate_layers_indices, pre-post-norm) concatenated onto
the final state, then the biased multi_modal_projector. Serving uses ONE
tile (aspect ratio (1,1)); multi-tile grids are preprocessing-side.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.models.llama_family import (LlamaFamilyForCausalLM,
                                                  WeightSpec)
from iaas_sglang_tpu.models.vision import clip_patchify, layer_norm
from iaas_sglang_tpu.ops.attention import paged_attention, write_kv_pages

_VM = "vision_model.|model.vision_model."


def _lm_key(alt: str) -> str:
    """Checkpoint ('language_model.model.*') and HF>=4.52
    ('model.language_model.*') key layouts."""
    outs = ["language_model." + alt]
    if alt.startswith("model."):
        outs.append("model.language_model." + alt[len("model."):])
    elif alt.startswith("lm_head"):
        outs.append(alt)
    return "|".join(outs)


class MllamaForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = config.hf_config
        tc = hf.get("text_config") or {}
        self.cross_idx = list(tc.get("cross_attention_layers") or [])
        self.self_idx = [i for i in range(c.num_layers)
                         if i not in self.cross_idx]
        self.self_ord = {g: i for i, g in enumerate(self.self_idx)}
        self.cross_ord = {g: i for i, g in enumerate(self.cross_idx)}
        # contiguous segments in global layer order
        self.segments: list[tuple[str, int, int]] = []   # (kind, lo, n)
        i = 0
        while i < c.num_layers:
            if i in self.cross_ord:
                self.segments.append(("cross", i, 1))
                i += 1
            else:
                j = i
                while j < c.num_layers and j not in self.cross_ord:
                    j += 1
                self.segments.append(("self", i, j - i))
                i = j

        mc_self = copy.copy(config)
        mc_self.num_layers = len(self.self_idx)
        self.lm = LlamaFamilyForCausalLM(mc_self)

        vc = config.vision_config or {}
        self.vc = vc
        self.v_hidden = vc.get("hidden_size", 1280)
        self.v_heads = vc.get("attention_heads", 16)
        self.v_inter = vc.get("intermediate_size", 5120)
        self.v_layers = vc.get("num_hidden_layers", 32)
        self.v_global = vc.get("num_global_layers", 8)
        self.patch = vc.get("patch_size", 14)
        self.image_size = vc.get("image_size", 560)
        self.grid = self.image_size // self.patch
        self.num_patches = self.grid * self.grid + 1      # + CLS
        self.max_tiles = vc.get("max_num_tiles", 4)
        self.max_ar = vc.get("max_aspect_ratio_id",
                             len(vc.get("supported_aspect_ratios") or [0]))
        self.inter_idx = list(vc.get("intermediate_layers_indices")
                              or [3, 7, 15, 23, 30])
        self.v_out = vc.get("vision_output_dim",
                            self.v_hidden * (1 + len(self.inter_idx)))
        self.v_eps = vc.get("norm_eps", 1e-5)
        # single-tile serving: aspect ratio id of the (1, 1) grid
        sar = vc.get("supported_aspect_ratios") or []
        self.ar_id = (sar.index([1, 1]) + 1) if [1, 1] in sar else 1

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
        return (2 * self.config.num_kv_heads, self.config.head_dim)

    def kv_shard_dims(self):
        return (None, None, None, None)

    def num_image_tokens(self) -> int:
        """Encoder rows per image (one tile)."""
        return self.num_patches

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.patch)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            if name in ("embed", "final_norm", "lm_head", "lm_head_bias") \
                    or name.startswith("final_norm"):
                continue        # wrapper owns these (V+8 embed rows)
            key = spec.hf_key
            if key is not None:
                key = "|".join(_lm_key(alt) for alt in key.split("|"))
            if spec.stacked and name.startswith("layers."):
                s[name] = dataclasses.replace(
                    spec, hf_key=key, layer_map=list(self.self_idx))
            else:
                s[name] = dataclasses.replace(spec, hf_key=key)

        H, V = c.hidden_size, c.vocab_size
        Nq, Nk, D = c.num_heads, c.num_kv_heads, c.head_dim
        I = c.intermediate_size
        # <|image|> (= V) and the other 8 special rows live past vocab_size
        s["embed"] = WeightSpec(
            (V + 8, H), (None, "tp"), _lm_key("model.embed_tokens.weight"))
        s["final_norm"] = WeightSpec(
            (H,), (None,), _lm_key("model.norm.weight"))
        s["lm_head"] = WeightSpec(
            (H, V), (None, "tp"), _lm_key("lm_head.weight"),
            transpose=True)

        xk = "model.layers.{l}.cross_attn."
        xl = "model.layers.{l}."
        cross = {
            "wq": (xk + "q_proj.weight", (H, Nq * D), True),
            "wk": (xk + "k_proj.weight", (H, Nk * D), True),
            "wv": (xk + "v_proj.weight", (H, Nk * D), True),
            "wo": (xk + "o_proj.weight", (Nq * D, H), True),
            "q_norm": (xk + "q_norm.weight", (D,), False),
            "k_norm": (xk + "k_norm.weight", (D,), False),
            "attn_gate": (xl + "cross_attn_attn_gate", (1,), False),
            "mlp_gate": (xl + "cross_attn_mlp_gate", (1,), False),
            "input_norm": (xl + "input_layernorm.weight", (H,), False),
            "post_norm": (xl + "post_attention_layernorm.weight", (H,),
                          False),
            "w_gate": (xl + "mlp.gate_proj.weight", (H, I), True),
            "w_up": (xl + "mlp.up_proj.weight", (H, I), True),
            "w_down": (xl + "mlp.down_proj.weight", (I, H), True),
        }
        for name, (key, shape, tr) in cross.items():
            s[f"cross_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), _lm_key(key),
                transpose=tr, stacked=True, layer_map=list(self.cross_idx))

        # ---- vision tower
        Hv, Iv, p = self.v_hidden, self.v_inter, self.patch
        P1, MT = self.num_patches, self.max_tiles

        def k(suffix):
            return "|".join(pref + suffix for pref in _VM.split("|"))

        s["vt.patch_w"] = WeightSpec(
            (3 * p * p, Hv), (None, None), k("patch_embedding.weight"),
            transpose=True, hf_pre=lambda t: t.reshape(t.shape[0], -1))
        s["vt.cls"] = WeightSpec((Hv,), (None,), k("class_embedding"))
        s["vt.pos_emb"] = WeightSpec(
            (P1, Hv), (None, None),
            k("gated_positional_embedding.embedding"))
        s["vt.pos_gate"] = WeightSpec(
            (1,), (None,), k("gated_positional_embedding.gate"))
        s["vt.tile_pos"] = WeightSpec(
            (self.max_ar + 1, MT * P1 * Hv), (None, None),
            k("gated_positional_embedding.tile_embedding.weight"))
        for nm in ("pre", "post"):
            s[f"vt.{nm}_tile"] = WeightSpec(
                (self.max_ar + 1, MT * Hv), (None, None),
                k(f"{nm}_tile_positional_embedding.embedding.weight"))
            s[f"vt.{nm}_tile_gate"] = WeightSpec(
                (1,), (None,),
                k(f"{nm}_tile_positional_embedding.gate"))
        for nm in ("layernorm_pre", "layernorm_post"):
            s[f"vt.{nm}_w"] = WeightSpec((Hv,), (None,), k(nm + ".weight"))
            s[f"vt.{nm}_b"] = WeightSpec((Hv,), (None,), k(nm + ".bias"))

        def tower(stack_name, key_base, L, gated):
            lk = key_base + ".layers.{l}."
            per_layer = {
                "ln1_w": ("input_layernorm.weight", (Hv,), False),
                "ln1_b": ("input_layernorm.bias", (Hv,), False),
                "ln2_w": ("post_attention_layernorm.weight", (Hv,), False),
                "ln2_b": ("post_attention_layernorm.bias", (Hv,), False),
                "wq": ("self_attn.q_proj.weight", (Hv, Hv), True),
                "wk": ("self_attn.k_proj.weight", (Hv, Hv), True),
                "wv": ("self_attn.v_proj.weight", (Hv, Hv), True),
                "wo": ("self_attn.o_proj.weight", (Hv, Hv), True),
                "w1": ("mlp.fc1.weight", (Hv, Iv), True),
                "b1": ("mlp.fc1.bias", (Iv,), False),
                "w2": ("mlp.fc2.weight", (Iv, Hv), True),
                "b2": ("mlp.fc2.bias", (Hv,), False),
            }
            if gated:
                per_layer["gate_attn"] = ("gate_attn", (1,), False)
                per_layer["gate_ffn"] = ("gate_ffn", (1,), False)
            for name, (suffix, shape, tr) in per_layer.items():
                s[f"{stack_name}.{name}"] = WeightSpec(
                    shape, tuple(None for _ in shape), k(lk + suffix),
                    transpose=tr, stacked=True, num_stack=L)

        tower("vt_layers", "transformer", self.v_layers, gated=False)
        tower("vtg_layers", "global_transformer", self.v_global, gated=True)

        s["mmp.w"] = WeightSpec(
            (self.v_out, H), (None, None),
            "multi_modal_projector.weight"
            "|model.multi_modal_projector.weight", transpose=True)
        s["mmp.b"] = WeightSpec(
            (H,), (None,),
            "multi_modal_projector.bias|model.multi_modal_projector.bias")
        return s

    # ----------------------------------------------------------- vision

    def encode_images(self, params: dict[str, Any],
                      patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> projected encoder rows [N, P+1, H]."""
        Hv, Nh = self.v_hidden, self.v_heads
        Dh = Hv // Nh
        N = patches.shape[0]
        P1 = self.num_patches
        eps = self.v_eps
        vt = params["vt"]
        ar = self.ar_id

        MT = self.max_tiles
        # HF pads every image to max_num_tiles ZERO tiles and its
        # aspect-ratio mask only blocks invalid-q x invalid-k pairs — the
        # real tile's rows DO attend the padded tiles' (embedding-only)
        # rows, so all MT tiles must be computed to match
        h0 = patches @ vt["patch_w"]                     # [N, P, Hv]
        P = h0.shape[1]
        pre = vt["pre_tile"][ar].reshape(MT, Hv)         # [MT, Hv]
        h = jnp.zeros((N, MT, P, Hv), h0.dtype).at[:, 0].set(h0)
        h = h + pre[None, :, None] * jnp.tanh(vt["pre_tile_gate"])
        cls = jnp.broadcast_to(vt["cls"][None, None, None],
                               (N, MT, 1, Hv))
        h = jnp.concatenate([cls, h], axis=2)            # CLS first
        g = jnp.tanh(vt["pos_gate"])
        tile_pos = vt["tile_pos"][ar].reshape(MT, P1, Hv)
        h = h + (1 - g) * vt["pos_emb"] + g * tile_pos[None]
        h = layer_norm(h, vt["layernorm_pre_w"], vt["layernorm_pre_b"], eps)

        pad = (8 - P1 % 8) % 8
        if pad:
            h = jnp.pad(h, ((0, 0), (0, 0), (0, pad), (0, 0)))
        Lp = P1 + pad
        h = h.reshape(N, MT * Lp, Hv)
        tile_of = jnp.arange(MT * Lp) // Lp
        inv = (tile_of > 0) | (jnp.arange(MT * Lp) % Lp >= P1)
        bias = jnp.where(inv[:, None] & inv[None, :], -1e30, 0.0)[
            None, None]

        def block(x, lp, gated):
            r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = (r @ lp["wq"]).reshape(N, -1, Nh, Dh)
            k_ = (r @ lp["wk"]).reshape(N, -1, Nh, Dh)
            v = (r @ lp["wv"]).reshape(N, -1, Nh, Dh)
            s_ = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                            k_.astype(jnp.float32)) * (Dh ** -0.5) + bias
            a = jax.nn.softmax(s_, axis=-1)
            ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
            attn = ctx.reshape(N, -1, Hv).astype(x.dtype) @ lp["wo"]
            if gated:
                attn = attn * jnp.tanh(lp["gate_attn"])
            x = x + attn
            r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
            mlp = jax.nn.gelu((r2 @ lp["w1"] + lp["b1"]).astype(
                jnp.float32), approximate=False).astype(x.dtype) \
                @ lp["w2"] + lp["b2"]
            if gated:
                mlp = mlp * jnp.tanh(lp["gate_ffn"])
            return x + mlp

        inter_states = []
        for i in range(self.v_layers):
            lp = jax.tree.map(lambda a: a[i], params["vt_layers"])
            if i in self.inter_idx:
                inter_states.append(h)
            h = block(h, lp, gated=False)
        if self.v_layers in self.inter_idx:
            inter_states.append(h)
        h = layer_norm(h, vt["layernorm_post_w"], vt["layernorm_post_b"],
                       eps)
        post = vt["post_tile"][ar].reshape(MT, Hv)
        h = h.reshape(N, MT, Lp, Hv) \
            + post[None, :, None] * jnp.tanh(vt["post_tile_gate"])
        h = h.reshape(N, MT * Lp, Hv)
        for i in range(self.v_global):
            lp = jax.tree.map(lambda a: a[i], params["vtg_layers"])
            h = block(h, lp, gated=True)

        h = h[:, :P1]                                    # tile 0 rows
        inter = jnp.stack([x[:, :P1] for x in inter_states], axis=-1)
        inter = inter.reshape(N, P1, -1)
        feats = jnp.concatenate([h, inter], axis=-1)     # [N, P1, v_out]
        out = feats.astype(jnp.float32) @ params["mmp"]["w"].astype(
            jnp.float32) + params["mmp"]["b"]
        return out.astype(params["mmp"]["w"].dtype)

    # ------------------------------------------------------- encoder KV

    def write_cross_kv(self, params: dict[str, Any], kv_pages: jnp.ndarray,
                       enc_states: jnp.ndarray,
                       enc_slots: jnp.ndarray) -> jnp.ndarray:
        """Project the encoder rows into every cross layer's K/V and write
        them into that layer's page-space slice (run once per request)."""
        c = self.config
        Nk, D = c.num_kv_heads, c.head_dim
        E = enc_states.shape[0]
        PP1 = kv_pages.shape[-4] // c.num_layers
        ps = kv_pages.shape[-3]
        for ci, gl in enumerate(self.cross_idx):
            w = jax.tree.map(lambda a: a[ci], params["cross_layers"])
            k = (enc_states @ w["wk"]).reshape(E, Nk, D)
            k = rms_norm(k, w["k_norm"], c.rms_norm_eps)
            v = (enc_states @ w["wv"]).reshape(E, Nk, D)
            kv_pages = write_kv_pages(
                kv_pages, enc_slots + gl * PP1 * ps, k, v)
        return kv_pages

    # ------------------------------------------------------------ forward

    def _cross_layer(self, w, hidden, fb, kv_slice, allow, backend):
        c = self.config
        T = hidden.shape[0]
        eps = c.rms_norm_eps
        x = rms_norm(hidden, w["input_norm"], eps)
        q = (x @ w["wq"]).reshape(T, c.num_heads, c.head_dim)
        q = rms_norm(q, w["q_norm"], eps)
        # every row is its own "sequence" with kv_len = enc_len: the paged
        # DECODE path attends [0, enc_len) non-causally — exactly
        # cross-attention over the encoder pages
        lens = jnp.maximum(fb.enc_lens, 1)
        attn = paged_attention(
            q, kv_slice, lens, fb.enc_page_indices,
            jnp.arange(T + 1, dtype=jnp.int32),
            jnp.asarray(T, jnp.int32),
            sm_scale=c.head_dim ** -0.5,
            backend=backend, mode="decode",
        )
        out = attn.reshape(T, -1) @ w["wo"]
        out = out * allow[:, None]
        h = hidden + jnp.tanh(w["attn_gate"]) * out
        r = rms_norm(h, w["post_norm"], eps)
        mlp = (jax.nn.silu(r @ w["w_gate"]) * (r @ w["w_up"])) @ w["w_down"]
        mlp = mlp * allow[:, None]
        return h + jnp.tanh(w["mlp_gate"]) * mlp

    def forward(
        self,
        params: dict[str, Any],
        fb,
        kv_pages: jnp.ndarray,
        *,
        attn_backend: str,
        attn_mode: str = "extend",
        scan_layers: bool = True,
        lora=None,
        **_unused,
    ):
        assert lora is None, "LoRA batching not wired for mllama"
        c = self.config
        PP1 = kv_pages.shape[-4] // c.num_layers
        hidden = params["embed"][fb.input_ids]
        if fb.mm_embeds is not None:
            hidden = hidden.at[fb.mm_positions].set(
                fb.mm_embeds.astype(hidden.dtype), mode="drop")
        have_enc = fb.enc_lens is not None
        allow = ((fb.enc_lens > 0).astype(hidden.dtype)
                 if have_enc else None)

        for kind, lo, n in self.segments:
            if kind == "self":
                s0 = self.self_ord[lo]
                seg_params = dict(params)
                seg_params["layers"] = jax.tree.map(
                    lambda a: a[s0:s0 + n], params["layers"])
                kv_slice = jax.lax.slice_in_dim(
                    kv_pages, lo * PP1, (lo + n) * PP1, axis=0)
                hidden, kv_slice = self.lm.forward(
                    seg_params, fb, kv_slice,
                    attn_backend=attn_backend, attn_mode=attn_mode,
                    scan_layers=scan_layers, hidden_in=hidden,
                    apply_final_norm=False, layer_offset=s0)
                kv_pages = jax.lax.dynamic_update_slice_in_dim(
                    kv_pages, kv_slice, lo * PP1, axis=0)
            elif have_enc:
                # text-only batches skip cross layers entirely — identical
                # to the masked computation (reference skip_cross_attention)
                ci = self.cross_ord[lo]
                w = jax.tree.map(lambda a: a[ci], params["cross_layers"])
                kv_slice = jax.lax.slice_in_dim(
                    kv_pages, lo * PP1, (lo + 1) * PP1, axis=0)
                hidden = self._cross_layer(
                    w, hidden, fb, kv_slice, allow, attn_backend)
        hidden = rms_norm(hidden, params["final_norm"], c.rms_norm_eps)
        return hidden, kv_pages

    def compute_logits(self, params: dict[str, Any],
                       hidden: jnp.ndarray) -> jnp.ndarray:
        return (hidden @ params["lm_head"]).astype(jnp.float32)
