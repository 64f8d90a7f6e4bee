"""CLIP text+image embedding serving (reference srt/models/clip.py
CLIPModel).

Text requests run the CLIP text transformer (causal attention, learned
positions, quick-gelu MLP, final layer norm), pool the LAST token, apply
`text_projection` and l2-normalize. Image requests bypass the LM: the
scheduler routes them to `embed_image` — full-depth CLIP vision tower,
post-layernormed CLS, `visual_projection`, l2-normalize (HF
get_text_features / get_image_features semantics, both normalized).

Prefill-only like the BERT path; the text encoder computes attention
directly over the ragged batch (segment-masked causal) — the KV pool is
never touched.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.models.vision import (ClipVisionConfig, _act,
                                            clip_encode, clip_patchify,
                                            clip_vision_specs, layer_norm)


def _l2(x):
    return x / jnp.maximum(
        jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


class ClipEmbeddingModel:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.mesh = None
        self.moe_impl = "dense"
        self.vc = ClipVisionConfig(config.vision_config)

    def kv_entry_shape(self) -> tuple[int, int]:
        return (1, 1)   # encoder-only: the KV pool is never read/written

    def kv_shard_dims(self) -> tuple:
        return (None, None, None, None)

    def patchify(self, pixel_values):
        return clip_patchify(pixel_values, self.vc.patch_size)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H, I, V = c.hidden_size, c.intermediate_size, c.vocab_size
        tm = "text_model."
        lk = tm + "encoder.layers.{l}."
        s: dict[str, WeightSpec] = {
            "embed": WeightSpec(
                (V, H), (None, None),
                tm + "embeddings.token_embedding.weight"),
            "pos_embed": WeightSpec(
                (c.max_position_embeddings, H), (None, None),
                tm + "embeddings.position_embedding.weight"),
            "final_ln_w": WeightSpec(
                (H,), (None,), tm + "final_layer_norm.weight"),
            "final_ln_b": WeightSpec(
                (H,), (None,), tm + "final_layer_norm.bias"),
            "text_proj": WeightSpec(
                (H, self.proj_dim), (None, None),
                "text_projection.weight", transpose=True),
            "visual_proj": WeightSpec(
                (self.vc.hidden_size, self.proj_dim), (None, None),
                "visual_projection.weight", transpose=True),
        }
        per_layer = {
            "ln1_w": ("layer_norm1.weight", (H,), False),
            "ln1_b": ("layer_norm1.bias", (H,), False),
            "ln2_w": ("layer_norm2.weight", (H,), False),
            "ln2_b": ("layer_norm2.bias", (H,), False),
            "wq": ("self_attn.q_proj.weight", (H, H), True),
            "bq": ("self_attn.q_proj.bias", (H,), False),
            "wk": ("self_attn.k_proj.weight", (H, H), True),
            "bk": ("self_attn.k_proj.bias", (H,), False),
            "wv": ("self_attn.v_proj.weight", (H, H), True),
            "bv": ("self_attn.v_proj.bias", (H,), False),
            "wo": ("self_attn.out_proj.weight", (H, H), True),
            "bo": ("self_attn.out_proj.bias", (H,), False),
            "w1": ("mlp.fc1.weight", (H, I), True),
            "b1": ("mlp.fc1.bias", (I,), False),
            "w2": ("mlp.fc2.weight", (I, H), True),
            "b2": ("mlp.fc2.bias", (H,), False),
        }
        for name, (suffix, shape, tr) in per_layer.items():
            s[f"layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), lk + suffix,
                transpose=tr, stacked=True)
        s.update(clip_vision_specs(self.vc, "vision_model.",
                                   with_post_ln=True))
        return s

    @property
    def proj_dim(self) -> int:
        return self.config.hf_config.get("projection_dim", 512)

    # ------------------------------------------------------------- compute

    def forward(self, params, fb, kv_pages, *, attn_backend="jnp",
                attn_mode="extend", scan_layers=True, lora=None,
                capture_experts=False):
        c = self.config
        H = c.hidden_size
        Nh = c.num_heads
        Dh = H // Nh
        eps = c.layer_norm_eps
        T = fb.input_ids.shape[0]
        Bmax = fb.kv_lens.shape[0]

        t_idx = jnp.arange(T, dtype=jnp.int32)
        seg = jnp.searchsorted(fb.cu_q_lens[1:], t_idx,
                               side="right").astype(jnp.int32)
        valid = t_idx < fb.cu_q_lens[-1]
        seg = jnp.where(valid, seg, Bmax)
        # causal WITHIN each segment (CLIP text attention is causal)
        causal = fb.positions[:, None] >= fb.positions[None, :]
        same = (seg[:, None] == seg[None, :]) & valid[None, :] & causal
        same = same | (t_idx[:, None] == t_idx[None, :])   # self always

        h = (params["embed"][fb.input_ids]
             + params["pos_embed"][fb.positions])
        scale = Dh ** -0.5
        act = _act(c.hidden_act)

        def body(carry, lp):
            x = carry
            r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
            q = (r @ lp["wq"] + lp["bq"]).reshape(T, Nh, Dh)
            k = (r @ lp["wk"] + lp["bk"]).reshape(T, Nh, Dh)
            v = (r @ lp["wv"] + lp["bv"]).reshape(T, Nh, Dh)
            s = jnp.einsum("qnd,knd->nqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            s = jnp.where(same[None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("nqk,knd->qnd", a, v.astype(jnp.float32))
            x = x + (ctx.reshape(T, H).astype(x.dtype) @ lp["wo"] + lp["bo"])
            r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
            x = x + (act(r2 @ lp["w1"] + lp["b1"])
                     @ lp["w2"] + lp["b2"])
            return x, None

        h, _ = jax.lax.scan(body, h, params["layers"])
        h = layer_norm(h, params["final_ln_w"], params["final_ln_b"], eps)
        return h, kv_pages

    def pooled_output(self, params, last_h):
        """Last-token pooled text embedding: project + l2-normalize."""
        return _l2(last_h.astype(jnp.float32)
                   @ params["text_proj"].astype(jnp.float32))

    def embed_image(self, params: dict[str, Any],
                    patches: jnp.ndarray) -> jnp.ndarray:
        """patches [N, P, 3*p*p] -> normalized image embeddings [N, proj]."""
        feats = clip_encode(params, patches, self.vc,
                            self.vc.num_layers - 1, post_ln=True)
        cls = feats[:, 0]                         # post-layernormed CLS
        return _l2(cls.astype(jnp.float32)
                   @ params["visual_proj"].astype(jnp.float32))

    def compute_logits(self, params, hidden):
        return jnp.zeros((hidden.shape[0], 1), jnp.float32)
