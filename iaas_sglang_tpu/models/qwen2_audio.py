"""Qwen2-Audio (reference: srt/models/qwen2_audio.py
Qwen2AudioForConditionalGeneration).

Composition: a Whisper-style audio tower ('audio_tower.*' keys — two 1D
convs with GELU, fixed sinusoidal embed_positions from the checkpoint,
pre-norm LN encoder layers with biased q/v and bias-less k projections,
2x average pooling then the encoder-level layer_norm) projected by
'multi_modal_projector.linear' into the Qwen2 LM
('language_model.'-prefixed keys). Audio spans in input_ids carry
hash-derived pseudo ids like images; the row count per clip is
((mel_frames-1)//2 + 1 - 2)//2 + 1 (HF _get_feat_extract_output_lengths).
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
from iaas_sglang_tpu.models.vision import layer_norm

_AT = "audio_tower.|model.audio_tower."


def audio_output_lengths(mel_frames: int) -> int:
    """HF Qwen2AudioEncoder._get_feat_extract_output_lengths + avg pool."""
    conv_out = (mel_frames - 1) // 2 + 1
    return (conv_out - 2) // 2 + 1


class AudioTowerConfig:
    def __init__(self, ac: dict[str, Any]):
        self.num_mel_bins = ac.get("num_mel_bins", 128)
        self.hidden_size = ac.get("d_model", 1280)
        self.num_layers = ac.get("encoder_layers", 32)
        self.num_heads = ac.get("encoder_attention_heads", 20)
        self.intermediate_size = ac.get("encoder_ffn_dim", 5120)
        self.max_source_positions = ac.get("max_source_positions", 1500)
        self.chunk_frames = 2 * self.max_source_positions   # 3000


def whisper_tower_specs(k, ac: AudioTowerConfig) -> dict[str, "WeightSpec"]:
    """Whisper-encoder WeightSpecs ('at.*' / 'at_layers.*' param names);
    `k` maps an HF suffix to the checkpoint key alternates."""
    D, I, M = ac.hidden_size, ac.intermediate_size, ac.num_mel_bins
    L = ac.num_layers
    s: dict[str, WeightSpec] = {}
    # conv kernels [D, M, 3] -> matmul layout [3*M, D] in (c, t) order
    conv_flat = lambda t: t.reshape(t.shape[0], -1)
    s["at.conv1_w"] = WeightSpec((3 * M, D), (None, None),
                                 k("conv1.weight"), transpose=True,
                                 hf_pre=conv_flat)
    s["at.conv1_b"] = WeightSpec((D,), (None,), k("conv1.bias"))
    s["at.conv2_w"] = WeightSpec((3 * D, D), (None, None),
                                 k("conv2.weight"), transpose=True,
                                 hf_pre=conv_flat)
    s["at.conv2_b"] = WeightSpec((D,), (None,), k("conv2.bias"))
    s["at.pos_emb"] = WeightSpec(
        (ac.max_source_positions, D), (None, None),
        k("embed_positions.weight"))
    s["at.ln_post_w"] = WeightSpec((D,), (None,), k("layer_norm.weight"))
    s["at.ln_post_b"] = WeightSpec((D,), (None,), k("layer_norm.bias"))
    lk = "layers.{l}."
    per_layer = [
        ("ln1_w", lk + "self_attn_layer_norm.weight", (D,), False),
        ("ln1_b", lk + "self_attn_layer_norm.bias", (D,), False),
        ("ln2_w", lk + "final_layer_norm.weight", (D,), False),
        ("ln2_b", lk + "final_layer_norm.bias", (D,), False),
        ("wq", lk + "self_attn.q_proj.weight", (D, D), True),
        ("bq", lk + "self_attn.q_proj.bias", (D,), False),
        ("wk", lk + "self_attn.k_proj.weight", (D, D), True),
        ("wv", lk + "self_attn.v_proj.weight", (D, D), True),
        ("bv", lk + "self_attn.v_proj.bias", (D,), False),
        ("wo", lk + "self_attn.out_proj.weight", (D, D), True),
        ("bo", lk + "self_attn.out_proj.bias", (D,), False),
        ("w1", lk + "fc1.weight", (D, I), True),
        ("b1", lk + "fc1.bias", (I,), False),
        ("w2", lk + "fc2.weight", (I, D), True),
        ("b2", lk + "fc2.bias", (D,), False),
    ]
    for name, key, shape, tr in per_layer:
        s[f"at_layers.{name}"] = WeightSpec(
            shape, tuple(None for _ in shape), k(key),
            transpose=tr, stacked=True, num_stack=L)
    return s


def whisper_encode_trunk(at: dict, layers: dict, mel_t: jnp.ndarray,
                         num_heads: int,
                         attn_bias: jnp.ndarray | None = None
                         ) -> jnp.ndarray:
    """Whisper encoder trunk: mel_t [N, T, n_mels] -> pre-final-norm hidden
    [N, T/2, D]. Convs run as matmuls over unfolded frames; `attn_bias`
    (optional additive [N, 1, T/2, T/2], e.g. padding/chunk masks) is added
    to every layer's scores."""
    D = at["conv1_w"].shape[1]
    Nh = num_heads
    Dh = D // Nh
    N, T, _ = mel_t.shape

    def conv1d(x, w, b, stride):
        # x [N, T, C]; w [3*C, D] in (c, t) kernel order; pad 1
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        t_idx = jnp.arange(0, T, stride)
        # unfold: [N, T_out, 3, C] -> (c, t) order -> [N, T_out, C*3]
        windows = jnp.stack([xp[:, t_idx], xp[:, t_idx + 1],
                             xp[:, t_idx + 2]], axis=2)
        windows = windows.transpose(0, 1, 3, 2).reshape(
            N, len(t_idx), -1)
        return windows @ w + b

    h = jax.nn.gelu(conv1d(mel_t, at["conv1_w"], at["conv1_b"], 1),
                    approximate=False)
    h = jax.nn.gelu(conv1d(h, at["conv2_w"], at["conv2_b"], 2),
                    approximate=False)          # [N, T/2, D]
    h = h + at["pos_emb"][None, : h.shape[1]]
    eps = 1e-5
    scale = Dh ** -0.5

    def body(carry, lp):
        x = carry
        r = layer_norm(x, lp["ln1_w"], lp["ln1_b"], eps)
        q = (r @ lp["wq"] + lp["bq"]).reshape(N, -1, Nh, Dh)
        k_ = (r @ lp["wk"]).reshape(N, -1, Nh, Dh)
        v = (r @ lp["wv"] + lp["bv"]).reshape(N, -1, Nh, Dh)
        s_ = jnp.einsum("bqnd,bknd->bnqk", q.astype(jnp.float32),
                        k_.astype(jnp.float32)) * scale
        if attn_bias is not None:
            s_ = s_ + attn_bias
        a = jax.nn.softmax(s_, axis=-1)
        ctx = jnp.einsum("bnqk,bknd->bqnd", a, v.astype(jnp.float32))
        ctx = ctx.reshape(N, -1, D).astype(x.dtype)
        x = x + (ctx @ lp["wo"] + lp["bo"])
        r2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], eps)
        inter = jax.nn.gelu((r2 @ lp["w1"] + lp["b1"]).astype(
            jnp.float32), approximate=False).astype(x.dtype)
        return x + (inter @ lp["w2"] + lp["b2"]), None

    h, _ = jax.lax.scan(body, h, layers)
    return h


class Qwen2AudioForConditionalGeneration:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.lm = LlamaFamilyForCausalLM(config)
        self.ac = AudioTowerConfig(config.hf_config.get("audio_config")
                                   or {})

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
        # full-chunk (30 s) span; shorter clips set num_tokens per item
        return audio_output_lengths(self.ac.chunk_frames)

    def patchify(self, mel: np.ndarray) -> np.ndarray:
        """[N, n_mels, 3000] mel features -> [N, 3000, n_mels] (the conv1d
        runs as a matmul over unfolded frames on the time axis)."""
        return np.swapaxes(np.asarray(mel), 1, 2)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in self.lm.weight_specs().items():
            key = spec.hf_key
            if key is not None:
                key = "|".join("language_model." + alt
                               for alt in key.split("|"))
            s[name] = dataclasses.replace(spec, hf_key=key)

        ac = self.ac
        D = ac.hidden_size

        def k(suffix):
            return "|".join(pref + suffix for pref in _AT.split("|"))

        s.update(whisper_tower_specs(k, ac))

        H = self.config.hidden_size
        s["mm.proj_w"] = WeightSpec(
            (D, H), (None, None),
            "multi_modal_projector.linear.weight"
            "|model.multi_modal_projector.linear.weight", transpose=True)
        s["mm.proj_b"] = WeightSpec(
            (H,), (None,),
            "multi_modal_projector.linear.bias"
            "|model.multi_modal_projector.linear.bias")
        return s

    # ------------------------------------------------------------- compute

    def encode_images(self, params: dict[str, Any],
                      mel_t: jnp.ndarray) -> jnp.ndarray:
        """mel_t [N, 3000, n_mels] -> projected LM rows [N, 750, H]
        (items shorter than 30 s use their first `num_tokens` rows)."""
        ac = self.ac
        D = ac.hidden_size
        N = mel_t.shape[0]
        at = params["at"]
        h = whisper_encode_trunk(at, params["at_layers"], mel_t,
                                 ac.num_heads)
        eps = 1e-5
        # 2x average pool on time, then the encoder-level layer norm
        h = h.reshape(N, h.shape[1] // 2, 2, D).mean(axis=2)
        h = layer_norm(h, at["ln_post_w"], at["ln_post_b"], eps)
        x = h.astype(jnp.float32) @ params["mm"]["proj_w"].astype(
            jnp.float32) + params["mm"]["proj_b"]
        return x.astype(params["mm"]["proj_w"].dtype)

    def forward(self, params, fb, kv_pages, **kw):
        return self.lm.forward(params, fb, kv_pages, **kw)

    def compute_logits(self, params, hidden):
        return self.lm.compute_logits(params, hidden)
