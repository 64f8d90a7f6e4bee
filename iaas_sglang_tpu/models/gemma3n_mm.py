"""Gemma 3n multimodal (reference: srt/models/gemma3n_mm.py
Gemma3nForConditionalGeneration + srt/models/gemma3n_audio.py).

AUDIO path (Universal Speech Model conformer), replicated from the HF
modules the reference wraps:
  * SubSampleConvProjection: two 3x3 stride-2 conv blocks with
    reverse-causal time padding, CUMULATIVE group norm (stats cumsum'd
    over time) and ReLU, then a bias-less input projection.
  * 12 conformer blocks: half-residual feed-forwards, chunked local
    attention (chunk 12, left context 12, softcap 50) with sinusoidal
    RELATIVE position logits combined via the JAX-style relative shift,
    per-dim softplus query scales, GLU + causal depthwise-conv light
    convolution, per-block final RMSNorm and activation clamping.
  * conf_reduction_factor stride, padding rows zeroed.
  * Gemma3nMultimodalEmbedder (embed_audio/embed_vision): soft rows are
    RMS-normed, projected to text width and post-normed (scale-less);
    HARD mm token ids (>= vocab_offset) in the prompt are embedded the
    same way from the embedder's own table.
Per HF serving semantics every clip occupies audio_soft_tokens_per_image
(188) positions; shorter clips are padded with the embedder's last-vocab
embedding.

The VISION tower (MobileNetV5 instantiated via timm in the reference) is
not available in this environment — image inputs are rejected with a
clear error; hard vision tokens still embed correctly through
embed_vision.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.models.gemma3n import Gemma3nForCausalLM, _plain_rms
from iaas_sglang_tpu.models.llama_family import WeightSpec

_AT = "model.audio_tower."


class Gemma3nAudioConfig:
    def __init__(self, ac: dict[str, Any]):
        ac = ac or {}
        self.input_feat_size = ac.get("input_feat_size", 128)
        self.hidden_size = ac.get("hidden_size", 1536)
        self.num_heads = ac.get("conf_num_attention_heads", 8)
        self.num_layers = ac.get("conf_num_hidden_layers", 12)
        self.chunk = ac.get("conf_attention_chunk_size", 12)
        self.left = ac.get("conf_attention_context_left", 13)
        self.right = ac.get("conf_attention_context_right", 0)
        self.logit_cap = ac.get("conf_attention_logit_cap", 50.0)
        self.conv_kernel = ac.get("conf_conv_kernel_size", 5)
        self.reduction = ac.get("conf_reduction_factor", 4)
        self.residual_weight = ac.get("conf_residual_weight", 0.5)
        self.sscp_ch = tuple(ac.get("sscp_conv_channel_size", (128, 32)))
        self.sscp_eps = ac.get("sscp_conv_group_norm_eps", 1e-3)
        self.clip = ac.get("gradient_clipping", 1e10)
        self.eps = ac.get("rms_norm_eps", 1e-6)
        self.vocab_size = ac.get("vocab_size", 128)
        self.vocab_offset = ac.get("vocab_offset", 262272)
        # frequency dims after the two stride-2 convs (pad (1,1), k=3)
        f = self.input_feat_size
        for _ in range(2):
            f = (f + 2 - 3) // 2 + 1
        self.f_out = f


def _cumulative_group_norm(x: jnp.ndarray, weight: jnp.ndarray,
                           eps: float) -> jnp.ndarray:
    """x [B, T, F, C]: group stats cumulative over T, reduced over (F, C),
    per-channel scale (HF Gemma3nAudioCumulativeGroupNorm)."""
    xf = x.astype(jnp.float32)
    red = (2, 3)
    n_el = x.shape[2] * x.shape[3]
    cum_sum = jnp.cumsum(jnp.sum(xf, axis=red, keepdims=True), axis=1)
    cum_n = jnp.arange(1, x.shape[1] + 1, dtype=jnp.float32)[
        None, :, None, None] * n_el
    mean = cum_sum / cum_n
    sq = jnp.cumsum(jnp.sum(jnp.square(xf - mean), axis=red,
                            keepdims=True), axis=1)
    var = sq / cum_n
    out = (xf - mean) * jax.lax.rsqrt(var + eps) * weight.astype(
        jnp.float32)
    return out.astype(x.dtype)


class Gemma3nForConditionalGeneration(Gemma3nForCausalLM):
    def __init__(self, config: ModelConfig):
        super().__init__(config)
        hf = config.hf_config
        self.ac = Gemma3nAudioConfig(hf.get("audio_config") or {})
        vcfg = hf.get("vision_config") or {}
        self.vis_vocab = vcfg.get("vocab_size", 128)
        self.vis_offset = vcfg.get("vocab_offset", 262144)
        self.vis_hidden = vcfg.get("hidden_size", 2048)
        self.audio_soft_tokens = hf.get("audio_soft_tokens_per_image", 188)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        s: dict[str, WeightSpec] = {}
        for name, spec in super().weight_specs().items():
            key = spec.hf_key
            if key is not None:
                # mm checkpoints nest the LM under model.language_model.
                key = "|".join(
                    alt.replace("model.", "model.language_model.", 1)
                    + "|" + alt
                    for alt in key.split("|"))
            s[name] = dataclasses.replace(spec, hf_key=key)

        ac = self.ac
        Ha, F = ac.hidden_size, ac.input_feat_size
        C0, C1 = ac.sscp_ch
        Dh = Ha // ac.num_heads
        sk = _AT + "subsample_conv_projection."
        s["at.c0_w"] = WeightSpec((C0, 1, 3, 3), (None,) * 4,
                                  sk + "conv_0.conv.weight")
        s["at.c0_norm"] = WeightSpec((C0,), (None,),
                                     sk + "conv_0.norm.weight")
        s["at.c1_w"] = WeightSpec((C1, C0, 3, 3), (None,) * 4,
                                  sk + "conv_1.conv.weight")
        s["at.c1_norm"] = WeightSpec((C1,), (None,),
                                     sk + "conv_1.norm.weight")
        s["at.in_proj"] = WeightSpec(
            (C1 * ac.f_out, Ha), (None, None),
            sk + "input_proj_linear.weight", transpose=True)

        lk = _AT + "conformer.{l}."
        per_layer = {
            "ffs_pre": ("ffw_layer_start.pre_layer_norm.weight", (Ha,), 0),
            "ffs_w1": ("ffw_layer_start.ffw_layer_1.weight",
                       (Ha, 4 * Ha), 1),
            "ffs_w2": ("ffw_layer_start.ffw_layer_2.weight",
                       (4 * Ha, Ha), 1),
            "ffs_post": ("ffw_layer_start.post_layer_norm.weight", (Ha,), 0),
            "attn_pre": ("attention.pre_attn_norm.weight", (Ha,), 0),
            "wq": ("attention.attn.q_proj.weight", (Ha, Ha), 1),
            "wk": ("attention.attn.k_proj.weight", (Ha, Ha), 1),
            "wv": ("attention.attn.v_proj.weight", (Ha, Ha), 1),
            "per_dim_scale": ("attention.attn.per_dim_scale", (Dh,), 0),
            "pos_proj": ("attention.attn.relative_position_embedding."
                         "pos_proj.weight", (Ha, Ha), 1),
            "attn_post_w": ("attention.post.weight", (Ha, Ha), 1),
            "attn_post_norm": ("attention.post_norm.weight", (Ha,), 0),
            "lc_pre": ("lconv1d.pre_layer_norm.weight", (Ha,), 0),
            "lc_start": ("lconv1d.linear_start.weight", (Ha, 2 * Ha), 1),
            "lc_conv": ("lconv1d.depthwise_conv1d.weight",
                        (ac.conv_kernel, Ha), 2),
            "lc_norm": ("lconv1d.conv_norm.weight", (Ha,), 0),
            "lc_end": ("lconv1d.linear_end.weight", (Ha, Ha), 1),
            "ffe_pre": ("ffw_layer_end.pre_layer_norm.weight", (Ha,), 0),
            "ffe_w1": ("ffw_layer_end.ffw_layer_1.weight", (Ha, 4 * Ha), 1),
            "ffe_w2": ("ffw_layer_end.ffw_layer_2.weight", (4 * Ha, Ha), 1),
            "ffe_post": ("ffw_layer_end.post_layer_norm.weight", (Ha,), 0),
            "norm": ("norm.weight", (Ha,), 0),
        }
        for name, (suffix, shape, kind) in per_layer.items():
            # kind 2: depthwise conv weight [H, 1, K] -> [K, H]
            s[f"at_layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), lk + suffix,
                transpose=(kind == 1), stacked=True,
                num_stack=ac.num_layers,
                hf_pre=(lambda t: t[:, 0].T) if kind == 2 else None)

        H = self.config.hidden_size
        for nm, vocab, width in (("embed_audio", ac.vocab_size, Ha),
                                 ("embed_vision", self.vis_vocab,
                                  self.vis_hidden)):
            ek = f"model.{nm}."
            s[f"{nm}.table"] = WeightSpec(
                (vocab, width), (None, None), ek + "embedding.weight")
            s[f"{nm}.hard_norm"] = WeightSpec(
                (width,), (None,), ek + "hard_embedding_norm.weight")
            s[f"{nm}.soft_norm"] = WeightSpec(
                (width,), (None,), ek + "soft_embedding_norm.weight")
            s[f"{nm}.proj"] = WeightSpec(
                (width, H), (None, None),
                ek + "embedding_projection.weight", transpose=True)
        return s

    # --------------------------------------------------------- embedders

    def _embed_hard(self, ep: dict, ids: jnp.ndarray) -> jnp.ndarray:
        """Embedder hard path: table lookup -> rms -> proj -> scale-less
        post norm (HF Gemma3nMultimodalEmbedder)."""
        eps = self.ac.eps
        e = ep["table"][ids]
        e = rms_norm(e, ep["hard_norm"], eps)
        e = e.astype(jnp.float32) @ ep["proj"].astype(jnp.float32)
        return _plain_rms(e, eps)

    def _embed_soft(self, ep: dict, x: jnp.ndarray) -> jnp.ndarray:
        eps = self.ac.eps
        e = rms_norm(x, ep["soft_norm"], eps)
        e = e.astype(jnp.float32) @ ep["proj"].astype(jnp.float32)
        return _plain_rms(e, eps)

    def _embed_inputs(self, params, fb):
        H = self.config.hidden_size
        ids = fb.input_ids
        emb = params["embed"][ids] * jnp.asarray(
            H ** 0.5, params["embed"].dtype)
        # hard mm tokens (boa/eoa/image markers) come from the embedders
        vis = (ids >= self.vis_offset) & (ids < self.ac.vocab_offset)
        aud = ids >= self.ac.vocab_offset
        vis_ids = jnp.where(vis, ids - self.vis_offset, self.vis_vocab - 1)
        aud_ids = jnp.where(aud, ids - self.ac.vocab_offset,
                            self.ac.vocab_size - 1)
        emb = jnp.where(vis[:, None],
                        self._embed_hard(params["embed_vision"], vis_ids)
                        .astype(emb.dtype), emb)
        emb = jnp.where(aud[:, None],
                        self._embed_hard(params["embed_audio"], aud_ids)
                        .astype(emb.dtype), emb)
        is_mm = jnp.zeros(ids.shape, bool)
        if fb.mm_embeds is not None:
            emb = emb.at[fb.mm_positions].set(
                fb.mm_embeds.astype(emb.dtype), mode="drop")
            is_mm = is_mm.at[fb.mm_positions].set(True, mode="drop")
        # soft/mm positions use per-layer row 0 (HF zeroes their ids)
        pl_ids = jnp.where((ids < self.vocab_pl) & ~is_mm, ids, 0)
        return emb, pl_ids

    # --------------------------------------------------------- audio tower

    def patchify_audio(self, mel: np.ndarray) -> np.ndarray:
        return np.asarray(mel)              # [N, T, F] already

    def encode_audio(self, params: dict[str, Any], mel: jnp.ndarray,
                     valid: jnp.ndarray) -> jnp.ndarray:
        """mel [N, T, F], valid mel frames [N] -> LM rows
        [N, audio_soft_tokens, H] (padded with the embedder's last-vocab
        embedding, HF Gemma3nModel audio merge)."""
        ac = self.ac
        Ha, Nh = ac.hidden_size, ac.num_heads
        Dh = Ha // Nh
        N, T, F = mel.shape
        at = params["at"]
        f32 = jnp.float32

        # ---- subsample conv projection
        def conv_block(x, w, norm_w):
            # x [N, C_in, T, F]: pad F (1,1), T reverse-causal (0, 2)
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 2), (1, 1)))
            y = jax.lax.conv_general_dilated(
                x.astype(f32), w.astype(f32), (2, 2), "VALID",
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            y = y.transpose(0, 2, 3, 1)           # [N, T, F, C]
            y = _cumulative_group_norm(y, norm_w, ac.sscp_eps)
            y = jax.nn.relu(y)
            return y.transpose(0, 3, 1, 2)        # [N, C, T, F]

        x = mel.astype(f32)[:, None]              # [N, 1, T, F]
        x = conv_block(x, at["c0_w"], at["c0_norm"])
        x = conv_block(x, at["c1_w"], at["c1_norm"])
        # [N, C1, T2, F2] -> [N, T2, F2*C1] (f-major) -> input proj
        x = x.transpose(0, 2, 3, 1)
        T2 = x.shape[1]
        h = x.reshape(N, T2, -1) @ at["in_proj"].astype(f32)

        # sub-sampled validity: frame i maps to mel frame i*4
        stride = 4
        idx = jnp.minimum(jnp.arange(T2) * stride, T - 1)
        valid_sub = idx[None, :] < valid[:, None]          # [N, T2] True=ok

        # ---- chunked local attention machinery (static tables)
        W, L, R = ac.chunk, max(0, ac.left - 1), ac.right
        Ctx = W + L + R
        U = -(-T2 // W)
        Tp = U * W
        # local causal validity [W, Ctx] (HF lower*upper tril product)
        lower = np.tril(np.ones((Ctx, W), bool)).T
        upper = np.tril(np.ones((W, Ctx), bool), k=L + R)
        local_ok = jnp.asarray(lower & upper)
        # relative sinusoidal table [F_span, Ha]: positions L .. -R
        span = L + R + 1
        pos = np.arange(L, -R - 1, -1, dtype=np.float64)
        num_ts = Ha // 2
        inv_ts = np.exp(np.arange(num_ts) * -(np.log(1e4) / max(
            num_ts - 1, 1)))
        ang = pos[:, None] * inv_ts[None]
        sin_table = jnp.asarray(np.concatenate(
            [np.sin(ang), np.cos(ang)], -1).astype(np.float32))

        q_scale = (Dh ** -0.5) / float(np.log(2.0))   # * 1/softplus(0)

        def blocks(t):   # [N, Tp, ...] -> [N, U, W, ...]
            return t.reshape((N, U, W) + t.shape[2:])

        def context(t, fill=0):
            # pad L left, R + W - 1 right, unfold windows of Ctx step W
            pad_cfg = [(0, 0), (L, R + W - 1)] + [(0, 0)] * (t.ndim - 2)
            tp = jnp.pad(t, pad_cfg, constant_values=fill)
            starts = jnp.arange(U) * W
            gather = starts[:, None] + jnp.arange(Ctx)[None]   # [U, Ctx]
            return tp[:, gather]            # [N, U, Ctx, ...]

        def attention(h, lp, ok_sub):
            q = (h @ lp["wq"]).reshape(N, -1, Nh, Dh)
            k = (h @ lp["wk"]).reshape(N, -1, Nh, Dh)
            v = (h @ lp["wv"]).reshape(N, -1, Nh, Dh)
            q = q * (q_scale * jax.nn.softplus(
                lp["per_dim_scale"].astype(f32)))
            pad_t = Tp - T2
            q = jnp.pad(q, ((0, 0), (0, pad_t), (0, 0), (0, 0)))
            qb = blocks(q)                               # [N, U, W, Nh, Dh]
            kb = context(k)                              # [N, U, Ctx, Nh, Dh]
            vb = context(v)
            okb = context(ok_sub, fill=False)            # [N, U, Ctx]
            term_ac = jnp.einsum("buwnh,bucnh->bnuwc", qb, kb)
            sin_emb = (sin_table @ lp["pos_proj"].astype(f32)).reshape(
                span, Nh, Dh)
            term_bd = jnp.einsum("buwnh,fnh->bnuwf", qb, sin_emb)
            # JAX-style relative shift [.., W, span] -> [.., W, Ctx]
            pad_last = (Ctx + 1) - span
            tb = jnp.pad(term_bd, ((0, 0),) * 4 + ((0, pad_last),))
            tb = tb.reshape(N, Nh, U, W * (Ctx + 1))[:, :, :, : W * Ctx]
            tb = tb.reshape(N, Nh, U, W, Ctx)
            logits = term_ac + tb
            cap = ac.logit_cap
            logits = jnp.tanh(logits / cap) * cap
            allow = okb[:, None, :, None, :] & local_ok[None, None, None]
            logits = jnp.where(allow, logits, -1e30)
            p = jax.nn.softmax(logits, axis=-1)
            ctx_v = jnp.einsum("bnuwc,bucnh->buwnh", p, vb)
            return ctx_v.reshape(N, Tp, Nh * Dh)[:, :T2]

        def ffw(h, lp, pre, w1, w2, post):
            r = h
            x = jnp.clip(h, -ac.clip, ac.clip)
            x = rms_norm(x, lp[pre], ac.eps)
            x = jax.nn.silu(x @ lp[w1])
            x = jnp.clip(x @ lp[w2], -ac.clip, ac.clip)
            x = rms_norm(x, lp[post], ac.eps)
            return r + x * ac.residual_weight

        def lconv(h, lp):
            r = h
            x = rms_norm(h, lp["lc_pre"], ac.eps)
            x = x @ lp["lc_start"]
            a, b = jnp.split(x, 2, axis=-1)
            x = a * jax.nn.sigmoid(b)
            K = ac.conv_kernel
            xp = jnp.pad(x, ((0, 0), (K - 1, 0), (0, 0)))
            y = sum(xp[:, i : i + T2] * lp["lc_conv"][i][None, None]
                    for i in range(K))
            y = jnp.clip(y, -ac.clip, ac.clip)
            y = rms_norm(y, lp["lc_norm"], ac.eps)
            y = jax.nn.silu(y) @ lp["lc_end"]
            return r + y

        for i in range(ac.num_layers):
            lp = jax.tree.map(lambda a: a[i].astype(f32),
                              params["at_layers"])
            h = ffw(h, lp, "ffs_pre", "ffs_w1", "ffs_w2", "ffs_post")
            hx = jnp.clip(h, -ac.clip, ac.clip)
            hn = rms_norm(hx, lp["attn_pre"], ac.eps)
            a = attention(hn, lp, valid_sub)
            a = jnp.clip(a @ lp["attn_post_w"], -ac.clip, ac.clip)
            h = h + rms_norm(a, lp["attn_post_norm"], ac.eps)
            h = lconv(h * valid_sub[..., None], lp)
            h = ffw(h, lp, "ffe_pre", "ffe_w1", "ffe_w2", "ffe_post")
            h = jnp.clip(h, -ac.clip, ac.clip)
            h = rms_norm(h, lp["norm"], ac.eps)

        h = h[:, :: ac.reduction]
        mask = valid_sub[:, :: ac.reduction]
        h = h * mask[..., None]

        ep = params["embed_audio"]
        rows = self._embed_soft(ep, h)                 # [N, T_red, H]
        pad_emb = self._embed_hard(
            ep, jnp.asarray([self.ac.vocab_size - 1]))[0]
        rows = jnp.where(mask[..., None], rows, pad_emb[None, None])
        S = self.audio_soft_tokens
        T_red = rows.shape[1]
        if T_red < S:
            extra = jnp.broadcast_to(pad_emb[None, None],
                                     (N, S - T_red, rows.shape[-1]))
            rows = jnp.concatenate([rows, extra], axis=1)
        return rows[:, :S].astype(params["embed"].dtype)
