"""Gemma 3n text family (reference: srt/models/gemma3n_causal.py
Gemma3nForCausalLM).

Structural novelties vs gemma3 (all per reference lines):
  * AltUp (gemma3n_causal.py:171): the residual stream is `altup_num_inputs`
    parallel streams [A, T, H]; per layer `predict` mixes streams with
    router-derived coefficients, the layer body runs on the active stream,
    and `correct` redistributes the innovation. Streams are created from
    the embedding by altup_projections (+ magnitude renorm) and collapsed
    at the end by altup_unembed_projections + mean.
  * Laurel (gemma3n_causal.py:132): low-rank residual branch
    x + norm(right(left(x))) merged with the attention residual / sqrt(2).
  * Per-layer embeddings (gemma3n_causal.py:729-765): a second embedding
    table [V_pl, L*Dpl] plus per_layer_model_projection of the input
    embedding; each layer gates its slice into the active stream
    (per_layer_input_gate -> gelu_tanh -> * input -> projection -> norm,
    added to the NON-active streams).
  * KV sharing (gemma3n_causal.py:373-385): the last num_kv_shared_layers
    layers write no KV; sliding layers read the last non-shared sliding
    layer's pages, globals the last non-shared global layer's. Here shared
    layers write to their own garbage page and read the source layer's
    page slice (uniform lax.scan body; the pool keeps L slices — the
    shared slices are dead weight, a future num_kv_layers optimization).
  * Activation sparsity (gemma3n_causal.py:122 _gaussian_topk): per-layer
    gate cutoff mean + std * icdf(sparsity), relu above.
  * q/k RMSNorm per head (weighted) + weightless v RMSNorm; attention
    scale is literally 1.0 (gemma3n_causal.py:351).

Attention-plumbing conventions (paged KV, rope local/global, per-layer
windows) follow models/llama_family.py.
"""

from __future__ import annotations

from statistics import NormalDist
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.layers.rotary import (apply_rope, compute_inv_freq,
                                            rope_attention_factor)
from iaas_sglang_tpu.model_executor.forward_batch import ForwardBatch
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.ops.attention import paged_attention, write_kv_pages


def _plain_rms(x, eps):
    return (x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        + eps)).astype(x.dtype)


class Gemma3nForCausalLM:
    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        hf = dict(config.hf_config)
        if hf.get("text_config"):
            hf = dict(hf["text_config"])
        self.hf = hf
        L = c.num_layers
        self.A = hf.get("altup_num_inputs", 4)
        self.active = hf.get("altup_active_idx", 0)
        self.coef_clip = hf.get("altup_coef_clip")
        self.correct_scale = hf.get("altup_correct_scale", True)
        self.laurel_rank = hf.get("laurel_rank", 64)
        self.dpl = hf.get("hidden_size_per_layer_input", 256)
        self.vocab_pl = hf.get("vocab_size_per_layer_input", 262144)
        self.final_softcap = hf.get("final_logit_softcapping", 30.0)

        layer_types = hf.get("layer_types") or [
            "full_attention" if (i + 1) % 5 == 0 else "sliding_attention"
            for i in range(L)]
        is_local = np.array([t == "sliding_attention" for t in layer_types])
        sw = hf.get("sliding_window", 512)
        self.layer_windows = jnp.asarray(
            np.where(is_local, sw, -1).astype(np.int32))
        self.layer_is_local = jnp.asarray(is_local)

        # KV sharing: last num_kv_shared_layers read from the last
        # non-shared layer of the same kind and write to garbage
        n_shared = hf.get("num_kv_shared_layers", 0)
        fkv = L - n_shared
        kv_src = np.arange(L)
        kv_src[fkv:] = np.where(is_local[fkv:], fkv - 2, fkv - 1)
        for i in range(fkv, L):
            # the reference picks fkv-2 for sliding / fkv-1 for global and
            # the released configs always order them that way; fall back to
            # an exact same-kind search for exotic patterns
            if is_local[kv_src[i]] != is_local[i]:
                same = np.nonzero(is_local[:fkv] == is_local[i])[0]
                kv_src[i] = same[-1]
        self.kv_src = jnp.asarray(kv_src.astype(np.int32))
        self.kv_write = jnp.asarray((np.arange(L) < fkv))

        sp = hf.get("activation_sparsity_pattern") or [0.0] * L
        std_mult = np.array([NormalDist().inv_cdf(p) if p > 0 else 0.0
                             for p in sp], np.float32)
        self.act_sp_mult = jnp.asarray(std_mult)
        self.act_sp_on = jnp.asarray(np.array(sp, np.float32) > 0)

        self.inv_freq = jnp.asarray(compute_inv_freq(
            c.head_dim, c.rope_theta, c.rope_scaling))
        self.inv_freq_local = jnp.asarray(compute_inv_freq(
            c.head_dim, hf.get("rope_local_base_freq", 10000.0), None))
        self.rope_attn_factor = rope_attention_factor(c.rope_scaling)

        self.mesh = None
        self.moe_impl = "dense"

    # ------------------------------------------------------------ geometry

    def kv_entry_shape(self) -> tuple[int, int]:
        return (2 * self.config.num_kv_heads, self.config.head_dim)

    def kv_shard_dims(self) -> tuple:
        return (None, None, None, None)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H, I = c.hidden_size, c.intermediate_size
        Nq, Nk, D = c.num_heads, c.num_kv_heads, c.head_dim
        V, L, A = c.vocab_size, c.num_layers, self.A
        r, Dpl = self.laurel_rank, self.dpl
        lpre = "model.layers.{l}."

        clip = self.coef_clip

        def _clip(t):
            # altup_coef_clip clamps the coef weights in place each forward
            # (gemma3n_causal.py:240) — constants at inference time
            return np.clip(t, -clip, clip) if clip is not None else t

        s: dict[str, WeightSpec] = {
            "embed": WeightSpec((V, H), (None, "tp"),
                                "model.embed_tokens.weight"),
            "embed_pl": WeightSpec(
                (self.vocab_pl, L * Dpl), (None, None),
                "model.embed_tokens_per_layer.weight"),
            "pl_proj": WeightSpec(
                (H, L * Dpl), (None, None),
                "model.per_layer_model_projection.weight", transpose=True),
            "pl_proj_norm": WeightSpec(
                (Dpl,), (None,), "model.per_layer_projection_norm.weight"),
            "final_norm": WeightSpec((H,), (None,), "model.norm.weight"),
        }
        for nm, key in (("altup_proj", "model.altup_projections.{l}.weight"),
                        ("altup_unembed",
                         "model.altup_unembed_projections.{l}.weight")):
            s[f"{nm}.w"] = WeightSpec(
                (H, H), (None, None), key, transpose=True,
                stacked=True, num_stack=A - 1)

        def layer(name, shape, key, tr=False, pspec=None, hf_pre=None):
            s[f"layers.{name}"] = WeightSpec(
                shape, pspec or tuple(None for _ in shape), lpre + key,
                transpose=tr, stacked=True, hf_pre=hf_pre)

        layer("wq", (H, Nq * D), "self_attn.q_proj.weight", tr=True,
              pspec=(None, "tp"))
        layer("wk", (H, Nk * D), "self_attn.k_proj.weight", tr=True)
        layer("wv", (H, Nk * D), "self_attn.v_proj.weight", tr=True)
        layer("wo", (Nq * D, H), "self_attn.o_proj.weight", tr=True,
              pspec=("tp", None))
        layer("q_norm", (D,), "self_attn.q_norm.weight")
        layer("k_norm", (D,), "self_attn.k_norm.weight")
        layer("w_gate", (H, I), "mlp.gate_proj.weight", tr=True,
              pspec=(None, "tp"))
        layer("w_up", (H, I), "mlp.up_proj.weight", tr=True,
              pspec=(None, "tp"))
        layer("w_down", (I, H), "mlp.down_proj.weight", tr=True,
              pspec=("tp", None))
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm",
                   "post_feedforward_layernorm"):
            layer(nm, (H,), nm + ".weight")
        layer("laurel_left", (H, r), "laurel.linear_left.weight", tr=True)
        layer("laurel_right", (r, H), "laurel.linear_right.weight", tr=True)
        layer("laurel_norm", (H,), "laurel.post_laurel_norm.weight")
        layer("au_router", (H, A), "altup.modality_router.weight", tr=True)
        layer("au_router_norm", (H,), "altup.router_norm.weight")
        layer("au_pred", (A, A * A), "altup.prediction_coefs.weight",
              tr=True, hf_pre=_clip)
        layer("au_corr", (A, A), "altup.correction_coefs.weight",
              tr=True, hf_pre=_clip)
        layer("au_scale", (H,), "altup.correct_output_scale")
        layer("pl_gate", (H, Dpl), "per_layer_input_gate.weight", tr=True)
        layer("pl_proj", (Dpl, H), "per_layer_projection.weight", tr=True)
        layer("pl_norm", (H,), "post_per_layer_input_norm.weight")
        return s

    # ------------------------------------------------------------- forward

    def _embed_inputs(self, params, fb):
        """(embedding rows [T, H], per-layer-table ids [T]); the mm wrapper
        overrides this with the embed_vision/embed_audio hard-token paths
        and zeroes per-layer ids at soft-token positions."""
        H = self.config.hidden_size
        emb = params["embed"][fb.input_ids] * jnp.asarray(
            H ** 0.5, params["embed"].dtype)
        if fb.mm_embeds is not None:
            emb = emb.at[fb.mm_positions].set(
                fb.mm_embeds.astype(emb.dtype), mode="drop")
        pl_ids = jnp.where(fb.input_ids < self.vocab_pl, fb.input_ids, 0)
        return emb, pl_ids

    def forward(
        self,
        params: dict[str, Any],
        fb: ForwardBatch,
        kv_pages: jnp.ndarray,
        *,
        attn_backend: str,
        attn_mode: str = "extend",
        scan_layers: bool = True,
        lora=None,
        hidden_in: Optional[jnp.ndarray] = None,
        apply_final_norm: bool = True,
        **_unused,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        assert lora is None, "LoRA batching not wired for gemma3n"
        c = self.config
        L = c.num_layers
        A, Dpl = self.A, self.dpl
        eps = c.rms_norm_eps
        H = c.hidden_size
        # K/V-split pool is plane-outermost [2, NP, ps, NkD]
        kv_split = kv_pages.shape[0] == 2
        pages_per_layer = kv_pages.shape[1 if kv_split else 0] // L
        ps = kv_pages.shape[2 if kv_split else 1]
        f32 = jnp.float32

        # ---- embeddings + per-layer inputs (gemma3n_causal.py:765-800)
        emb, pl_ids = self._embed_inputs(params, fb)
        T = emb.shape[0]
        pl_emb = (params["embed_pl"][pl_ids]
                  * jnp.asarray(Dpl ** 0.5, emb.dtype)).reshape(T, L, Dpl)
        pl_proj = (emb.astype(f32) @ params["pl_proj"].astype(f32)
                   * (H ** -0.5)).reshape(T, L, Dpl)
        pl_proj = rms_norm(pl_proj, params["pl_proj_norm"], eps)
        per_layer_inputs = ((pl_proj + pl_emb.astype(f32))
                            * (2.0 ** -0.5)).astype(emb.dtype)

        # ---- expand to A altup streams with magnitude renorm
        def renorm(x, target_mag):
            mag = jnp.sqrt(jnp.mean(jnp.square(x.astype(f32)), -1,
                                    keepdims=True))
            return (x.astype(f32) * target_mag
                    / jnp.maximum(mag, 1e-30)).astype(x.dtype)

        target = jnp.sqrt(jnp.mean(jnp.square(emb.astype(f32)), -1,
                                   keepdims=True))
        streams = [emb]
        for i in range(A - 1):
            proj = (emb.astype(f32)
                    @ params["altup_proj"]["w"][i].astype(f32)
                    ).astype(emb.dtype)
            streams.append(renorm(proj, target))
        hidden = jnp.stack(streams)                     # [A, T, H]

        def modalities(x, lp):
            ri = _plain_rms(x.astype(f32), eps) * lp["au_router_norm"] \
                * (1.0 / H)
            return jnp.tanh(ri @ lp["au_router"].astype(f32))   # [T, A]

        def layer_body(carry, xs):
            hs, kv = carry                              # [A, T, H]
            lp, layer_idx = xs

            # ---- altup predict
            m = modalities(hs[self.active], lp)
            raw = (m @ lp["au_pred"].astype(f32)).reshape(T, A, A)
            pred = (jnp.einsum("bth,tab->ath", hs.astype(f32), raw)
                    + hs.astype(f32)).astype(hs.dtype)
            active = pred[self.active]

            x = rms_norm(active, lp["input_layernorm"], eps)
            # laurel on the normed active prediction
            laurel = (x.astype(f32) @ lp["laurel_left"].astype(f32)
                      @ lp["laurel_right"].astype(f32))
            laurel = x.astype(f32) + rms_norm(
                laurel, lp["laurel_norm"], eps)

            # ---- attention (scale 1.0, per-head q/k norm, weightless v)
            q = (x @ lp["wq"]).reshape(T, c.num_heads, c.head_dim)
            k = (x @ lp["wk"]).reshape(T, c.num_kv_heads, c.head_dim)
            v = (x @ lp["wv"]).reshape(T, c.num_kv_heads, c.head_dim)
            q = rms_norm(q, lp["q_norm"], eps)
            k = rms_norm(k, lp["k_norm"], eps)
            v = _plain_rms(v, eps)
            inv_freq = jnp.where(self.layer_is_local[layer_idx],
                                 self.inv_freq_local, self.inv_freq)
            q, k = apply_rope(q, k, fb.positions, inv_freq,
                              self.rope_attn_factor)
            # shared layers write to their own garbage page and read the
            # source layer's slice
            write_slots = jnp.where(
                self.kv_write[layer_idx],
                fb.out_slots + layer_idx * pages_per_layer * ps,
                layer_idx * pages_per_layer * ps
                + (pages_per_layer - 1) * ps)
            kv = write_kv_pages(kv, write_slots, k, v)
            page_off = self.kv_src[layer_idx] * pages_per_layer
            attn = paged_attention(
                q, kv, fb.kv_lens, fb.page_indices + page_off,
                fb.cu_q_lens, fb.num_seqs,
                sm_scale=1.0,
                sliding_window=self.layer_windows[layer_idx],
                backend=attn_backend, mode=attn_mode,
            )
            attn = attn.reshape(T, -1) @ lp["wo"]
            attn = rms_norm(attn, lp["post_attention_layernorm"], eps)
            attn_laurel = ((active.astype(f32) + attn.astype(f32)
                            + laurel) * (2.0 ** -0.5)).astype(hs.dtype)

            # ---- MLP with activation sparsity on the gate
            h2 = rms_norm(attn_laurel, lp["pre_feedforward_layernorm"], eps)
            gate = (h2 @ lp["w_gate"]).astype(f32)
            cutoff = (jnp.mean(gate, -1, keepdims=True)
                      + jnp.std(gate, -1, keepdims=True)
                      * self.act_sp_mult[layer_idx])
            gate = jnp.where(self.act_sp_on[layer_idx],
                             jax.nn.relu(gate - cutoff), gate)
            inter = jax.nn.gelu(gate, approximate=True).astype(h2.dtype) \
                * (h2 @ lp["w_up"])
            mlp = inter @ lp["w_down"]
            mlp = rms_norm(mlp, lp["post_feedforward_layernorm"], eps)
            activated = attn_laurel + mlp

            # ---- altup correct
            mc_ = modalities(activated, lp)
            cc = (mc_ @ lp["au_corr"].astype(f32) + 1.0)     # [T, A]
            innovation = (activated - pred[self.active]).astype(f32)
            corrected = (pred.astype(f32)
                         + innovation[None] * cc.T[:, :, None])

            # ---- per-layer input gate into the non-active streams
            fp = corrected[self.active]
            if self.correct_scale:
                fp = fp * lp["au_scale"].astype(f32)
            fp = jax.nn.gelu(fp @ lp["pl_gate"].astype(f32),
                             approximate=True)
            fp = fp * per_layer_inputs[:, layer_idx].astype(f32)
            fp = rms_norm(fp @ lp["pl_proj"].astype(f32), lp["pl_norm"],
                          eps)
            corrected = corrected.at[1:].add(fp[None])
            return (corrected.astype(hs.dtype), kv), None

        xs = (params["layers"], jnp.arange(L, dtype=jnp.int32))
        if scan_layers:
            (hidden, kv_pages), _ = jax.lax.scan(
                layer_body, (hidden, kv_pages), xs)
        else:
            for i in range(L):
                lp = jax.tree.map(lambda a: a[i], params["layers"])
                (hidden, kv_pages), _ = layer_body(
                    (hidden, kv_pages), (lp, jnp.asarray(i, jnp.int32)))

        # ---- collapse streams (unembed + renorm + mean) and final norm
        target = jnp.sqrt(jnp.mean(jnp.square(hidden[0].astype(f32)), -1,
                                   keepdims=True))
        outs = [hidden[0].astype(f32)]
        for i in range(A - 1):
            proj = (hidden[i + 1].astype(f32)
                    @ params["altup_unembed"]["w"][i].astype(f32)
                    ).astype(hidden.dtype)
            outs.append(renorm(proj, target).astype(f32))
        h = jnp.mean(jnp.stack(outs), axis=0).astype(hidden.dtype)
        if apply_final_norm:
            h = rms_norm(h, params["final_norm"], eps)
        return h, kv_pages

    def compute_logits(self, params: dict[str, Any],
                       hidden: jnp.ndarray) -> jnp.ndarray:
        logits = (hidden @ params["embed"].T).astype(jnp.float32)
        cap = self.final_softcap
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        return logits
