"""DeepSeek V2/V3 family: Multi-head Latent Attention + DeepSeekMoE.

TPU-first re-design of the reference's DeepSeek stack
(srt/models/deepseek_v2.py, srt/layers/attention/flashinfer_mla_backend.py,
srt/layers/moe/topk.py grouped/biased topk):

  * MLA runs in the **absorbed** formulation end-to-end: the per-head
    `w_kc` slice of kv_b_proj is folded into the query, so attention is
    MQA over one shared latent entry [kv_lora_rank + rope_dim] per token —
    the KV cache stores the compressed latent (c_kv) + roped k_pe only,
    9x smaller than materialized MHA KV. V = entry[:, :kv_lora_rank]
    and the per-head `w_vc` unprojects the latent context after softmax.
  * DeepSeekMoE: dense first-k layers then MoE layers with shared experts;
    grouped top-k router (softmax/greedy for V2, sigmoid/noaux_tc with
    e_score_correction_bias for V3). Layer heterogeneity maps onto TWO
    `lax.scan`s (dense stack, MoE stack) instead of the reference's
    per-layer python branching.
  * Rope is the DeepSeek interleaved-pair convention, applied only to the
    qk_rope_head_dim tail of q and the shared k_pe.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.layers.rotary import (apply_rope,
                                            apply_rope_interleaved,
                                            compute_inv_freq,
                                            rope_attention_factor)
from iaas_sglang_tpu.model_executor.forward_batch import ForwardBatch
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.ops.attention import (
    dp_mla_paged_attention,
    dp_write_kv_entries,
    mla_paged_attention,
    write_kv_entries,
)
from iaas_sglang_tpu.ops.moe import combine_weights, deepseek_route, dense_expert_mix
from iaas_sglang_tpu.quantization.qlinear import qmatmul


class DeepseekFamilyForCausalLM:
    """Functional DeepSeek V2/V3 causal LM (MLA + DeepSeekMoE)."""

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        self.rope_dim = c.qk_rope_head_dim
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rope_dim, c.rope_theta, c.rope_scaling)
        )
        self.qk_head_dim = c.qk_nope_head_dim + c.qk_rope_head_dim
        self.sm_scale = self.qk_head_dim ** -0.5
        self.rope_attn_factor = rope_attention_factor(c.rope_scaling)
        # KV entry is zero-padded to a lane multiple: Mosaic DMAs a page
        # [ps, Dk] only when Dk % 128 == 0 (DeepSeek V3's 512+64=576 is not).
        # Zero channels are dot-product-neutral, so q is padded identically.
        self.kv_entry_dim = -(-(c.kv_lora_rank + self.rope_dim) // 128) * 128
        self.moe_impl = "dense"
        self.moe_axis = "tp"  # "ep","tp" super-axis under a dedicated ep mesh
        self.mesh = None
        # layer split: [0, fk) dense MLP, [fk, L) MoE
        self.fk = c.first_k_dense_replace if c.is_moe else c.num_layers
        self.n_moe_layers = c.num_layers - self.fk

    # ------------------------------------------------------------ geometry

    def kv_entry_shape(self) -> tuple[int, int]:
        """(entries per token, entry dim) of the paged KV pool."""
        return (1, self.kv_entry_dim)

    def kv_shard_dims(self) -> tuple:
        # the latent entry is shared by all heads — replicate over tp
        return (None, None, None, None)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H, V = c.hidden_size, c.vocab_size
        Nq = c.num_heads
        dn, dr, dv = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        lora = c.kv_lora_rank
        s: dict[str, WeightSpec] = {
            "embed": WeightSpec((V, H), (None, "tp"), "model.embed_tokens.weight"),
            "final_norm": WeightSpec((H,), (None,), "model.norm.weight"),
            "layers.input_norm": WeightSpec(
                (H,), (None,), "model.layers.{l}.input_layernorm.weight",
                stacked=True),
            "layers.post_norm": WeightSpec(
                (H,), (None,),
                "model.layers.{l}.post_attention_layernorm.weight", stacked=True),
            "layers.wkv_a": WeightSpec(
                (H, lora + dr), (None, None),
                "model.layers.{l}.self_attn.kv_a_proj_with_mqa.weight",
                transpose=True, stacked=True),
            "layers.kv_a_norm": WeightSpec(
                (lora,), (None,),
                "model.layers.{l}.self_attn.kv_a_layernorm.weight", stacked=True),
            "layers.wkv_b": WeightSpec(
                (lora, Nq * (dn + dv)), (None, "tp"),
                "model.layers.{l}.self_attn.kv_b_proj.weight",
                transpose=True, stacked=True),
            "layers.wo": WeightSpec(
                (Nq * dv, H), ("tp", None),
                "model.layers.{l}.self_attn.o_proj.weight",
                transpose=True, stacked=True, quantizable=True),
        }
        if c.q_lora_rank:
            s["layers.wq_a"] = WeightSpec(
                (H, c.q_lora_rank), (None, None),
                "model.layers.{l}.self_attn.q_a_proj.weight",
                transpose=True, stacked=True)
            s["layers.q_a_norm"] = WeightSpec(
                (c.q_lora_rank,), (None,),
                "model.layers.{l}.self_attn.q_a_layernorm.weight", stacked=True)
            s["layers.wq_b"] = WeightSpec(
                (c.q_lora_rank, Nq * (dn + dr)), (None, "tp"),
                "model.layers.{l}.self_attn.q_b_proj.weight",
                transpose=True, stacked=True)
        else:
            s["layers.wq"] = WeightSpec(
                (H, Nq * (dn + dr)), (None, "tp"),
                "model.layers.{l}.self_attn.q_proj.weight",
                transpose=True, stacked=True, quantizable=True)
        if self.fk > 0:
            I = c.intermediate_size
            for nm, hf in (("w_gate", "gate_proj"), ("w_up", "up_proj")):
                s[f"dense.{nm}"] = WeightSpec(
                    (H, I), (None, "tp"),
                    f"model.layers.{{l}}.mlp.{hf}.weight",
                    transpose=True, stacked=True, quantizable=True,
                    num_stack=self.fk)
            s["dense.w_down"] = WeightSpec(
                (I, H), ("tp", None),
                "model.layers.{l}.mlp.down_proj.weight",
                transpose=True, stacked=True, quantizable=True,
                num_stack=self.fk)
        if self.n_moe_layers > 0:
            E, Im = c.num_experts, c.moe_intermediate_size
            nm_stack = dict(stacked=True, num_stack=self.n_moe_layers,
                            layer_offset=self.fk)
            ep = self.moe_impl == "ep"
            ax = getattr(self, "moe_axis", "tp")
            pg = (ax, None, None) if ep else (None, None, "tp")
            pd = (ax, None, None) if ep else (None, "tp", None)
            s["moe.w_router"] = WeightSpec(
                (H, E), (None, None), "model.layers.{l}.mlp.gate.weight",
                transpose=True, **nm_stack)
            if c.topk_method == "noaux_tc":
                s["moe.e_bias"] = WeightSpec(
                    (E,), (None,),
                    "model.layers.{l}.mlp.gate.e_score_correction_bias",
                    **nm_stack)
            s["moe.we_gate"] = WeightSpec(
                (E, H, Im), pg,
                "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
                transpose=True, num_experts=E, **nm_stack)
            s["moe.we_up"] = WeightSpec(
                (E, H, Im), pg,
                "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
                transpose=True, num_experts=E, **nm_stack)
            s["moe.we_down"] = WeightSpec(
                (E, Im, H), pd,
                "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
                transpose=True, num_experts=E, **nm_stack)
            Is = Im * c.n_shared_experts
            s["moe.ws_gate"] = WeightSpec(
                (H, Is), (None, "tp"),
                "model.layers.{l}.mlp.shared_experts.gate_proj.weight",
                transpose=True, **nm_stack)
            s["moe.ws_up"] = WeightSpec(
                (H, Is), (None, "tp"),
                "model.layers.{l}.mlp.shared_experts.up_proj.weight",
                transpose=True, **nm_stack)
            s["moe.ws_down"] = WeightSpec(
                (Is, H), ("tp", None),
                "model.layers.{l}.mlp.shared_experts.down_proj.weight",
                transpose=True, **nm_stack)
        if not c.tie_word_embeddings:
            s["lm_head"] = WeightSpec(
                (H, V), (None, "tp"), "lm_head.weight", transpose=True)
        return s

    # ------------------------------------------------------------- forward

    def forward(
        self,
        params: dict[str, Any],
        fb: ForwardBatch,
        kv_pages: jnp.ndarray,   # [L*(P+1), ps, 1, lora+dr]
        *,
        attn_backend: str,
        attn_mode: str = "extend",
        scan_layers: bool = True,
        lora=None,
        capture_experts: bool = False,
        hidden_in: Optional[jnp.ndarray] = None,
        apply_final_norm: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        L = c.num_layers
        Nq = c.num_heads
        dn, dr, dv = c.qk_nope_head_dim, c.qk_rope_head_dim, c.v_head_dim
        lora_rank = c.kv_lora_rank
        # DP attention (the natural multi-chip mode for MLA: the single
        # latent head cannot shard over tp, so KV shards over attention
        # ranks instead — pool [G, L*(P+1), ps, 1, Dk])
        dp_attn = fb.kv_lens.ndim == 2
        pages_per_layer = kv_pages.shape[-4] // L
        ps = kv_pages.shape[-3]

        if hidden_in is not None:
            hidden = hidden_in       # NextN draft: eh_proj-combined pairs
        else:
            hidden = params["embed"][fb.input_ids]  # [T, H]
            if c.embed_multiplier != 1.0:
                hidden = hidden * jnp.asarray(c.embed_multiplier,
                                              hidden.dtype)
            if fb.mm_embeds is not None:
                # VLM (Kimi-VL): overwrite image-placeholder rows with
                # projected vision embeddings (input-embedding merge)
                hidden = hidden.at[fb.mm_positions].set(
                    fb.mm_embeds.astype(hidden.dtype), mode="drop")
        T = hidden.shape[0]

        def attention(h, lp, layer_idx, kv):
            if c.q_lora_rank:
                qa = rms_norm(qmatmul(h, lp["wq_a"]), lp["q_a_norm"],
                              c.rms_norm_eps)
                q = qmatmul(qa, lp["wq_b"])
            else:
                q = qmatmul(h, lp["wq"])
            q = q.reshape(T, Nq, dn + dr)
            q_nope, q_pe = q[..., :dn], q[..., dn:]
            if c.rope_interleaved:
                q_pe = apply_rope_interleaved(
                    q_pe, fb.positions, self.inv_freq, self.rope_attn_factor)
            else:
                # MiniCPM3: standard neox rope on the rope channels
                q_pe, _ = apply_rope(q_pe, q_pe, fb.positions,
                                     self.inv_freq, self.rope_attn_factor)

            kv_a = qmatmul(h, lp["wkv_a"])              # [T, lora+dr]
            c_kv = rms_norm(kv_a[:, :lora_rank], lp["kv_a_norm"],
                            c.rms_norm_eps)
            k_pe = kv_a[:, None, lora_rank:]            # [T, 1, dr]
            if c.rope_interleaved:
                k_pe = apply_rope_interleaved(
                    k_pe, fb.positions, self.inv_freq, self.rope_attn_factor)
            else:
                k_pe, _ = apply_rope(k_pe, k_pe, fb.positions,
                                     self.inv_freq, self.rope_attn_factor)

            # absorb w_kc into the query: q_abs[t,n,:] = q_nope[t,n,:] @ w_kc[n]
            wkv_b = lp["wkv_b"].reshape(lora_rank, Nq, dn + dv)
            w_kc = wkv_b[..., :dn]                      # [lora, Nq, dn]
            w_vc = wkv_b[..., dn:]                      # [lora, Nq, dv]
            q_abs = jnp.einsum("tnd,lnd->tnl",
                               q_nope.astype(jnp.float32),
                               w_kc.astype(jnp.float32)).astype(h.dtype)
            pad = self.kv_entry_dim - (lora_rank + dr)
            q_full = jnp.concatenate([q_abs, q_pe] + (
                [jnp.zeros((T, Nq, pad), q_abs.dtype)] if pad else []),
                axis=-1)                                # [T, Nq, entry_dim]

            entry = jnp.concatenate([c_kv[:, None, :], k_pe] + (
                [jnp.zeros((T, 1, pad), c_kv.dtype)] if pad else []), axis=-1)
            slot_off = layer_idx * pages_per_layer * ps
            page_off = layer_idx * pages_per_layer
            if dp_attn:
                kv = dp_write_kv_entries(
                    kv, fb.out_slots + slot_off, entry, mesh=self.mesh)
                ctx = dp_mla_paged_attention(
                    q_full, kv, fb.kv_lens, fb.page_indices + page_off,
                    fb.cu_q_lens, fb.num_seqs, mesh=self.mesh,
                    sm_scale=self.sm_scale, v_dim=lora_rank,
                    backend=attn_backend, mode=attn_mode,
                )
            else:
                kv = write_kv_entries(kv, fb.out_slots + slot_off, entry)
                ctx = mla_paged_attention(
                    q_full, kv, fb.kv_lens, fb.page_indices + page_off,
                    fb.cu_q_lens, fb.num_seqs,
                    sm_scale=self.sm_scale, v_dim=lora_rank,
                    backend=attn_backend, mode=attn_mode,
                )                                       # [T, Nq, lora]
            attn = jnp.einsum("tnl,lnd->tnd",
                              ctx.astype(jnp.float32),
                              w_vc.astype(jnp.float32)).astype(h.dtype)
            out = qmatmul(attn.reshape(T, Nq * dv), lp["wo"])
            return out, kv

        def mlp_dense(h2, lp):
            inter = jax.nn.silu(qmatmul(h2, lp["w_gate"])) * qmatmul(h2, lp["w_up"])
            return qmatmul(inter, lp["w_down"])

        def mlp_moe(h2, lp, _capture=capture_experts):
            w, ids = deepseek_route(
                h2, lp["w_router"], lp.get("e_bias"),
                top_k=c.num_experts_per_tok,
                scoring_func=c.scoring_func,
                topk_method=c.topk_method,
                n_group=c.n_group, topk_group=c.topk_group,
                norm_topk_prob=c.norm_topk_prob,
                routed_scaling_factor=c.routed_scaling_factor,
            )
            combine = combine_weights(ids, w, c.num_experts)
            if "expert_phys_map" in lp:
                from iaas_sglang_tpu.ops.moe import remap_combine

                mix = remap_combine(combine, lp["expert_phys_map"],
                                    lp["expert_phys_scale"])
            else:
                mix = combine
            if self.moe_impl == "ep":
                from iaas_sglang_tpu.ops.moe import moe_ep_mix

                routed = moe_ep_mix(
                    h2, mix, lp["we_gate"], lp["we_up"], lp["we_down"],
                    mesh=self.mesh, axis=self.moe_axis)
            else:
                routed = dense_expert_mix(
                    h2, mix, lp["we_gate"], lp["we_up"], lp["we_down"])
            shared = jax.nn.silu(h2 @ lp["ws_gate"]) * (h2 @ lp["ws_up"])
            out = routed + (shared @ lp["ws_down"]).astype(routed.dtype)
            if _capture:
                # padding mask; DP attention stacks cu_q_lens per rank
                # [G, B_r+1] with rank-major tokens (see llama_family
                # capture tap) — mask each rank's tail by its cu[num_seqs]
                Tt = combine.shape[0]
                cu = fb.cu_q_lens
                if cu.ndim == 2:
                    Gr = cu.shape[0]
                    lim = jnp.take_along_axis(
                        cu, fb.num_seqs[:, None], axis=1)[:, 0]
                    tloc = jnp.arange(Tt) % (Tt // Gr)
                    valid = (tloc < jnp.repeat(lim, Tt // Gr))[:, None]
                else:
                    valid = (jnp.arange(Tt) < cu[-1])[:, None]
                counts = jnp.sum(
                    (combine > 0) & valid, axis=0).astype(jnp.int32)
                return out, counts
            return out

        def make_body(mlp_fn, is_moe_group=False):
            def body(carry, xs):
                hidden, kv = carry
                lp, layer_idx = xs
                h = rms_norm(hidden, lp["input_norm"], c.rms_norm_eps)
                attn_out, kv = attention(h, lp, layer_idx, kv)
                rm = c.residual_multiplier   # MiniCPM3 muP depth scaling
                hidden = hidden + (attn_out * rm if rm != 1.0 else attn_out)
                h2 = rms_norm(hidden, lp["post_norm"], c.rms_norm_eps)
                counts = None
                mlp = mlp_fn(h2, lp)
                if capture_experts and is_moe_group:
                    mlp, counts = mlp
                hidden = hidden + (mlp * rm if rm != 1.0 else mlp)
                return (hidden, kv), counts
            return body

        attn_p = params["layers"]
        fk = self.fk

        def run_group(carry, mlp_fn, group_params, lo, hi,
                      is_moe_group=False):
            if hi <= lo:
                return carry, None
            lp = {**jax.tree.map(lambda x: x[lo:hi], attn_p), **group_params}
            ids = jnp.arange(lo, hi, dtype=jnp.int32)
            body = make_body(mlp_fn, is_moe_group)
            if scan_layers:
                carry, ys = jax.lax.scan(body, carry, (lp, ids))
                return carry, ys
            ys_l = []
            for i in range(hi - lo):
                carry, y = body(
                    carry, (jax.tree.map(lambda x: x[i], lp), ids[i]))
                ys_l.append(y)
            ys = (jnp.stack(ys_l)
                  if capture_experts and is_moe_group else None)
            return carry, ys

        carry = (hidden, kv_pages)
        carry, _ = run_group(carry, mlp_dense, params.get("dense", {}), 0, fk)
        carry, moe_counts = run_group(
            carry, mlp_moe, params.get("moe", {}), fk, L, is_moe_group=True)
        hidden, kv_pages = carry

        if apply_final_norm:
            hidden = rms_norm(hidden, params["final_norm"], c.rms_norm_eps)
        if capture_experts:
            E = c.num_experts
            zeros = jnp.zeros((fk, E), jnp.int32)
            counts = (jnp.concatenate([zeros, moe_counts])
                      if moe_counts is not None else zeros)
            return hidden, kv_pages, counts   # i32[L, E]
        return hidden, kv_pages

    def compute_logits(self, params: dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
        if self.config.tie_word_embeddings:
            w = params["embed"].T
        else:
            w = params["lm_head"]
        logits = (hidden @ w).astype(jnp.float32)
        if self.config.logits_scale != 1.0:
            logits = logits * self.config.logits_scale
        return logits
