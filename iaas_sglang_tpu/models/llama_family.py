"""Llama-family causal LM (Llama 1-3, Qwen 2/2.5/3, Mistral, ...).

TPU-first re-design of the reference's per-model torch modules
(srt/models/llama.py:448, qwen2.py): a single functional decoder
parameterized by ModelConfig, with

  * params as a pytree of stacked per-layer arrays [L, ...] consumed by
    `lax.scan` (one compiled layer body instead of L unrolled ones),
  * TP expressed as PartitionSpecs on the weight pytree — GSPMD inserts
    the psum that RowParallelLinear (layers/linear.py:1198) does by hand,
  * the paged KV cache threaded through the scan carry and updated with a
    single scatter per layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.layers.norms import rms_norm
from iaas_sglang_tpu.layers.rotary import (apply_rope, compute_inv_freq,
                                            rope_attention_factor)
from iaas_sglang_tpu.model_executor.forward_batch import ForwardBatch
from iaas_sglang_tpu.ops.attention import (
    dp_paged_attention,
    dp_write_kv_pages,
    ds_paged_decode_attention,
    paged_attention,
    write_kv_pages,
    write_label_pages,
)
from iaas_sglang_tpu.quantization.qlinear import qmatmul


@dataclass
class WeightSpec:
    shape: tuple
    pspec: tuple                      # PartitionSpec dims (no leading L)
    hf_key: Optional[str] = None      # template, may contain {l}
    transpose: bool = False           # torch stores [out, in]
    stacked: bool = False             # one array per layer, stacked on dim 0
    quantizable: bool = False         # eligible for weight-only quantization
    num_experts: int = 0              # >0: hf_key contains {e}, leading E dim
    num_stack: int = 0                # stacked size; 0 => config.num_layers
    layer_offset: int = 0             # hf layer index = stack index + offset
    hf_pre: Optional[Callable] = None  # slice/reshape the fetched tensor
    #   (fused-source weights: phi3 qkv_proj, gpt2 c_attn, glm gate_up)
    optional: bool = False            # absent in ckpt => default-init (OLMo
    #   non-parametric LayerNorm ships no weights)
    layer_map: Optional[list] = None  # stack index i <- hf layer layer_map[i]
    #   (non-contiguous stacks: mixed dense/MoE layer interleaves)
    force_dtype: Optional[str] = None  # keep this dtype instead of the
    #   model dtype (integer lookup tables: EAGLE3 d2t)


def _rows(a: int, b: int):
    return lambda t: t[a:b]


def _cols(a: int, b: int):
    return lambda t: t[:, a:b]


class LlamaFamilyForCausalLM:
    """Functional causal LM. `forward` returns (last_hidden[T,H], kv_pages)."""

    # per-architecture HF key templates for MoE weights
    MOE_KEYS = {
        "mixtral": {
            "router": "model.layers.{l}.block_sparse_moe.gate.weight",
            "gate": "model.layers.{l}.block_sparse_moe.experts.{e}.w1.weight",
            "down": "model.layers.{l}.block_sparse_moe.experts.{e}.w2.weight",
            "up": "model.layers.{l}.block_sparse_moe.experts.{e}.w3.weight",
        },
        "qwen3_moe": {
            "router": "model.layers.{l}.mlp.gate.weight",
            "gate": "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
            "up": "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
            "down": "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
        },
        "olmoe": {
            "router": "model.layers.{l}.mlp.gate.weight",
            "gate": "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
            "up": "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
            "down": "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
        },
        "qwen2_moe": {
            "router": "model.layers.{l}.mlp.gate.weight",
            "gate": "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
            "up": "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
            "down": "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
            "shared": "model.layers.{l}.mlp.shared_expert.",
            "shared_gate": "model.layers.{l}.mlp.shared_expert_gate.weight",
        },
        "deepseek": {   # DeepSeek-V1/-MoE-16B (reference models/deepseek.py)
            "router": "model.layers.{l}.mlp.gate.weight",
            "gate": "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
            "up": "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
            "down": "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
            "shared": "model.layers.{l}.mlp.shared_experts.",
        },
        "phimoe": {     # Phi-3.5-MoE: mixtral naming
            "router": "model.layers.{l}.block_sparse_moe.gate.weight",
            "gate": "model.layers.{l}.block_sparse_moe.experts.{e}.w1.weight",
            "down": "model.layers.{l}.block_sparse_moe.experts.{e}.w2.weight",
            "up": "model.layers.{l}.block_sparse_moe.experts.{e}.w3.weight",
        },
        "hunyuan": {    # HunYuan-A13B: shared_mlp ungated shared expert
            # router key: gate.wg (HF) vs gate (original checkpoints)
            "router": "model.layers.{l}.mlp.gate.wg.weight"
                      "|model.layers.{l}.mlp.gate.weight",
            "gate": "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
            "up": "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
            "down": "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
            "shared": "model.layers.{l}.mlp.shared_mlp.",
        },
        "grok-1": {     # Grok-1: mixtral naming, gelu experts
            "router": "model.layers.{l}.block_sparse_moe.gate.weight",
            "gate": "model.layers.{l}.block_sparse_moe.experts.{e}.w1.weight",
            "down": "model.layers.{l}.block_sparse_moe.experts.{e}.w2.weight",
            "up": "model.layers.{l}.block_sparse_moe.experts.{e}.w3.weight",
        },
        "xverse_moe": {
            "router": "model.layers.{l}.mlp.router.weight",
            "gate": "model.layers.{l}.mlp.experts.{e}.gate_proj.weight",
            "up": "model.layers.{l}.mlp.experts.{e}.up_proj.weight",
            "down": "model.layers.{l}.mlp.experts.{e}.down_proj.weight",
            "shared": "model.layers.{l}.mlp.shared_experts.",
        },
        "llama4": {     # experts are single fused tensors (Llama4TextExperts)
            "router": "model.layers.{l}.feed_forward.router.weight",
            "shared": "model.layers.{l}.feed_forward.shared_expert.",
        },
    }

    def __init__(self, config: ModelConfig):
        self.config = config
        c = config
        # partial rotary (Phi/StableLM/GLM): rope over the first
        # rotary_dim channels only; inv_freq is computed at that width
        # (HF partial_rotary_factor convention).
        self.rotary_dim = (int(c.head_dim * c.partial_rotary_factor) // 2) * 2
        self.inv_freq = jnp.asarray(
            compute_inv_freq(self.rotary_dim, c.rope_theta, c.rope_scaling)
        )
        if c.attention_multiplier is not None:
            self.sm_scale = c.attention_multiplier   # Granite: direct scale
        else:
            self.sm_scale = (c.query_pre_attn_scalar or c.head_dim) ** -0.5
        self.rope_attn_factor = rope_attention_factor(c.rope_scaling)
        # set by the runner: "dense" (GSPMD-shardable), "gmm" (megablox)
        # or "ep"/"ep_a2a" (shard_map expert parallel); mesh set alongside
        self.moe_impl = "dense"
        self.moe_axis = "tp"  # "ep","tp" super-axis under a dedicated ep mesh
        self.mesh = None
        # two-batch overlap (reference srt/two_batch_overlap.py:218): split
        # the MoE block into two independent half-batches INSIDE the
        # program — XLA's latency-hiding scheduler then overlaps one
        # half's a2a/collectives with the other half's expert GEMMs. On
        # TPU the interleaving itself is the compiler's job; the split
        # just exposes the independent work.
        self.tbo = False
        # hybrid sliding-window layers (gemma2/3): per-layer window (-1 =
        # full attention) gathered by the traced layer index inside the
        # scan; uniform-SWA models (mistral) keep a static python window.
        self.layer_windows = None
        # double sparsity: [L, Nk, r] heavy-channel table (set by the
        # runner when --enable-double-sparsity; kv carry becomes a
        # (kv, labels) tuple)
        self.ds_channels = None
        self.ds_heavy_tokens = 0
        self.inv_freq_local = None
        self.layer_is_local = None
        # per-layer rope enable (SmolLM3 NoPE / EXAONE-4 global layers)
        self.rope_layer_mask = (
            jnp.asarray(c.rope_layers, jnp.bool_)
            if c.rope_layers is not None else None)
        # mixed dense/MoE stacks (Qwen2-MoE mlp_only_layers, DeepSeek-V1
        # first_k_dense, Llama-4 interleave): MoE weights stack over the
        # MoE layers only and dense-MLP weights over the rest; the scan
        # body gathers layer l's slice by these slot tables and picks the
        # branch with lax.cond (ONE scan, no per-segment recompiles —
        # the reference branches per python layer, srt/models/qwen2_moe.py)
        self.is_moe_layer = None
        if c.moe_layer_mask is not None:
            m = np.asarray(c.moe_layer_mask, bool)
            self.is_moe_layer = jnp.asarray(m)
            self.moe_slot = jnp.asarray(
                np.maximum(np.cumsum(m) - 1, 0), jnp.int32)
            self.dense_slot = jnp.asarray(
                np.maximum(np.cumsum(~m) - 1, 0), jnp.int32)
        # Llama-4 chunked local attention: rope layers attend within
        # attention_chunk_size chunks; NoPE layers are global (full)
        self.window_chunked = False
        if c.attention_chunk_size and c.rope_layers is not None:
            self.window_chunked = True
            self.layer_windows = jnp.asarray(
                [c.attention_chunk_size if r else -1
                 for r in c.rope_layers], jnp.int32)
        if c.sliding_window and c.sliding_window_pattern:
            self.layer_windows = jnp.asarray(
                [c.sliding_window if s else -1
                 for s in c.sliding_window_pattern], jnp.int32)
            self.layer_is_local = jnp.asarray(
                c.sliding_window_pattern, jnp.bool_)
            if c.rope_local_base_freq:
                # gemma3: local layers rope at base freq without scaling
                self.inv_freq_local = jnp.asarray(compute_inv_freq(
                    c.head_dim, c.rope_local_base_freq, None))

    def kv_entry_shape(self) -> tuple[int, int]:
        """(entries per token, entry dim) of the paged KV pool — K/V pairs
        interleaved on the entry axis."""
        return (2 * self.config.num_kv_heads, self.config.head_dim)

    def kv_shard_dims(self) -> tuple:
        return (None, None, "tp", None)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H, D = c.hidden_size, c.head_dim
        Nq, Nk, I, V = c.num_heads, c.num_kv_heads, c.intermediate_size, c.vocab_size
        mt = c.model_type
        gpt2 = mt == "gpt2"
        gptpre = mt in ("gpt2", "gpt_bigcode")
        dbrx = mt == "dbrx"
        th = mt in ("exaone", "qwen")   # transformer.h.* llama clones
        ilm2 = mt == "internlm2"
        p3s = mt == "phi3small"
        cglm = mt == "chatglm"
        lpre = ("transformer.h.{l}." if (gptpre or th)
                else "transformer.blocks.{l}." if dbrx
                else "transformer.encoder.layers.{l}." if cglm
                else "model.layers.{l}.")
        opt_norm = mt == "olmo"   # OLMo v1: non-parametric LayerNorm
        s: dict[str, WeightSpec] = {
            "embed": WeightSpec(
                (V, H), (None, "tp"),
                "transformer.wte.weight" if (gptpre or dbrx or th)
                else "model.tok_embeddings.weight" if ilm2
                else "transformer.embedding.word_embeddings.weight" if cglm
                else "model.embed_tokens.weight"),
        }
        if c.learned_pos_embed:
            s["pos_embed"] = WeightSpec(
                (c.max_position_embeddings, H), (None, None),
                "transformer.wpe.weight")

        def norm(name: str, key: str, stacked: bool = True) -> None:
            s[name] = WeightSpec(
                (H,), (None,), key + ".weight", stacked=stacked,
                optional=opt_norm)
            if c.norm_bias:
                s[name + "_bias"] = WeightSpec(
                    (H,), (None,), key + ".bias", stacked=stacked,
                    optional=opt_norm)

        final_key = ("transformer.ln_f" if (gptpre or th)
                     else "transformer.norm_f" if dbrx
                     else "model.final_layernorm" if mt in ("phi",
                                                            "phi3small")
                     else "transformer.encoder.final_layernorm" if cglm
                     else "model.norm")
        norm("final_norm", final_key, stacked=False)
        if c.input_norms:
            norm("layers.input_norm",
                 lpre + ("ln_1" if (gptpre or th)
                         else "norm_attn_norm.norm_1" if dbrx
                         else "attention_norm" if ilm2
                         else "pre_attn_norm" if mt == "grok-1"
                         else "input_layernorm"))
            if not c.parallel_residual:
                # norm before the MLP: post_attention_layernorm, except
                # gemma2/3 sandwich where it is pre_feedforward_layernorm
                # (glm4's sandwich keeps the post_attention name)
                if gptpre or th:
                    pn = "ln_2"
                elif dbrx:
                    pn = "norm_attn_norm.norm_2"
                elif ilm2:
                    pn = "ffn_norm"
                elif mt == "grok-1":
                    pn = "pre_moe_norm"
                elif c.sandwich_norms and mt.startswith("gemma"):
                    pn = "pre_feedforward_layernorm"
                else:
                    pn = "post_attention_layernorm"
                norm("layers.post_norm", lpre + pn)

        # ---- attention projections (optionally from a fused source) ----
        qkv_fused = None   # (key, transpose, slicer)
        if mt == "phi3":
            qkv_fused = (lpre + "self_attn.qkv_proj", True, _rows)
        elif gpt2:
            qkv_fused = (lpre + "attn.c_attn", False, _cols)
        elif mt == "gpt_bigcode":
            qkv_fused = (lpre + "attn.c_attn", True, _rows)
        elif dbrx:
            qkv_fused = (lpre + "norm_attn_norm.attn.Wqkv", True, _rows)
        elif mt == "qwen":
            qkv_fused = (lpre + "attn.c_attn", True, _rows)
        elif mt == "baichuan":
            qkv_fused = (lpre + "self_attn.W_pack", True, _rows)
        elif cglm:
            qkv_fused = (lpre + "self_attention.query_key_value", True,
                         _rows)
        if ilm2 or p3s:
            # InternLM2 wqkv / Phi-3-small query_key_value are fused and
            # GQA-INTERLEAVED: view as [Nk, g+2, D, ...] — per kv head,
            # g query heads then k then v (reference
            # models/internlm2.py:335, models/phi3_small.py:222)
            g = Nq // Nk
            fqk = lpre + ("attention.wqkv" if ilm2
                          else "self_attn.query_key_value")

            def _gqa_slice(which, bias=False):
                def f(t):
                    t4 = t.reshape((Nk, g + 2, D) if bias
                                   else (Nk, g + 2, D, t.shape[-1]))
                    if which == "q":
                        part = t4[:, :g]
                    elif which == "k":
                        part = t4[:, g:g + 1]
                    else:
                        part = t4[:, g + 1:g + 2]
                    return part.reshape((-1,) if bias
                                        else (-1, t4.shape[-1]))
                return f

            for nm, n_out, which in [("wq", Nq * D, "q"), ("wk", Nk * D, "k"),
                                     ("wv", Nk * D, "v")]:
                s[f"layers.{nm}"] = WeightSpec(
                    (H, n_out), (None, "tp"), fqk + ".weight",
                    transpose=True, stacked=True, quantizable=True,
                    hf_pre=_gqa_slice(which))
                if c.attention_bias:
                    s[f"layers.b{which}"] = WeightSpec(
                        (n_out,), ("tp",), fqk + ".bias", stacked=True,
                        hf_pre=_gqa_slice(which, bias=True))
        elif qkv_fused is not None:
            fkey, ftr, fsl = qkv_fused
            offs = [0, Nq * D, (Nq + Nk) * D, (Nq + 2 * Nk) * D]
            for i, (nm, n_out) in enumerate(
                    [("wq", Nq * D), ("wk", Nk * D), ("wv", Nk * D)]):
                s[f"layers.{nm}"] = WeightSpec(
                    (H, n_out), (None, "tp"), fkey + ".weight",
                    transpose=ftr, stacked=True, quantizable=True,
                    hf_pre=fsl(offs[i], offs[i + 1]))
        else:
            apre = ("attn.attention." if mt == "exaone"
                    else "self_attn.")
            for nm, n_out in [("wq", Nq * D), ("wk", Nk * D), ("wv", Nk * D)]:
                proj = f"{apre}{nm[1]}_proj"
                s[f"layers.{nm}"] = WeightSpec(
                    (H, n_out), (None, "tp"), lpre + proj + ".weight",
                    transpose=True, stacked=True, quantizable=True)
        o_key = (lpre + "self_attention.dense" if cglm
                 else lpre + "attn.c_proj" if (gptpre or mt == "qwen")
                 else lpre + "norm_attn_norm.attn.out_proj" if dbrx
                 else lpre + "self_attn.dense" if mt in ("phi", "phi3small")
                 else lpre + "attn.attention.out_proj" if mt == "exaone"
                 else lpre + "attention.wo" if ilm2
                 else lpre + "self_attn.o_proj")
        s["layers.wo"] = WeightSpec(
            (Nq * D, H), ("tp", None), o_key + ".weight",
            transpose=not gpt2, stacked=True, quantizable=True)
        if c.o_bias:
            s["layers.bo"] = WeightSpec(
                (H,), (None,), o_key + ".bias", stacked=True)
        if c.is_moe and dbrx:
            # DBRX stores each expert matrix as ONE fused tensor
            # [E*I, H] (DbrxExpertGLU w1/v1/w2); w2 is applied untransposed
            E, Im = c.num_experts, c.moe_intermediate_size
            ep = self.moe_impl in ("ep", "ep_a2a")
            ax = getattr(self, "moe_axis", "tp")
            pg = (ax, None, None) if ep else (None, None, "tp")
            pd = (ax, None, None) if ep else (None, "tp", None)

            def _expand(transpose_last):
                def f(t):
                    t = t.reshape(E, Im, H)
                    return t.transpose(0, 2, 1) if transpose_last else t
                return f

            s["layers.w_router"] = WeightSpec(
                (H, E), (None, None), lpre + "ffn.router.layer.weight",
                transpose=True, stacked=True)
            s["layers.we_gate"] = WeightSpec(
                (E, H, Im), pg, lpre + "ffn.experts.mlp.w1",
                stacked=True, hf_pre=_expand(True))
            s["layers.we_up"] = WeightSpec(
                (E, H, Im), pg, lpre + "ffn.experts.mlp.v1",
                stacked=True, hf_pre=_expand(True))
            s["layers.we_down"] = WeightSpec(
                (E, Im, H), pd, lpre + "ffn.experts.mlp.w2",
                stacked=True, hf_pre=_expand(False))
        elif c.is_moe:
            E, Im = c.num_experts, c.moe_intermediate_size
            keys = self.MOE_KEYS[c.model_type]
            # EP shards the expert dim; TP (dense dispatch) shards the
            # expert intermediate dim
            ep = self.moe_impl in ("ep", "ep_a2a")
            ax = getattr(self, "moe_axis", "tp")
            pg = (ax, None, None) if ep else (None, None, "tp")
            pd = (ax, None, None) if ep else (None, "tp", None)
            # mixed dense/MoE stacks go in their own param groups so each
            # stacks only over its own layers (see __init__ slot tables)
            mixed = c.moe_layer_mask is not None
            g = "moe" if mixed else "layers"
            kw: dict = dict(stacked=True)
            if mixed:
                moe_ls = [i for i, m in enumerate(c.moe_layer_mask) if m]
                kw.update(num_stack=len(moe_ls), layer_map=moe_ls)
            s[f"{g}.w_router"] = WeightSpec(
                (H, E), (None, None), keys["router"], transpose=True, **kw)
            if mt == "llama4":
                # fused [E, H, 2I] gate_up + [E, I, H] down, stored
                # pre-transposed (bmm convention, Llama4TextExperts)
                guk = "model.layers.{l}.feed_forward.experts.gate_up_proj"
                s[f"{g}.we_gate"] = WeightSpec(
                    (E, H, Im), pg, guk, hf_pre=lambda t: t[:, :, :Im], **kw)
                s[f"{g}.we_up"] = WeightSpec(
                    (E, H, Im), pg, guk, hf_pre=lambda t: t[:, :, Im:], **kw)
                s[f"{g}.we_down"] = WeightSpec(
                    (E, Im, H), pd,
                    "model.layers.{l}.feed_forward.experts.down_proj", **kw)
            else:
                s[f"{g}.we_gate"] = WeightSpec(
                    (E, H, Im), pg, keys["gate"],
                    transpose=True, num_experts=E, **kw)
                s[f"{g}.we_up"] = WeightSpec(
                    (E, H, Im), pg, keys["up"],
                    transpose=True, num_experts=E, **kw)
                s[f"{g}.we_down"] = WeightSpec(
                    (E, Im, H), pd, keys["down"],
                    transpose=True, num_experts=E, **kw)
            if c.shared_expert_size:
                Is = c.shared_expert_size
                sk = keys["shared"]
                s[f"{g}.ws_gate"] = WeightSpec(
                    (H, Is), (None, "tp"), sk + "gate_proj.weight",
                    transpose=True, **kw)
                s[f"{g}.ws_up"] = WeightSpec(
                    (H, Is), (None, "tp"), sk + "up_proj.weight",
                    transpose=True, **kw)
                s[f"{g}.ws_down"] = WeightSpec(
                    (Is, H), ("tp", None), sk + "down_proj.weight",
                    transpose=True, **kw)
            if c.shared_expert_gated:
                s[f"{g}.ws_scalar_gate"] = WeightSpec(
                    (H, 1), (None, None), keys["shared_gate"],
                    transpose=True, **kw)
            if mixed:
                # dense-MLP stack over the non-MoE layers
                dense_ls = [i for i, m in enumerate(c.moe_layer_mask)
                            if not m]
                dkw = dict(stacked=True, num_stack=len(dense_ls),
                           layer_map=dense_ls, quantizable=True,
                           transpose=True)
                dpre = (lpre + "feed_forward." if mt == "llama4"
                        else lpre + "mlp.")
                s["dense.w_gate"] = WeightSpec(
                    (H, I), (None, "tp"), dpre + "gate_proj.weight", **dkw)
                s["dense.w_up"] = WeightSpec(
                    (H, I), (None, "tp"), dpre + "up_proj.weight", **dkw)
                s["dense.w_down"] = WeightSpec(
                    (I, H), ("tp", None), dpre + "down_proj.weight", **dkw)
        elif not c.mlp_gated:
            # two-linear MLP (GPT-2 c_fc/c_proj, Phi fc1/fc2, Starcoder2)
            if gpt2:
                k1, k2, tr = lpre + "mlp.c_fc", lpre + "mlp.c_proj", False
            elif mt == "phi":
                k1, k2, tr = lpre + "mlp.fc1", lpre + "mlp.fc2", True
            else:
                k1, k2, tr = lpre + "mlp.c_fc", lpre + "mlp.c_proj", True
            s["layers.w_fc1"] = WeightSpec(
                (H, I), (None, "tp"), k1 + ".weight",
                transpose=tr, stacked=True, quantizable=True)
            s["layers.w_fc2"] = WeightSpec(
                (I, H), ("tp", None), k2 + ".weight",
                transpose=tr, stacked=True, quantizable=True)
            if c.mlp_bias:
                s["layers.b_fc1"] = WeightSpec(
                    (I,), ("tp",), k1 + ".bias", stacked=True)
                s["layers.b_fc2"] = WeightSpec(
                    (H,), (None,), k2 + ".bias", stacked=True)
        elif p3s:
            # Phi-3-small fused up_proj [2I, H] is CHANNEL-INTERLEAVED for
            # gegelu: even rows feed the gelu branch, odd rows the linear
            # branch (reference models/phi3_small.py:37 gegelu)
            upk = lpre + "mlp.up_proj"

            def _every_other(start):
                return lambda t: t[start::2]

            for nm, st in (("w_gate", 0), ("w_up", 1)):
                s[f"layers.{nm}"] = WeightSpec(
                    (H, I), (None, "tp"), upk + ".weight", transpose=True,
                    stacked=True, quantizable=True, hf_pre=_every_other(st))
                s[f"layers.b{nm[1:]}"] = WeightSpec(
                    (I,), ("tp",), upk + ".bias", stacked=True,
                    hf_pre=_every_other(st))
            s["layers.w_down"] = WeightSpec(
                (I, H), ("tp", None), lpre + "mlp.down_proj.weight",
                transpose=True, stacked=True, quantizable=True)
            s["layers.b_down"] = WeightSpec(
                (H,), (None,), lpre + "mlp.down_proj.bias", stacked=True)
        elif mt in ("phi3", "glm", "glm4", "chatglm"):
            # fused gate_up_proj [2I, H] (chatglm: dense_h_to_4h swiglu)
            guk = lpre + ("mlp.dense_h_to_4h.weight" if cglm
                          else "mlp.gate_up_proj.weight")
            s["layers.w_gate"] = WeightSpec(
                (H, I), (None, "tp"), guk, transpose=True, stacked=True,
                quantizable=True, hf_pre=_rows(0, I))
            s["layers.w_up"] = WeightSpec(
                (H, I), (None, "tp"), guk, transpose=True, stacked=True,
                quantizable=True, hf_pre=_rows(I, 2 * I))
            s["layers.w_down"] = WeightSpec(
                (I, H), ("tp", None),
                lpre + ("mlp.dense_4h_to_h.weight" if cglm
                        else "mlp.down_proj.weight"),
                transpose=True, stacked=True, quantizable=True)
        else:
            gk, uk, dk = {
                "exaone": ("mlp.c_fc_0", "mlp.c_fc_1", "mlp.c_proj"),
                "qwen": ("mlp.w2", "mlp.w1", "mlp.c_proj"),
                "internlm2": ("feed_forward.w1", "feed_forward.w3",
                              "feed_forward.w2"),
            }.get(mt, ("mlp.gate_proj", "mlp.up_proj", "mlp.down_proj"))
            s["layers.w_gate"] = WeightSpec(
                (H, I), (None, "tp"), lpre + gk + ".weight",
                transpose=True, stacked=True, quantizable=True)
            s["layers.w_up"] = WeightSpec(
                (H, I), (None, "tp"), lpre + uk + ".weight",
                transpose=True, stacked=True, quantizable=True)
            s["layers.w_down"] = WeightSpec(
                (I, H), ("tp", None), lpre + dk + ".weight",
                transpose=True, stacked=True, quantizable=True)
        if c.attention_bias and not (ilm2 or p3s):   # interleaved: see above
            if qkv_fused is not None and (gptpre or mt == "qwen" or cglm):
                bkey = qkv_fused[0] + ".bias"
                offs = [0, Nq * D, (Nq + Nk) * D, (Nq + 2 * Nk) * D]
                for i, (nm, n_out) in enumerate(
                        [("bq", Nq * D), ("bk", Nk * D), ("bv", Nk * D)]):
                    s[f"layers.{nm}"] = WeightSpec(
                        (n_out,), ("tp",), bkey, stacked=True,
                        hf_pre=_rows(offs[i], offs[i + 1]))
            else:
                for nm, n_out, p in [("bq", Nq * D, "q"), ("bk", Nk * D, "k"),
                                     ("bv", Nk * D, "v")]:
                    s[f"layers.{nm}"] = WeightSpec(
                        (n_out,), ("tp",),
                        lpre + f"self_attn.{p}_proj.bias", stacked=True)
        if c.sandwich_norms:
            pa, pf = (("post_self_attn_layernorm", "post_mlp_layernorm")
                      if mt == "glm4" else
                      ("post_attn_norm", "post_moe_norm")
                      if mt == "grok-1" else
                      ("post_attention_layernorm", "post_feedforward_layernorm"))
            norm("layers.post_attn_norm", lpre + pa)
            norm("layers.post_ffw_norm", lpre + pf)
        if c.qk_norm:
            s["layers.q_norm"] = WeightSpec(
                (D,), (None,), lpre + "self_attn.q_norm.weight",
                stacked=True)
            s["layers.k_norm"] = WeightSpec(
                (D,), (None,), lpre + "self_attn.k_norm.weight",
                stacked=True)
        if c.qk_norm_post:
            # HunYuan: per-head q/k RMSNorm applied AFTER rope
            s["layers.q_norm"] = WeightSpec(
                (D,), (None,), lpre + "self_attn.query_layernorm.weight",
                stacked=True)
            s["layers.k_norm"] = WeightSpec(
                (D,), (None,), lpre + "self_attn.key_layernorm.weight",
                stacked=True)
        if c.qk_norm_full:
            # OLMo2/OLMoE: RMSNorm over the FULL q/k projection width,
            # applied before the head reshape (HF Olmo2Attention order)
            s["layers.q_norm"] = WeightSpec(
                (Nq * D,), ("tp",), lpre + "self_attn.q_norm.weight",
                stacked=True)
            s["layers.k_norm"] = WeightSpec(
                (Nk * D,), ("tp",), lpre + "self_attn.k_norm.weight",
                stacked=True)
        if c.num_labels and c.reward_head_2layer:
            # Qwen2ForRewardModel: Linear(H,H) + ReLU + Linear(H,labels)
            s["score_w0"] = WeightSpec((H, H), (None, None),
                                       "score.0.weight", transpose=True)
            s["score_b0"] = WeightSpec((H,), (None,), "score.0.bias")
            s["score_w2"] = WeightSpec((H, c.num_labels), (None, None),
                                       "score.2.weight", transpose=True)
            s["score_b2"] = WeightSpec((c.num_labels,), (None,),
                                       "score.2.bias")
        elif c.num_labels:
            # sequence classification / reward head (reference
            # models/llama_classification.py / llama_reward.py): scores
            # replace the LM head for pooled requests
            s["score"] = WeightSpec(
                (H, c.num_labels), (None, None),
                c.classification_head_key
                or ("v_head.weight" if ilm2 else "score.weight"),
                transpose=True)
        if not c.tie_word_embeddings and not c.num_labels:
            # *ForSequenceClassification checkpoints ship no lm_head
            head_key = ("output.weight" if ilm2
                        else "transformer.output_layer.weight" if cglm
                        else "lm_head.weight")
            head_pre = None
            if mt == "baichuan" and V == 125696:
                # Baichuan2 NormHead: row-normalize the head at load
                # (reference models/baichuan.py:395)
                def head_pre(t):
                    n = np.linalg.norm(t, axis=1, keepdims=True)
                    return t / np.maximum(n, 1e-12)
            s["lm_head"] = WeightSpec(
                (H, V), (None, "tp"), head_key, transpose=True,
                hf_pre=head_pre,
                # --quantize-lm-head: the bf16 head is ~1.3 ms of a 8B
                # decode step (1 GB read); INT4 cuts it ~4x. Opt-in — AWQ
                # checkpoints conventionally keep the head high-precision
                quantizable=getattr(c, "quantize_lm_head", False))
            if c.lm_head_bias:
                s["lm_head_bias"] = WeightSpec(
                    (V,), ("tp",), "lm_head.bias")
        return s

    def pooled_output(self, params: dict[str, Any],
                      last_h: jnp.ndarray) -> jnp.ndarray:
        """Embedding-request output per sequence: classification/reward
        scores when the model has a score head, else the raw hidden state
        (reference layers/pooler.py last-token pooling)."""
        if self.config.num_labels and self.config.reward_head_2layer:
            x = (last_h.astype(jnp.float32)
                 @ params["score_w0"].astype(jnp.float32)
                 + params["score_b0"])
            x = jax.nn.relu(x)
            return (x @ params["score_w2"].astype(jnp.float32)
                    + params["score_b2"])
        if self.config.num_labels:
            return (last_h.astype(jnp.float32)
                    @ params["score"].astype(jnp.float32))
        x = last_h.astype(jnp.float32)
        if self.config.normalize_pooled:
            # LlamaEmbeddingModel / MistralModel (reference
            # models/llama_embedding.py): Pooler(LAST, normalize=True)
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-9)
        return x

    # ----------------------------------------------------- quant fusion

    def fuse_quantized_projections(self, params: dict) -> dict:
        """Single-shard quantized serving: concatenate q/k/v (and
        gate/up) QuantizedWeights along the output axis so each decode
        layer runs ONE fused dequant-GEMM instead of three (two) — kernel
        launches and small-N grids dominate the weight-bound decode step.
        Returns a new params dict; no-op when the projections are not
        uniformly quantized (biases and LoRA are handled by the caller
        gating). NOT valid under TP: the concat axis is the sharded one
        and a plain split would mis-map GQA heads across ranks."""
        from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

        lp = params.get("layers")
        if not isinstance(lp, dict):
            return params

        def fuse(names):
            ws = [lp.get(n) for n in names]
            if not all(isinstance(w, QuantizedWeight) for w in ws):
                return None
            if len({w.packed for w in ws}) != 1 or \
                    len({w.block for w in ws}) != 1 or \
                    len({w.q.dtype for w in ws}) != 1 or \
                    len({w.q.shape[:-1] for w in ws}) != 1:
                return None
            if ws[0].block and any(w.q.shape[-1] % 128 for w in ws):
                # blockwise scales concat along columns only when every
                # piece is 128-column aligned (block boundaries preserved)
                return None
            has_zs = [w.zero_scale is not None for w in ws]
            if any(has_zs) and not all(has_zs):
                return None
            q = jnp.concatenate([w.q for w in ws], axis=-1)
            s = jnp.concatenate([w.scale for w in ws], axis=-1)
            zs = (jnp.concatenate([w.zero_scale for w in ws], axis=-1)
                  if all(has_zs) else None)
            return QuantizedWeight(q=q, scale=s, zero_scale=zs,
                                   packed=ws[0].packed, block=ws[0].block)

        new_lp = dict(lp)
        qkv = fuse(("wq", "wk", "wv"))
        if qkv is not None:
            new_lp["wqkv_fused"] = qkv
            for n in ("wq", "wk", "wv"):
                del new_lp[n]
        if self.config.mlp_gated and self.config.hidden_act != "gegelu":
            gu = fuse(("w_gate", "w_up"))
            if gu is not None:
                new_lp["w_gateup_fused"] = gu
                for n in ("w_gate", "w_up"):
                    del new_lp[n]
        out = dict(params)
        out["layers"] = new_lp
        return out

    # ----------------------------------------------- fused decode (r5)

    def _fused_decode_mode(self, fb, quant_stacked, layer_params,
                           attn_mode, kv_split, dp_attn, ds,
                           lora_onehot, capture_experts, aux_capture,
                           hidden_in):
        """Pick the fused whole-layer megakernel mode for this decode
        step, or None for the scan path (ops/fused_layer.py — one
        persistent weight+KV DMA pipeline across all layers). Env:
        IAAS_FUSED_LAYER=0 disables; =interp forces the interpret-mode
        kernel (CPU parity tests)."""
        import os

        env = os.environ.get("IAAS_FUSED_LAYER", "1")
        if env == "0" or not getattr(self, "enable_fused_layer", True):
            return None
        interp = env == "interp"
        if not interp:
            from iaas_sglang_tpu.quantization.qlinear import _INT4_IMPL

            if _INT4_IMPL != "pallas":   # only on the real TPU path
                return None
        c = self.config
        if not (attn_mode == "decode" and kv_split and not dp_attn
                and not ds and lora_onehot is None and not capture_experts
                and aux_capture is None and hidden_in is None):
            return None
        if (fb.tree_bits is not None or fb.mm_embeds is not None
                or fb.mrope_positions is not None):
            return None
        T = fb.positions.shape[0]
        if fb.kv_lens.ndim != 1 or T != fb.kv_lens.shape[0]:
            return None
        if not (c.input_norms and not c.sandwich_norms
                and not c.parallel_residual and c.norm_type != "layernorm"
                and c.rms_weight_offset == 0
                and not c.attention_bias and not c.o_bias and not c.mlp_bias
                and not c.clip_qkv and not c.qk_norm and not c.qk_norm_post
                and not c.qk_norm_full and not c.qk_l2_norm
                and c.attn_temp_scale is None
                and c.use_rope and c.mrope_section is None
                and not c.rope_interleaved
                and self.rotary_dim == c.head_dim
                and self.rope_layer_mask is None
                and self.layer_windows is None
                and self.inv_freq_local is None
                and not c.sliding_window and not c.attn_logit_softcap
                and c.mlp_gated and c.hidden_act == "silu"
                and not c.is_moe and self.is_moe_layer is None
                and c.residual_multiplier == 1.0
                and c.embed_multiplier == 1.0
                and not c.learned_pos_embed
                and c.head_dim == 128):
            return None
        if ("input_norm" not in layer_params
                or "post_norm" not in layer_params):
            return None
        from iaas_sglang_tpu.quantization.qlinear import (
            _W4A8, QuantizedWeight)

        ws = [quant_stacked.get(k) for k in
              ("wqkv_fused", "wo", "w_gateup_fused", "w_down")]
        if not all(isinstance(w_, QuantizedWeight) for w_ in ws):
            return None
        if any(w_.zero_scale is not None or w_.block for w_ in ws):
            return None
        packed = {w_.packed for w_ in ws}
        if len(packed) != 1:
            return None
        int4 = packed.pop()
        if not int4 and any(w_.q.dtype != jnp.int8 for w_ in ws):
            return None
        for w_ in ws:
            K = w_.q.shape[1] * (2 if int4 else 1)
            if w_.scale.shape[1] * 128 != K:
                return None   # needs group-128 scales
            if not interp and (K % 2048 or w_.q.shape[2] % 1024):
                return None   # ring-slot alignment (tiny models: interp)
        mode = ("w4a8" if int4 and T <= 64 and _W4A8
                else "w4a16" if int4 else "w8a16")
        return (mode, interp)

    def _fused_forward(self, fused_mode, hidden, fb, kv_pages,
                       quant_stacked, layer_params, pages_per_layer, ps):
        """Run all decoder layers through the fused megakernel; the new
        K/V rows land in the pool IN-KERNEL via the aliased output (an
        XLA scatter on the pool measured ~1.5 ms/step — r5 glue
        attribution)."""
        from iaas_sglang_tpu.ops.fused_layer import fused_decode_layers

        mode, interp = fused_mode
        c = self.config
        freqs = (fb.positions.astype(jnp.float32)[:, None]
                 * self.inv_freq[None, :])
        cos = jnp.cos(freqs) * self.rope_attn_factor
        sin = jnp.sin(freqs) * self.rope_attn_factor
        qkv, o, gu, dn = (quant_stacked[k] for k in
                          ("wqkv_fused", "wo", "w_gateup_fused", "w_down"))
        hidden, _k, _v, kv_pages = fused_decode_layers(
            hidden.astype(jnp.bfloat16), cos, sin, fb.kv_lens,
            fb.out_slots, fb.page_indices, kv_pages,
            layer_params["input_norm"], layer_params["post_norm"],
            qkv.q, qkv.scale, o.q, o.scale, gu.q, gu.scale,
            dn.q, dn.scale,
            num_q_heads=c.num_heads, num_kv_heads=c.num_kv_heads,
            head_dim=c.head_dim, mode=mode, sm_scale=float(self.sm_scale),
            eps=c.rms_norm_eps, pages_per_layer=pages_per_layer,
            interpret=interp)
        return hidden, kv_pages

    def fused_greedy_decode(self, params, fb, kv_pages, *,
                            attn_backend, scan_layers):
        """Whole greedy decode step — layers AND final norm + lm_head +
        argmax — in the megakernel (the XLA head tail is ~1.3 ms of an
        8B step). Returns (tokens i32[T], kv_pages) or None when any
        eligibility gate fails (caller falls back to forward +
        compute_logits)."""
        import os

        from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

        dbg = os.environ.get("IAAS_FUSED_DEBUG") == "1"
        c = self.config
        head = params.get("lm_head")
        if (not scan_layers or c.num_labels or head is None
                or isinstance(head, QuantizedWeight)
                or "lm_head_bias" in params
                or c.logits_scale != 1.0 or c.final_logit_softcap
                or c.dummy_token_indices or "final_norm" not in params
                or isinstance(kv_pages, tuple)
                or fb.kv_lens.ndim != 1
                or kv_pages.ndim != 4 or kv_pages.shape[0] != 2):
            if dbg:
                print("[fused-head gate] basic:",
                      scan_layers, c.num_labels, head is None,
                      isinstance(head, QuantizedWeight),
                      "lm_head_bias" in params, c.logits_scale,
                      c.final_logit_softcap, c.dummy_token_indices,
                      "final_norm" in params, isinstance(kv_pages, tuple),
                      fb.kv_lens.ndim, kv_pages.ndim, flush=True)
            return None
        V = head.shape[1]
        if not any(V % cand == 0
                   for cand in (1024, 768, 512, 384, 256, 128)):
            return None
        layer_params = dict(params["layers"])
        quant_stacked = {}
        for k in list(layer_params):
            if isinstance(layer_params[k], QuantizedWeight):
                quant_stacked[k] = layer_params.pop(k)
        L = jax.tree.leaves(params["layers"])[0].shape[0]
        kv_split = True
        pages_per_layer = kv_pages.shape[1] // L
        fm = self._fused_decode_mode(
            fb, quant_stacked, layer_params, "decode", kv_split, False,
            False, None, False, None, None)
        if fm is None:
            if dbg:
                print("[fused-head gate] _fused_decode_mode None",
                      flush=True)
            return None
        mode, interp = fm
        if dbg:
            print("[fused-head gate] ENGAGED mode", mode, flush=True)
        from iaas_sglang_tpu.ops.fused_layer import fused_decode_layers

        hidden = params["embed"][fb.input_ids]
        freqs = (fb.positions.astype(jnp.float32)[:, None]
                 * self.inv_freq[None, :])
        cos = jnp.cos(freqs) * self.rope_attn_factor
        sin = jnp.sin(freqs) * self.rope_attn_factor
        qkv, o, gu, dn = (quant_stacked[k] for k in
                          ("wqkv_fused", "wo", "w_gateup_fused", "w_down"))
        outs = fused_decode_layers(
            hidden.astype(jnp.bfloat16), cos, sin, fb.kv_lens,
            fb.out_slots, fb.page_indices, kv_pages,
            layer_params["input_norm"], layer_params["post_norm"],
            qkv.q, qkv.scale, o.q, o.scale, gu.q, gu.scale,
            dn.q, dn.scale,
            num_q_heads=c.num_heads, num_kv_heads=c.num_kv_heads,
            head_dim=c.head_dim, mode=mode, sm_scale=float(self.sm_scale),
            eps=c.rms_norm_eps, pages_per_layer=pages_per_layer,
            interpret=interp,
            head_w=head.astype(jnp.bfloat16),
            final_norm=params["final_norm"])
        return outs[4][:, 0], outs[3]

    # ------------------------------------------------------------- forward

    def forward(
        self,
        params: dict[str, Any],
        fb: ForwardBatch,
        kv_pages: jnp.ndarray,   # [L*(P+1), ps, 2*Nk, D] flat page space
        *,
        attn_backend: str,
        attn_mode: str = "extend",
        scan_layers: bool = True,
        lora=None,
        capture_experts: bool = False,
        layer_offset: int = 0,
        hidden_in: Optional[jnp.ndarray] = None,
        apply_final_norm: bool = True,
        aux_capture: Optional[tuple] = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        c = self.config
        # number of layers present IN THESE PARAMS: a pipeline stage passes
        # a slice of the stacked layer weights + its own kv pool slice
        L = jax.tree.leaves(params["layers"])[0].shape[0]
        # double sparsity: kv carry is (kv, heavy-channel labels)
        ds = isinstance(kv_pages, tuple)
        kv_main0 = kv_pages[0] if ds else kv_pages
        # DP attention: the pool carries a leading attention-rank dim and
        # batch metadata is rank-stacked — kv_lens [G, B_r] is the
        # unambiguous signal (the K/V-split pool is also 5D: r4)
        dp_attn = (not ds) and fb.kv_lens.ndim == 2
        # K/V-split pool is plane-outermost [(G,) 2, NP, ps, NkD]: the
        # page-count / page-size dims sit one slot further in than the
        # interleaved [(G,) NP, ps, 2Nk, D] (plane dim == 2; a page count
        # is always > 2)
        lead = 1 if dp_attn else 0
        kv_split = kv_main0.shape[lead] == 2
        pages_per_layer = kv_main0.shape[lead + (1 if kv_split else 0)] // L
        ps = kv_main0.shape[lead + (2 if kv_split else 1)]

        from iaas_sglang_tpu.layers.norms import layer_norm

        def norm_fn(x, src, base):
            w = src[base]
            if c.norm_type == "layernorm":
                return layer_norm(x, w, src.get(base + "_bias"),
                                  c.rms_norm_eps)
            return rms_norm(x, w + c.rms_weight_offset, c.rms_norm_eps)

        if hidden_in is not None:
            hidden = hidden_in          # pipeline stage > 0
        else:
            hidden = params["embed"][fb.input_ids]  # [T, H]
            if c.embed_multiplier != 1.0:
                # Gemma scales token embeddings by sqrt(hidden) BEFORE the
                # image rows are inserted (HF merges image features into
                # the already-normalized embeds)
                hidden = hidden * jnp.asarray(c.embed_multiplier,
                                              hidden.dtype)
            if fb.mm_embeds is not None:
                # VLM: overwrite image-placeholder rows with projected
                # vision embeddings (the reference's input-embedding merge;
                # padding positions point past T and are dropped)
                hidden = hidden.at[fb.mm_positions].set(
                    fb.mm_embeds.astype(hidden.dtype), mode="drop")
            if c.learned_pos_embed:
                hidden = hidden + params["pos_embed"][fb.positions].astype(
                    hidden.dtype)
        lora_onehot = None
        lora_grouped = None
        if lora is not None and fb.lora_ids is not None:
            S1 = lora["scaling"].shape[0]
            if "gmm" in lora:
                # grouped-matmul path (ops/lora.py): sort once per forward,
                # every delta reuses the order/group metadata
                order = jnp.argsort(fb.lora_ids)
                gs = jnp.bincount(fb.lora_ids, length=S1)
                scale_sorted = lora["scaling"][fb.lora_ids[order]]
                lora_grouped = (order, gs, scale_sorted)
                lora_onehot = True  # sentinel: deltas enabled
            else:
                lora_onehot = jax.nn.one_hot(
                    fb.lora_ids, S1, dtype=jnp.float32)
                lora_onehot = lora_onehot * lora["scaling"][None, :]

        def lora_delta(x, A_l, B_l):
            """x [T, Hin]; A_l [S+1, Hin, r]; B_l [S+1, r, Hout] ->
            per-token adapter delta [T, Hout]."""
            if lora_grouped is not None:
                from iaas_sglang_tpu.ops.lora import lora_gmm_delta

                order, gs, ssort = lora_grouped
                return lora_gmm_delta(x, A_l, B_l, order, gs, ssort)
            xa = jnp.einsum(
                "th,shr->tsr", x.astype(jnp.float32), A_l)
            xa = xa * lora_onehot[:, :, None]
            return jnp.einsum("tsr,sro->to", xa, B_l)

        def layer_body(carry, xs):
            hidden, kv = carry
            lp, layer_idx, global_idx = xs
            if quant_stacked:
                # stacked quantized weights stay OUT of the scan xs (their
                # dynamic-slice would materialize an HBM copy per layer —
                # see QuantLayerRef); qmatmul indexes the stack in-kernel
                from iaas_sglang_tpu.quantization.qlinear import (
                    QuantLayerRef)

                lp = {**lp, **{k: QuantLayerRef(qw, layer_idx)
                               for k, qw in quant_stacked.items()}}
            if c.input_norms:
                h = norm_fn(hidden, lp, "input_norm")
            else:
                h = hidden   # OLMo2: attention runs on the raw residual
            if "wqkv_fused" in lp:
                # single-shard quantized decode: one fused dequant-GEMM
                # call instead of three (fuse_quantized_projections)
                qkv = qmatmul(h, lp["wqkv_fused"])
                NqD = c.num_heads * c.head_dim
                NkD = c.num_kv_heads * c.head_dim
                q = qkv[..., :NqD]
                k = qkv[..., NqD:NqD + NkD]
                v = qkv[..., NqD + NkD:]
            else:
                q = qmatmul(h, lp["wq"])
                k = qmatmul(h, lp["wk"])
                v = qmatmul(h, lp["wv"])
            if lora_onehot is not None:
                dt = q.dtype
                q = q + lora_delta(h, lp["lora_A_wq"], lp["lora_B_wq"]).astype(dt)
                k = k + lora_delta(h, lp["lora_A_wk"], lp["lora_B_wk"]).astype(dt)
                v = v + lora_delta(h, lp["lora_A_wv"], lp["lora_B_wv"]).astype(dt)
            if c.attention_bias:
                q = q + lp["bq"]
                k = k + lp["bk"]
                v = v + lp["bv"]
            if c.clip_qkv:
                q = jnp.clip(q, -c.clip_qkv, c.clip_qkv)
                k = jnp.clip(k, -c.clip_qkv, c.clip_qkv)
                v = jnp.clip(v, -c.clip_qkv, c.clip_qkv)
            if c.qk_norm_full:
                # OLMo2/OLMoE: full-width RMSNorm before the head reshape
                q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
            T = q.shape[0]
            q = q.reshape(T, c.num_heads, c.head_dim)
            k = k.reshape(T, c.num_kv_heads, c.head_dim)
            v = v.reshape(T, c.num_kv_heads, c.head_dim)
            if c.qk_norm:
                q = rms_norm(q, lp["q_norm"] + c.rms_weight_offset,
                             c.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"] + c.rms_weight_offset,
                             c.rms_norm_eps)
            inv_freq = self.inv_freq
            if self.inv_freq_local is not None:
                inv_freq = jnp.where(
                    self.layer_is_local[global_idx],
                    self.inv_freq_local, self.inv_freq)
            if not c.use_rope:
                pass   # learned absolute positions added at the embedding
            elif c.mrope_section and fb.mrope_positions is not None:
                q, k = apply_rope(q, k, fb.mrope_positions, inv_freq,
                                  self.rope_attn_factor,
                                  mrope_section=c.mrope_section)
            elif self.rotary_dim < c.head_dim:
                rd = self.rotary_dim
                qr, kr = apply_rope(q[..., :rd], k[..., :rd], fb.positions,
                                    inv_freq, self.rope_attn_factor,
                                    interleaved=c.rope_interleaved)
                q = jnp.concatenate([qr, q[..., rd:]], axis=-1)
                k = jnp.concatenate([kr, k[..., rd:]], axis=-1)
            elif self.rope_layer_mask is not None:
                # NoPE layers (SmolLM3 / EXAONE-4 global attention):
                # select per traced layer index inside the scan
                q2, k2 = apply_rope(q, k, fb.positions, inv_freq,
                                    self.rope_attn_factor,
                                    interleaved=c.rope_interleaved)
                use = self.rope_layer_mask[global_idx]
                q = jnp.where(use, q2, q)
                k = jnp.where(use, k2, k)
            else:
                q, k = apply_rope(q, k, fb.positions, inv_freq,
                                  self.rope_attn_factor,
                                  interleaved=c.rope_interleaved)

            if c.qk_norm_post:
                # HunYuan: post-rope per-head q/k RMSNorm
                q = rms_norm(q, lp["q_norm"], c.rms_norm_eps)
                k = rms_norm(k, lp["k_norm"], c.rms_norm_eps)
            if c.qk_l2_norm:
                # Llama-4: weightless post-rope q/k l2-norm, rope layers
                # only (Llama4TextL2Norm exists only when use_rope)
                def _l2(x):
                    return (x * jax.lax.rsqrt(
                        jnp.mean(jnp.square(x.astype(jnp.float32)), -1,
                                 keepdims=True) + c.rms_norm_eps)
                            ).astype(x.dtype)

                use = self.rope_layer_mask[global_idx]
                q = jnp.where(use, _l2(q), q)
                k = jnp.where(use, _l2(k), k)
            if c.attn_temp_scale is not None:
                # Llama-4 NoPE layers: q temperature grows with log of the
                # absolute position (attn_temperature_tuning,
                # https://huggingface.co/papers/2501.19399)
                scale = (jnp.log1p(jnp.floor(
                    (fb.positions.astype(jnp.float32) + 1.0)
                    / c.attn_temp_floor)) * c.attn_temp_scale + 1.0)
                q_t = (q.astype(jnp.float32)
                       * scale[:, None, None]).astype(q.dtype)
                q = jnp.where(self.rope_layer_mask[global_idx], q, q_t)

            if self.layer_windows is not None:
                window = self.layer_windows[global_idx]  # traced, -1 = full
            else:
                window = c.sliding_window
            slot_off = layer_idx * pages_per_layer * ps
            page_off = layer_idx * pages_per_layer
            if ds:
                kv_main, kv_lab = kv
                ch = self.ds_channels[global_idx]          # [Nk, r]
                labels = jnp.take_along_axis(
                    k, ch[None, :, :], axis=2)             # post-rope K
                kv_main = write_kv_pages(
                    kv_main, fb.out_slots + slot_off, k, v)
                kv_lab = write_label_pages(
                    kv_lab, fb.out_slots + slot_off, labels)
                kv = (kv_main, kv_lab)
                if attn_mode == "decode":
                    g = c.num_heads // c.num_kv_heads
                    qg = q.reshape(T, c.num_kv_heads, g, c.head_dim)
                    q_heavy = jnp.take_along_axis(
                        qg, ch[None, :, None, :], axis=3).sum(axis=2)
                    attn = ds_paged_decode_attention(
                        q, kv_main, kv_lab, q_heavy * self.sm_scale,
                        fb.kv_lens, fb.page_indices + page_off,
                        sm_scale=self.sm_scale,
                        heavy_tokens=self.ds_heavy_tokens,
                        logit_softcap=c.attn_logit_softcap,
                    )
                else:
                    attn = paged_attention(
                        q, kv_main, fb.kv_lens, fb.page_indices + page_off,
                        fb.cu_q_lens, fb.num_seqs,
                        sm_scale=self.sm_scale,
                        sliding_window=window,
                        window_chunked=self.window_chunked,
                        logit_softcap=c.attn_logit_softcap,
                        backend=attn_backend,
                        mode=attn_mode,
                    )
            elif dp_attn:
                kv = dp_write_kv_pages(
                    kv, fb.out_slots + slot_off, k, v, mesh=self.mesh)
                attn = dp_paged_attention(
                    q, kv, fb.kv_lens, fb.page_indices + page_off,
                    fb.cu_q_lens, fb.num_seqs, mesh=self.mesh,
                    sm_scale=self.sm_scale,
                    sliding_window=window,
                    window_chunked=self.window_chunked,
                    logit_softcap=c.attn_logit_softcap,
                    backend=attn_backend,
                    mode=attn_mode,
                )
            else:
                kv = write_kv_pages(kv, fb.out_slots + slot_off, k, v)
                attn = paged_attention(
                    q, kv, fb.kv_lens, fb.page_indices + page_off,
                    fb.cu_q_lens, fb.num_seqs,
                    sm_scale=self.sm_scale,
                    sliding_window=window,
                    window_chunked=self.window_chunked,
                    logit_softcap=c.attn_logit_softcap,
                    backend=attn_backend,
                    mode=attn_mode,
                    tree_bits=fb.tree_bits,
                )
            attn_flat = attn.reshape(T, c.num_heads * c.head_dim)
            attn_out = qmatmul(attn_flat, lp["wo"])
            if lora_onehot is not None:
                attn_out = attn_out + lora_delta(
                    attn_flat, lp["lora_A_wo"], lp["lora_B_wo"]
                ).astype(attn_out.dtype)
            if c.o_bias:
                attn_out = attn_out + lp["bo"]
            if c.sandwich_norms:
                attn_out = norm_fn(attn_out, lp, "post_attn_norm")
            rm = c.residual_multiplier
            if c.parallel_residual:
                # Phi/Cohere: attn and MLP share the input norm; both
                # residuals are added together at the end of the layer
                h2 = h
            else:
                hidden = hidden + (attn_out * rm if rm != 1.0 else attn_out)
                if c.input_norms:
                    h2 = norm_fn(hidden, lp, "post_norm")
                else:
                    h2 = hidden   # OLMo2: MLP on the raw residual
            counts = None
            if c.is_moe:
                from iaas_sglang_tpu.ops.moe import (
                    combine_weights, dense_expert_mix,
                    dense_expert_mix_input_scaled, moe_block, route_llama4,
                    route_sparsemixer)

                def run_routed(x, mp, cap):
                    if c.moe_gating == "softcap":
                        # Grok-1: tanh-capped logits, softmax over ALL
                        # experts, weights = probs at the top-k (no renorm)
                        from iaas_sglang_tpu.ops.moe import route_topk

                        logits = (x.astype(jnp.float32)
                                  @ mp["w_router"].astype(jnp.float32))
                        rc = c.router_logit_softcap
                        if rc:
                            logits = rc * jnp.tanh(logits / rc)
                        w, ids = route_topk(logits, c.num_experts_per_tok,
                                            renormalize=c.norm_topk_prob)
                        comb = combine_weights(ids, w, c.num_experts)
                        out = dense_expert_mix(
                            x, comb, mp["we_gate"], mp["we_up"],
                            mp["we_down"], act=c.hidden_act)
                        return (out, comb) if cap else out
                    if c.moe_gating == "sparsemixer":
                        logits = (x.astype(jnp.float32)
                                  @ mp["w_router"].astype(jnp.float32))
                        w, ids = route_sparsemixer(
                            logits, c.moe_router_jitter)
                        comb = combine_weights(ids, w, c.num_experts)
                        out = dense_expert_mix(
                            x, comb, mp["we_gate"], mp["we_up"],
                            mp["we_down"])
                        return (out, comb) if cap else out
                    if c.moe_gating == "llama4":
                        logits = (x.astype(jnp.float32)
                                  @ mp["w_router"].astype(jnp.float32))
                        w, ids = route_llama4(logits, c.num_experts_per_tok)
                        comb = combine_weights(ids, w, c.num_experts)
                        out = dense_expert_mix_input_scaled(
                            x, comb, mp["we_gate"], mp["we_up"],
                            mp["we_down"])
                        return (out, comb) if cap else out
                    return moe_block(
                        x, mp["w_router"], mp["we_gate"], mp["we_up"],
                        mp["we_down"],
                        top_k=c.num_experts_per_tok,
                        renormalize=c.norm_topk_prob,
                        impl=self.moe_impl,
                        mesh=self.mesh,
                        axis=self.moe_axis,
                        return_combine=cap,
                        expert_map=mp.get("expert_phys_map"),
                        expert_scale=mp.get("expert_phys_scale"),
                    )

                def moe_mlp(x, mp, cap):
                    """Routed experts + optional shared expert. Returns
                    (out, combine|None); combine only when cap."""
                    Tm = x.shape[0]
                    comb = None
                    if self.tbo and not cap and Tm % 2 == 0:
                        half = Tm // 2
                        out = jnp.concatenate(
                            [run_routed(x[:half], mp, False),
                             run_routed(x[half:], mp, False)], axis=0)
                    elif cap:
                        out, comb = run_routed(x, mp, True)
                    else:
                        out = run_routed(x, mp, False)
                    if c.shared_expert_size:
                        sg = qmatmul(x, mp["ws_gate"])
                        su = qmatmul(x, mp["ws_up"])
                        sh = qmatmul(jax.nn.silu(sg) * su, mp["ws_down"])
                        if c.shared_expert_gated:
                            # qwen2_moe: per-token scalar sigmoid gate
                            gate = jax.nn.sigmoid(
                                (x @ mp["ws_scalar_gate"]
                                 ).astype(jnp.float32))
                            sh = sh * gate.astype(sh.dtype)
                        out = out + sh
                    return out, comb

                combine = None
                if self.is_moe_layer is not None:
                    # mixed dense/MoE stack: gather this layer's slice
                    # from the group stacks, branch with lax.cond
                    def _moe_branch(x):
                        mp = jax.tree.map(
                            lambda a: a[self.moe_slot[global_idx]],
                            params["moe"])
                        out, comb = moe_mlp(x, mp, capture_experts)
                        return (out, comb) if capture_experts else out

                    def _dense_branch(x):
                        dpar = jax.tree.map(
                            lambda a: a[self.dense_slot[global_idx]],
                            params["dense"])
                        inter = (jax.nn.silu(qmatmul(x, dpar["w_gate"]))
                                 * qmatmul(x, dpar["w_up"]))
                        out = qmatmul(inter, dpar["w_down"])
                        if capture_experts:
                            return out, jnp.zeros(
                                (x.shape[0], c.num_experts), jnp.float32)
                        return out

                    r = jax.lax.cond(self.is_moe_layer[global_idx],
                                     _moe_branch, _dense_branch, h2)
                    mlp, combine = r if capture_experts else (r, None)
                else:
                    mlp, combine = moe_mlp(h2, lp, capture_experts)
                if capture_experts:
                    # EPLB distribution tap: tokens routed per expert
                    # (padding rows masked out via cu_q_lens). DP
                    # attention stacks cu_q_lens per rank [G, B_r+1] with
                    # rank-major tokens — mask each rank's tail by its
                    # own cu[num_seqs] (r4: recorder works under DP-attn)
                    Tt = combine.shape[0]
                    cu = fb.cu_q_lens
                    if cu.ndim == 2:
                        Gr = cu.shape[0]
                        lim = jnp.take_along_axis(
                            cu, fb.num_seqs[:, None], axis=1)[:, 0]  # [G]
                        tloc = jnp.arange(Tt) % (Tt // Gr)
                        valid = (tloc
                                 < jnp.repeat(lim, Tt // Gr))[:, None]
                    else:
                        valid = (jnp.arange(Tt) < cu[-1])[:, None]
                    counts = jnp.sum(
                        (combine > 0) & valid, axis=0).astype(jnp.int32)
            else:
                act_fn = (
                    (lambda x: jax.nn.gelu(x, approximate=True))
                    if "gelu" in c.hidden_act else jax.nn.silu
                )
                if not c.mlp_gated:
                    inter = qmatmul(h2, lp["w_fc1"])
                    if c.mlp_bias:
                        inter = inter + lp["b_fc1"]
                    inter = act_fn(inter)
                    mlp = qmatmul(inter, lp["w_fc2"])
                    if c.mlp_bias:
                        mlp = mlp + lp["b_fc2"]
                else:
                    if "w_gateup_fused" in lp:
                        # single-shard quantized decode: one fused call
                        gu = qmatmul(h2, lp["w_gateup_fused"])
                        I2 = gu.shape[-1] // 2
                        gate, up = gu[..., :I2], gu[..., I2:]
                    else:
                        gate = qmatmul(h2, lp["w_gate"])
                        up = qmatmul(h2, lp["w_up"])
                    if lora_onehot is not None:
                        gate = gate + lora_delta(
                            h2, lp["lora_A_w_gate"], lp["lora_B_w_gate"]
                        ).astype(gate.dtype)
                        up = up + lora_delta(
                            h2, lp["lora_A_w_up"], lp["lora_B_w_up"]
                        ).astype(up.dtype)
                    if c.mlp_bias and "b_gate" in lp:
                        gate = gate + lp["b_gate"]
                        up = up + lp["b_up"]
                    if c.hidden_act == "gegelu":
                        # quick_gelu(min(gate, lim)) * (clip(up, ±lim) + 1)
                        # (reference models/phi3_small.py:37)
                        lim = c.gegelu_limit
                        if lim is not None:
                            gate = jnp.minimum(gate, lim)
                            up = jnp.clip(up, -lim, lim)
                        inter = gate * jax.nn.sigmoid(1.702 * gate) \
                            * (up + 1.0)
                    else:
                        inter = act_fn(gate) * up
                    mlp = qmatmul(inter, lp["w_down"])
                    if c.mlp_bias and "b_down" in lp:
                        mlp = mlp + lp["b_down"]
                    if lora_onehot is not None:
                        mlp = mlp + lora_delta(
                            inter, lp["lora_A_w_down"], lp["lora_B_w_down"]
                        ).astype(mlp.dtype)
            if c.sandwich_norms:
                mlp = norm_fn(mlp, lp, "post_ffw_norm")
            if c.parallel_residual:
                hidden = hidden + attn_out + mlp
            else:
                hidden = hidden + (mlp * rm if rm != 1.0 else mlp)
            return (hidden, kv), counts

        layer_params = dict(params["layers"])
        if lora_onehot is not None:
            for t, A in lora["A"].items():
                layer_params[f"lora_A_{t}"] = A
                layer_params[f"lora_B_{t}"] = lora["B"][t]
        # stacked quantized weights bypass the scan xs (QuantLayerRef —
        # avoids the per-layer dynamic-slice HBM copy of the packed stack)
        from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

        quant_stacked = {}
        if scan_layers:
            for k in list(layer_params):
                if isinstance(layer_params[k], QuantizedWeight):
                    quant_stacked[k] = layer_params.pop(k)
        fused_mode = self._fused_decode_mode(
            fb, quant_stacked, layer_params, attn_mode, kv_split, dp_attn,
            ds, lora_onehot, capture_experts, aux_capture, hidden_in)
        if fused_mode is not None:
            hidden, kv_pages = self._fused_forward(
                fused_mode, hidden, fb, kv_pages, quant_stacked,
                layer_params, pages_per_layer, ps)
            if apply_final_norm:
                hidden = norm_fn(hidden, params, "final_norm")
            return hidden, kv_pages
        layer_ids = jnp.arange(L, dtype=jnp.int32)
        global_ids = layer_ids + layer_offset
        aux = None
        if aux_capture is not None:
            # EAGLE3 feature tap (reference models/llama.py:329-332): save
            # the residual-stream value ENTERING each capture layer
            assert not capture_experts, \
                "aux_capture and expert capture are mutually exclusive"
            aux0 = jnp.zeros((len(aux_capture),) + hidden.shape,
                             dtype=hidden.dtype)

            def body_aux(carry, xs):
                hidden, kv, aux = carry
                gid = xs[2]
                for j, cj in enumerate(aux_capture):
                    aux = aux.at[j].set(
                        jnp.where(gid == cj, hidden, aux[j]))
                (hidden, kv), y = layer_body((hidden, kv), xs)
                return (hidden, kv, aux), y

            if scan_layers:
                (hidden, kv_pages, aux), ys = jax.lax.scan(
                    body_aux, (hidden, kv_pages, aux0),
                    (layer_params, layer_ids, global_ids))
            else:
                carry = (hidden, kv_pages, aux0)
                for l in range(L):
                    lp = jax.tree.map(lambda x: x[l], layer_params)
                    carry, _ = body_aux(
                        carry, (lp, jnp.int32(l),
                                jnp.int32(l + layer_offset)))
                hidden, kv_pages, aux = carry
            aux = jnp.concatenate(list(aux), axis=-1)   # [T, 3H]
        elif scan_layers:
            (hidden, kv_pages), ys = jax.lax.scan(
                layer_body, (hidden, kv_pages),
                (layer_params, layer_ids, global_ids)
            )
        else:
            ys_l = []
            for l in range(L):
                lp = jax.tree.map(lambda x: x[l], layer_params)
                (hidden, kv_pages), y = layer_body(
                    (hidden, kv_pages),
                    (lp, jnp.int32(l), jnp.int32(l + layer_offset))
                )
                ys_l.append(y)
            ys = jnp.stack(ys_l) if capture_experts else None

        if aux_capture is not None:
            if apply_final_norm:
                hidden = norm_fn(hidden, params, "final_norm")
            return hidden, kv_pages, aux
        if apply_final_norm:
            hidden = norm_fn(hidden, params, "final_norm")
        if capture_experts:
            return hidden, kv_pages, ys   # ys: i32[L, E] expert counts
        return hidden, kv_pages

    def compute_logits(self, params: dict[str, Any], hidden: jnp.ndarray) -> jnp.ndarray:
        """hidden [B, H] -> logits f32[B, V] (last-token gather happens in the
        runner; analog of layers/logits_processor.py:196)."""
        if self.config.tie_word_embeddings or "lm_head" not in params:
            w = params["embed"].T  # [H, V] (tied, or head-less classifier)
            logits = (hidden @ w).astype(jnp.float32)
        else:
            logits = qmatmul(hidden, params["lm_head"],
                             out_dtype=jnp.float32)
        if "lm_head_bias" in params:
            logits = logits + params["lm_head_bias"].astype(jnp.float32)
        if self.config.logits_scale != 1.0:
            logits = logits * self.config.logits_scale
        cap = self.config.final_logit_softcap
        if cap:
            logits = cap * jnp.tanh(logits / cap)
        if self.config.dummy_token_indices:
            # Phi-3-small: tiktoken slots never produced by the model
            # (reference models/phi3_small.py:399 index_fill -inf)
            idx = jnp.asarray(self.config.dummy_token_indices, jnp.int32)
            logits = logits.at[..., idx].set(-jnp.inf)
        return logits
