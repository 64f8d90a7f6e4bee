"""BERT-family bidirectional encoder for embedding serving
(reference: srt/models/bert.py / roberta — the e5/bge embedding zoo).

Encoder-only models ride the SAME scheduler path as generation
(is_embedding requests): forward receives the ragged padded batch and runs
full bidirectional attention WITHIN each sequence (segment-id mask from
cu_q_lens) — no KV cache is touched (decode never runs; requests must not
be chunked — the scheduler admits encoder requests whole). The pooled
(cls/mean/last, L2-normalized) vector is scattered into each sequence's
last-token row so the standard last-token gather returns it.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.models.vision import _act, layer_norm


class BertEmbeddingModel:
    def __init__(self, config: ModelConfig):
        self.config = config
        self.mesh = None
        self.moe_impl = "dense"

    def kv_entry_shape(self) -> tuple[int, int]:
        return (1, 1)   # encoder-only: the KV pool is never read/written

    def kv_shard_dims(self) -> tuple:
        return (None, None, None, None)

    # ------------------------------------------------------------- weights

    def weight_specs(self) -> dict[str, WeightSpec]:
        c = self.config
        H, I, V = c.hidden_size, c.intermediate_size, c.vocab_size
        L = c.num_layers

        # classification checkpoints nest the body under "bert."/"roberta."
        # (BertForSequenceClassification etc.); embedding ones are bare
        def alts(key: str) -> str:
            return "|".join((key, "bert." + key, "roberta." + key))

        lk = "encoder.layer.{l}."
        s: dict[str, WeightSpec] = {
            "embed": WeightSpec(
                (V, H), (None, None),
                alts("embeddings.word_embeddings.weight")),
            "pos_embed": WeightSpec(
                (c.max_position_embeddings, H), (None, None),
                alts("embeddings.position_embeddings.weight")),
            "type_embed": WeightSpec(
                (c.type_vocab_size, H), (None, None),
                alts("embeddings.token_type_embeddings.weight")),
            "emb_ln_w": WeightSpec((H,), (None,),
                                   alts("embeddings.LayerNorm.weight")),
            "emb_ln_b": WeightSpec((H,), (None,),
                                   alts("embeddings.LayerNorm.bias")),
        }
        per_layer = {
            "wq": (lk + "attention.self.query.weight", (H, H), True),
            "bq": (lk + "attention.self.query.bias", (H,), False),
            "wk": (lk + "attention.self.key.weight", (H, H), True),
            "bk": (lk + "attention.self.key.bias", (H,), False),
            "wv": (lk + "attention.self.value.weight", (H, H), True),
            "bv": (lk + "attention.self.value.bias", (H,), False),
            "wo": (lk + "attention.output.dense.weight", (H, H), True),
            "bo": (lk + "attention.output.dense.bias", (H,), False),
            "attn_ln_w": (lk + "attention.output.LayerNorm.weight", (H,), False),
            "attn_ln_b": (lk + "attention.output.LayerNorm.bias", (H,), False),
            "w1": (lk + "intermediate.dense.weight", (H, I), True),
            "b1": (lk + "intermediate.dense.bias", (I,), False),
            "w2": (lk + "output.dense.weight", (I, H), True),
            "b2": (lk + "output.dense.bias", (H,), False),
            "out_ln_w": (lk + "output.LayerNorm.weight", (H,), False),
            "out_ln_b": (lk + "output.LayerNorm.bias", (H,), False),
        }
        for name, (key, shape, tr) in per_layer.items():
            s[f"layers.{name}"] = WeightSpec(
                shape, tuple(None for _ in shape), alts(key),
                transpose=tr, stacked=True, num_stack=L)
        if c.num_labels:
            # cross-encoder classification head (reference models/bert.py
            # BertForSequenceClassification / roberta.py
            # XLMRobertaForSequenceClassification)
            nl = c.num_labels
            if c.classifier_pooling == "roberta_head":
                s["cls_dense_w"] = WeightSpec(
                    (H, H), (None, None), "classifier.dense.weight",
                    transpose=True)
                s["cls_dense_b"] = WeightSpec(
                    (H,), (None,), "classifier.dense.bias")
                s["cls_out_w"] = WeightSpec(
                    (H, nl), (None, None), "classifier.out_proj.weight",
                    transpose=True)
                s["cls_out_b"] = WeightSpec(
                    (nl,), (None,), "classifier.out_proj.bias")
            else:
                s["pool_w"] = WeightSpec(
                    (H, H), (None, None), alts("pooler.dense.weight"),
                    transpose=True)
                s["pool_b"] = WeightSpec(
                    (H,), (None,), alts("pooler.dense.bias"))
                s["cls_out_w"] = WeightSpec(
                    (H, nl), (None, None), "classifier.weight",
                    transpose=True)
                s["cls_out_b"] = WeightSpec(
                    (nl,), (None,), "classifier.bias")
        return s

    # ------------------------------------------------------------- forward

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

        # segment ids from cu_q_lens; padding rows -> segment Bmax (no peer)
        t_idx = jnp.arange(T, dtype=jnp.int32)
        seg = jnp.searchsorted(fb.cu_q_lens[1:], t_idx,
                               side="right").astype(jnp.int32)
        valid = t_idx < fb.cu_q_lens[-1]
        seg = jnp.where(valid, seg, Bmax)
        same = (seg[:, None] == seg[None, :]) & valid[None, :]  # [T, T]

        h = (params["embed"][fb.input_ids]
             + params["pos_embed"][fb.positions + c.position_offset]
             + params["type_embed"][0][None, :])
        h = layer_norm(h, params["emb_ln_w"], params["emb_ln_b"], eps)
        act = _act(c.hidden_act)
        scale = Dh ** -0.5

        def body(carry, lp):
            x = carry
            q = (x @ lp["wq"] + lp["bq"]).reshape(T, Nh, Dh)
            k = (x @ lp["wk"] + lp["bk"]).reshape(T, Nh, Dh)
            v = (x @ lp["wv"] + lp["bv"]).reshape(T, Nh, Dh)
            s = jnp.einsum("qnd,knd->nqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            s = jnp.where(same[None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1)
            a = jnp.where(jnp.isnan(a), 0.0, a)   # fully-masked pad rows
            ctx = jnp.einsum("nqk,knd->qnd", a,
                             v.astype(jnp.float32)).reshape(T, H)
            x = layer_norm(x + (ctx.astype(x.dtype) @ lp["wo"] + lp["bo"]),
                           lp["attn_ln_w"], lp["attn_ln_b"], eps)
            inter = act(x @ lp["w1"] + lp["b1"])
            x = layer_norm(x + (inter @ lp["w2"] + lp["b2"]),
                           lp["out_ln_w"], lp["out_ln_b"], eps)
            return x, None

        h, _ = jax.lax.scan(body, h, params["layers"])

        # pool per sequence and plant the result at each last-token row
        # (the runner's standard last-token gather then returns it)
        last_idx = jnp.maximum(fb.cu_q_lens[1:] - 1, 0)      # [Bmax]
        if c.num_labels:
            # cross-encoder classification: always CLS (HF Bert/Roberta
            # ForSequenceClassification); head applied in pooled_output
            pooled = h[fb.cu_q_lens[:-1]].astype(jnp.float32)
        elif c.pooling_type == "mean":
            hf = h.astype(jnp.float32) * valid[:, None]
            sums = jax.ops.segment_sum(hf, seg, num_segments=Bmax + 1)[:Bmax]
            lens = jnp.maximum(
                fb.cu_q_lens[1:] - fb.cu_q_lens[:-1], 1)[:, None]
            pooled = sums / lens
        elif c.pooling_type == "last":
            pooled = h[last_idx].astype(jnp.float32)
        else:  # cls
            pooled = h[fb.cu_q_lens[:-1]].astype(jnp.float32)
        if not c.num_labels:
            pooled = pooled / jnp.maximum(
                jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-9)
        # padded rows share last_idx = T_real-1 (cu stops there) and would
        # clobber the final real sequence's row — send them OOB instead
        row_valid = jnp.arange(Bmax) < fb.num_seqs
        last_idx_w = jnp.where(row_valid, last_idx, T)
        h = h.at[last_idx_w].set(pooled.astype(h.dtype), mode="drop")
        return h, kv_pages

    def pooled_output(self, params, last_h):
        c = self.config
        x = last_h.astype(jnp.float32)
        if not c.num_labels:
            return x
        if c.classifier_pooling == "roberta_head":
            # XLMRobertaForSequenceClassification head: dense->tanh->out
            x = jnp.tanh(x @ params["cls_dense_w"].astype(jnp.float32)
                         + params["cls_dense_b"])
            return (x @ params["cls_out_w"].astype(jnp.float32)
                    + params["cls_out_b"])
        # BertForSequenceClassification: pooler (tanh dense) + classifier
        if "pool_w" in params:
            x = jnp.tanh(x @ params["pool_w"].astype(jnp.float32)
                         + params["pool_b"])
        return (x @ params["cls_out_w"].astype(jnp.float32)
                + params["cls_out_b"])

    def compute_logits(self, params, hidden):
        # encoder-only: no LM head; the sampler sees a single dummy logit
        return jnp.zeros((hidden.shape[0], 1), jnp.float32)
