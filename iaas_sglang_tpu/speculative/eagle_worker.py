"""EAGLE speculative decoding: learned draft model over target features.

TPU re-design of the reference's EAGLEWorker (srt/speculative/
eagle_worker.py:68,298,503,636 + draft CUDA-graph runners): the draft is a
1-layer Llama decoder consuming (token, target-feature) pairs
(models/llama_eagle.py). All drafting runs in ONE jitted program per
(T, B) bucket — a ragged pair-extend followed by a K-1 step `lax.scan`
chain — instead of the reference's per-step draft CUDA graphs.

State discipline (the part that makes this simple):
  * The draft keeps its OWN paged KV (1 layer) and per-request pair count
    (`fill`). Draft KV slots are (page, position)-addressed like the
    target's, so chain-speculated KV needs no rollback — the next step's
    pair-extend overwrites the same positions with the real pairs.
  * The verify step itself returns the (emitted token, feature) pairs the
    draft needs, so an EMPTY draft state self-heals: the first verify after
    a reset proposes nothing, emits the target's argmax token, and its
    feature starts repopulating the draft sequence. Prefill priming (all-
    position hidden tap) is a warm start, not a correctness requirement.
  * Prefix-cache hits / retraction resumes only feed the UNCACHED rows:
    the draft sequence is then a suffix of the target sequence — verify
    stays exact, acceptance degrades gracefully.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.mem_cache.allocator import PageAllocator, slots_for_tokens
from iaas_sglang_tpu.model_loader import loader as model_loader
from iaas_sglang_tpu.models.llama_eagle import LlamaEagleDraft
from iaas_sglang_tpu.utils import bucket_size, cdiv, logger, make_buckets


class _ReqDraftState:
    __slots__ = ("fill", "pages", "drafts", "carry_feat")

    def __init__(self):
        self.fill = 0                  # pairs in the draft KV
        self.pages = np.empty(0, np.int32)
        self.drafts: Optional[List[int]] = None  # proposal for next verify
        self.carry_feat = None         # chunk-boundary feature awaiting token


class EagleWorker:
    def __init__(self, server_args, target_config: ModelConfig, mesh_ctx,
                 runner):
        self.server_args = server_args
        self.mesh_ctx = mesh_ctx
        self.runner = runner
        self.K = server_args.speculative_num_draft_tokens
        # tree drafting (EAGLE topk>1, reference eagle_worker.py:503 draft
        # tree expansion): the spine is the greedy chain; each spine step
        # additionally surfaces its topk sibling candidates, and the best
        # K nodes of the pool become the verify tree.
        self.topk = getattr(server_args, "speculative_eagle_topk", 1) or 1
        self.steps = (getattr(server_args, "speculative_num_steps", None)
                      or self.K)
        self.page_size = server_args.page_size

        draft_cfg = self._draft_config(server_args, target_config)
        if server_args.speculative_algorithm == "eagle3":
            # EAGLE3 (reference models/llama_eagle3.py): 3-layer aux
            # feature input, own embedding + reduced-vocab head + d2t map
            from iaas_sglang_tpu.models.llama_eagle3 import LlamaEagle3Draft

            self.draft = LlamaEagle3Draft(draft_cfg)
        elif target_config.is_mla:
            # DeepSeek targets draft with the NextN MTP layer
            # (reference models/deepseek_nextn.py)
            from iaas_sglang_tpu.models.deepseek_nextn import (
                DeepseekNextNDraft,
            )

            self.draft = DeepseekNextNDraft(draft_cfg)
        elif target_config.model_type == "mimo":
            # MiMo's MTP head (reference models/mimo_mtp.py)
            from iaas_sglang_tpu.models.mimo_mtp import MiMoMTPDraft

            self.draft = MiMoMTPDraft(draft_cfg)
        else:
            self.draft = LlamaEagleDraft(draft_cfg)
        with mesh_ctx.mesh:
            self.params = model_loader.load_params(
                self.draft, draft_cfg, mesh_ctx,
                load_format=("dummy" if not server_args.speculative_draft_model_path
                             else "auto"),
                quantization=None, seed=server_args.random_seed + 1)

        # single-layer paged KV, same token capacity as one target layer
        ps = self.page_size
        self.pages_total = runner.pages_per_layer
        ne, ed = self.draft.kv_entry_shape()
        self.kv_pages = jax.device_put(
            jnp.zeros((self.pages_total + 1, ps, ne, ed),
                      dtype=runner.kv_pages.dtype),
            mesh_ctx.sharding(*self.draft.kv_shard_dims()))
        self.alloc = PageAllocator(self.pages_total, ps)
        self.states: Dict[str, _ReqDraftState] = {}

        self.bs_buckets = runner.decode_bs_buckets
        self.t_buckets = sorted(set(
            runner.prefill_token_buckets
            + [b * (self.K + 1) for b in self.bs_buckets]))
        self.mp_buckets = runner.mp_buckets
        self._fn = self._build_fn()
        self._compiled: dict = {}

    @staticmethod
    def _draft_config(server_args, target_config: ModelConfig) -> ModelConfig:
        path = server_args.speculative_draft_model_path
        eagle3 = server_args.speculative_algorithm == "eagle3"
        if path:
            cfg = ModelConfig.from_path(path, dtype=target_config.dtype)
            if not eagle3:
                # eagle3 drafts may use their own width (fc maps the
                # 3*target_hidden feature in); eagle-1 pairs must match
                assert cfg.hidden_size == target_config.hidden_size, \
                    "EAGLE draft hidden size must match the target"
        else:
            import copy

            cfg = copy.deepcopy(target_config)
        if eagle3:
            cfg.hf_config = dict(cfg.hf_config or {})
            cfg.hf_config.setdefault("target_hidden_size",
                                     target_config.hidden_size)
        # NextN (MTP) weights sit at layer index num_hidden_layers in the
        # full DeepSeek checkpoint; standalone 1-layer exports at 0
        # (reference deepseek_v2.py:2344)
        cfg.nextn_layer_id = 0 if cfg.num_layers == 1 else cfg.num_layers
        cfg.num_layers = 1
        return cfg

    # ---------------------------------------------------------- device fn

    def _build_fn(self):
        draft = self.draft
        ps = self.page_size
        K = self.K
        S = self.steps
        tk = self.topk
        tied = self.runner.model_config.tie_word_embeddings
        own_head = getattr(draft, "own_head", False)

        def logits_fn(params, hid, embed, lm_head):
            if own_head:
                # EAGLE3: the draft's own reduced-vocab head over the
                # final-norm of the pre-norm hidden
                return draft.head_logits(params, hid)
            w = embed.T if tied else lm_head
            return hid.astype(jnp.float32) @ w.astype(jnp.float32)

        def map_tok(params, tok):
            # draft-vocab index -> target token id (identity for eagle-1)
            return draft.map_tokens(params, tok) if own_head else tok

        def logits_argmax(params, hid, embed, lm_head):
            return map_tok(params, jnp.argmax(
                logits_fn(params, hid, embed, lm_head),
                axis=-1).astype(jnp.int32))

        def extend_chain(params, embed, lm_head, kv_pages,
                         tokens, feats, positions, out_slots,
                         page_indices, kv_lens, cu_q_lens, num_seqs):
            B = page_indices.shape[0]
            hidden, kv_pages = draft.forward_pairs(
                params, embed, tokens, feats, positions, out_slots,
                kv_pages, page_indices, kv_lens, cu_q_lens, num_seqs,
                attn_backend="jnp", attn_mode="extend")
            last_idx = jnp.maximum(cu_q_lens[1:] - 1, 0)      # [B]
            hid = hidden[last_idx]                            # [B, H]
            tok = logits_argmax(params, hid, embed, lm_head)  # [B]

            def chain_body(carry, _):
                hid, tok, kv, pos = carry      # pos i32[B]: next pair index
                page = jnp.take_along_axis(
                    page_indices, (pos // ps)[:, None], axis=1)[:, 0]
                slots = page * ps + pos % ps
                hid2, kv = draft.forward_pairs(
                    params, embed, tok, hid, pos, slots,
                    kv, page_indices, pos + 1,
                    jnp.arange(B + 1, dtype=jnp.int32), num_seqs,
                    attn_backend="jnp", attn_mode="decode")
                tok2 = logits_argmax(params, hid2, embed, lm_head)
                return (hid2, tok2, kv, pos + 1), tok2

            if K > 1:
                (_, _, kv_pages, _), toks = jax.lax.scan(
                    chain_body, (hid, tok, kv_pages, kv_lens), None,
                    length=K - 1)
                drafts = jnp.concatenate([tok[None], toks], axis=0)  # [K, B]
            else:
                drafts = tok[None]
            return drafts.T, kv_pages                          # [B, K]

        def extend_tree(params, embed, lm_head, kv_pages,
                        tokens, feats, positions, out_slots,
                        page_indices, kv_lens, cu_q_lens, num_seqs):
            """Spine chain + per-step topk siblings: the greedy chain runs
            exactly as extend_chain (same draft KV), and every step also
            emits its topk (token, cumulative-score) candidates."""
            B = page_indices.shape[0]
            hidden, kv_pages = draft.forward_pairs(
                params, embed, tokens, feats, positions, out_slots,
                kv_pages, page_indices, kv_lens, cu_q_lens, num_seqs,
                attn_backend="jnp", attn_mode="extend")
            last_idx = jnp.maximum(cu_q_lens[1:] - 1, 0)
            hid = hidden[last_idx]                            # [B, H]
            lp0 = jax.nn.log_softmax(
                logits_fn(params, hid, embed, lm_head), axis=-1)
            sc0, tok0 = jax.lax.top_k(lp0, tk)                # [B, tk]
            tok0 = map_tok(params, tok0)

            def tree_body(carry, _):
                hid, tok, kv, pos, cum = carry
                page = jnp.take_along_axis(
                    page_indices, (pos // ps)[:, None], axis=1)[:, 0]
                slots = page * ps + pos % ps
                hid2, kv = draft.forward_pairs(
                    params, embed, tok, hid, pos, slots,
                    kv, page_indices, pos + 1,
                    jnp.arange(B + 1, dtype=jnp.int32), num_seqs,
                    attn_backend="jnp", attn_mode="decode")
                lp = jax.nn.log_softmax(
                    logits_fn(params, hid2, embed, lm_head), axis=-1)
                sc, cand = jax.lax.top_k(lp, tk)
                cand = map_tok(params, cand)
                cand_sc = cum[:, None] + sc                   # [B, tk]
                return (hid2, cand[:, 0], kv, pos + 1, cand_sc[:, 0]), \
                    (cand, cand_sc)

            if S > 1:
                (_, _, kv_pages, _, _), (toks, scs) = jax.lax.scan(
                    tree_body,
                    (hid, tok0[:, 0], kv_pages, kv_lens,
                     sc0[:, 0].astype(jnp.float32)),
                    None, length=S - 1)
                cand_toks = jnp.concatenate(
                    [tok0[None], toks], axis=0)               # [S, B, tk]
                cand_scs = jnp.concatenate(
                    [sc0[None].astype(jnp.float32), scs], axis=0)
            else:
                cand_toks, cand_scs = tok0[None], sc0[None].astype(
                    jnp.float32)
            return (cand_toks.transpose(1, 0, 2),             # [B, S, tk]
                    cand_scs.transpose(1, 0, 2), kv_pages)

        fn = extend_tree if tk > 1 else extend_chain
        return jax.jit(fn, donate_argnums=(3,))

    def _run(self, tokens, feats, positions, out_slots,
             page_indices, kv_lens, cu_q_lens, B):
        # on a multi-device mesh (tp / dp-attention) the target embed +
        # lm_head args are mesh-committed; host batch metadata must be
        # committed replicated too or lower() sees mixed device sets
        if self.mesh_ctx.tp_size * self.mesh_ctx.dp_size > 1:
            rep = self.mesh_ctx.replicated
            put = lambda x: jax.device_put(jnp.asarray(x), rep)
        else:
            put = jnp.asarray
        args = (self.params, self.runner.params["embed"],
                self.runner.params.get("lm_head"), self.kv_pages,
                put(tokens), put(feats),
                put(positions), put(out_slots),
                put(page_indices), put(kv_lens),
                put(cu_q_lens), put(jnp.asarray(B, dtype=jnp.int32)))
        key = str(jax.tree.map(
            lambda x: (x.shape, str(x.dtype)) if hasattr(x, "shape") else x,
            args))
        exe = self._compiled.get(key)
        if exe is None:
            import time as _t

            t0 = _t.perf_counter()

            def absify(x):
                if hasattr(x, "shape") and hasattr(x, "dtype"):
                    return jax.ShapeDtypeStruct(
                        x.shape, x.dtype, sharding=getattr(x, "sharding", None))
                return x

            with self.mesh_ctx.mesh:
                exe = self._fn.lower(*jax.tree.map(absify, args)).compile()
            self._compiled[key] = exe
            logger.info("compiled eagle draft step (T=%d B=%d) in %.1fs",
                        len(positions), page_indices.shape[0],
                        _t.perf_counter() - t0)
        with self.mesh_ctx.mesh:
            out = exe(*args)
        if self.topk > 1:
            cand_toks, cand_scs, self.kv_pages = out
            return np.asarray(cand_toks), np.asarray(cand_scs)
        drafts, self.kv_pages = out
        return np.asarray(drafts)

    # ------------------------------------------------------------- host API

    def state(self, rid: str) -> _ReqDraftState:
        st = self.states.get(rid)
        if st is None:
            st = self.states[rid] = _ReqDraftState()
        return st

    def evict(self, rid: str) -> None:
        st = self.states.pop(rid, None)
        if st is not None and len(st.pages):
            self.alloc.free(st.pages)

    def reset(self, rid: str) -> None:
        """Desync recovery: drop the draft sequence, keep the pages."""
        st = self.states.get(rid)
        if st is not None:
            st.fill = 0
            st.drafts = None
            st.carry_feat = None

    def _ensure_pages(self, st: _ReqDraftState, upto_pairs: int) -> bool:
        need = cdiv(upto_pairs, self.page_size) - len(st.pages)
        if need <= 0:
            return True
        newp = self.alloc.alloc(need)
        if newp is None:
            return False
        st.pages = (np.concatenate([st.pages, newp])
                    if len(st.pages) else newp)
        return True

    def feed_pairs(self, items) -> None:
        """items: list of (req, tokens list[int], feats np [m, H]).
        Consumes the pairs into the draft KV and chains K new draft tokens
        per request — one device program for the whole batch."""
        items = [it for it in items if len(it[1]) > 0]
        if not items:
            return
        ps = self.page_size
        K = self.K
        S = self.steps if self.topk > 1 else K
        reqs = [it[0] for it in items]
        sts = [self.state(r.rid) for r in reqs]
        # page budget: pairs + the S-1 chain positions
        for st, (_, toks, _) in zip(sts, items):
            if not self._ensure_pages(st, st.fill + len(toks) + S):
                # page exhaustion: drop drafting for this request this round
                st.drafts = None
                return

        B = len(items)
        B_pad = bucket_size(B, self.bs_buckets)
        T = sum(len(it[1]) for it in items)
        T_pad = bucket_size(T, self.t_buckets)
        H = items[0][2].shape[-1]
        mp_needed = max(len(st.pages) for st in sts)
        MP = bucket_size(mp_needed, self.mp_buckets)
        garbage = self.pages_total

        tokens = np.zeros(T_pad, np.int32)
        feats = np.zeros((T_pad, H), dtype=items[0][2].dtype)
        positions = np.zeros(T_pad, np.int32)
        out_slots = np.full(T_pad, garbage * ps, np.int32)
        page_indices = np.full((B_pad, MP), garbage, np.int32)
        kv_lens = np.zeros(B_pad, np.int32)
        cu = np.zeros(B_pad + 1, np.int32)
        t = 0
        for i, (st, (req, toks, fts)) in enumerate(zip(sts, items)):
            m = len(toks)
            tokens[t : t + m] = toks
            feats[t : t + m] = fts
            positions[t : t + m] = np.arange(st.fill, st.fill + m)
            out_slots[t : t + m] = slots_for_tokens(st.pages, st.fill, m, ps)
            page_indices[i, : len(st.pages)] = st.pages
            kv_lens[i] = st.fill + m
            t += m
            cu[i + 1] = t
            st.fill += m
        cu[B + 1 :] = t

        out = self._run(tokens, feats, positions, out_slots,
                        page_indices, kv_lens, cu, B)
        if self.topk > 1:
            from iaas_sglang_tpu.speculative.ngram_worker import (
                build_tree_draft,
            )

            cand_toks, cand_scs = out
            for i, (st, (req, _, _)) in enumerate(zip(sts, items)):
                st.drafts = build_tree_draft(cand_toks[i], cand_scs[i], K)
                req._spec_next_draft = st.drafts
        else:
            for i, (st, (req, _, _)) in enumerate(zip(sts, items)):
                st.drafts = [int(x) for x in out[i][:K]]
                req._spec_next_draft = st.drafts
