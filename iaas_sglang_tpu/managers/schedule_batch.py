"""Request + batch state machine (analog of sglang
srt/managers/schedule_batch.py:418 Req, :797 ScheduleBatch).

Page-granular TPU re-design: a request's KV footprint is
    [tree-shared prefix pages][request-owned pages][partial tail page]
and every schedule step manipulates numpy page arrays on the host; the
device only ever sees padded page tables / slot vectors inside HostBatch.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import List, Optional

import numpy as np

from iaas_sglang_tpu.mem_cache.allocator import PageAllocator, slots_for_tokens
from iaas_sglang_tpu.mem_cache.radix_cache import BasePrefixCache
from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
from iaas_sglang_tpu.model_executor.model_runner import HostBatch
from iaas_sglang_tpu.sampling.sampling_params import SamplingParams
from iaas_sglang_tpu.utils import cdiv


# ----------------------------------------------------------- finish reasons


@dataclass
class FinishReason:
    def to_dict(self) -> dict:
        raise NotImplementedError


@dataclass
class FinishLength(FinishReason):
    length: int

    def to_dict(self):
        return {"type": "length", "length": self.length}


@dataclass
class FinishMatchedToken(FinishReason):
    matched: int

    def to_dict(self):
        return {"type": "stop", "matched": self.matched}


@dataclass
class FinishMatchedStr(FinishReason):
    matched: str

    def to_dict(self):
        return {"type": "stop", "matched": self.matched}


@dataclass
class FinishAbort(FinishReason):
    message: str = "aborted"

    def to_dict(self):
        return {"type": "abort", "message": self.message}


# --------------------------------------------------------------------- Req


class Req:
    def __init__(
        self,
        rid: str,
        input_text: Optional[str],
        input_ids: List[int],
        sampling_params: SamplingParams,
        *,
        stream: bool = False,
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        token_ids_logprob=None,
        eos_token_ids: Optional[set[int]] = None,
        seed: int = 0,
    ):
        self.rid = rid
        self.input_text = input_text
        self.input_ids = list(input_ids)
        # DP attention: the attention rank owning this request's KV pages
        # (assigned at admission; 0 when DP attention is off)
        self.dp_rank = 0
        self.sampling_params = sampling_params
        self.stream = stream
        self.return_logprob = return_logprob
        self.top_logprobs_num = top_logprobs_num
        self.token_ids_logprob = token_ids_logprob
        self.output_token_ids_logprobs = []
        self.eos_token_ids = eos_token_ids or set()
        self.seed = seed

        self.output_ids: List[int] = []
        self.finished_reason: Optional[FinishReason] = None
        self.cleaned = False         # cache_finished_req has run
        self.grammar = None          # BaseGrammarObject when constrained
        self.grammar_future = None   # in-flight async grammar compile
        self.grammar_queue_time = 0.0
        self.is_embedding = False    # prefill-only pooled-hidden request
        self.disagg_decode_url = None  # PD: hand off after prefill
        self.lora_slot = 0           # multi-LoRA adapter slot (0 = none)
        self.mm_items = []           # multimodal items (hash, offset, pixels)
        self.embedding = None        # filled for embedding requests
        self.output_token_logprobs: List[float] = []
        self.output_top_logprobs: List[list] = []
        self.logprob_start_len = -1   # -1 = no input logprobs
        # [[logprob, token_id], ...] for prompt tokens (pos-deduped)
        self.input_token_logprobs: List[list] = []
        self._input_lp_next_pos = 0

        # KV / page state
        self.prefix_pages = np.empty(0, dtype=np.int32)  # tree-owned
        self.cached_prefix_len = 0                       # tokens, page-aligned
        self.cache_hit_tokens = 0                        # admission-time hits
        self.owned_pages = np.empty(0, dtype=np.int32)   # request-owned
        self.fill_len = 0                                # tokens with KV written
        self.last_node = None                            # radix lock handle

        # per-chunk scheduling state
        self.extend_len = 0          # tokens to run this forward
        self.pending_steps = 0       # launched-but-unprocessed decode steps
        self.queue_time = time.monotonic()
        # stream bookkeeping
        self.sent_tokens = 0

    # ------------------------------------------------------------- helpers

    def fill_ids(self) -> List[int]:
        return self.input_ids + self.output_ids

    @property
    def prompt_len(self) -> int:
        return len(self.input_ids)

    def seq_len(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    def page_table_np(self) -> np.ndarray:
        if len(self.prefix_pages) == 0:
            return self.owned_pages
        if len(self.owned_pages) == 0:
            return self.prefix_pages
        return np.concatenate([self.prefix_pages, self.owned_pages])

    def is_finished(self) -> bool:
        return self.finished_reason is not None

    def extend_target(self) -> int:
        """Tokens that must have KV written before decode can run. The newest
        generated token never has KV yet (it is fed in its decode step), so a
        retracted request re-fills prompt + outputs except the last one."""
        return self.seq_len() - (1 if self.output_ids else 0)

    def prefill_done(self) -> bool:
        return self.fill_len >= self.extend_target()

    def release_pages(self, allocator: PageAllocator, tree_cache: BasePrefixCache):
        """Drop all request-owned pages and tree locks (retract / abort)."""
        from iaas_sglang_tpu.mem_cache.radix_cache import free_encoder_pages

        free_encoder_pages(self, allocator)   # re-written on re-admission
        allocator.free(self.owned_pages)
        self.owned_pages = np.empty(0, dtype=np.int32)
        if self.last_node is not None:
            tree_cache.dec_lock_ref(self.last_node)
            self.last_node = None
        self.prefix_pages = np.empty(0, dtype=np.int32)
        self.cached_prefix_len = 0
        self.fill_len = 0
        # tokens generated so far stay in output_ids? No: a retracted request
        # restarts its decode from the prompt + generated tokens as new fill.

    def adopt_prefix(self, pages: np.ndarray, aligned_len: int, last_node) -> None:
        """After cache_unfinished_req: the first aligned_len tokens are now
        backed by tree pages; keep only the tail as owned."""
        ps_pages = aligned_len  # tokens
        old_table = self.page_table_np()
        self.prefix_pages = np.asarray(pages, dtype=np.int32)
        self.owned_pages = np.asarray(
            old_table[len(pages):], dtype=np.int32
        ).copy()
        self.cached_prefix_len = aligned_len
        self.last_node = last_node

    # --------------------------------------------------------- finish check

    def check_finished(self, tokenizer=None) -> None:
        if self.finished_reason is not None:
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finished_reason = FinishLength(len(self.output_ids))
            return
        if len(self.output_ids) < sp.min_new_tokens:
            return
        last = self.output_ids[-1] if self.output_ids else None
        if last is not None and not sp.ignore_eos and last in self.eos_token_ids:
            self.finished_reason = FinishMatchedToken(last)
            return
        if last is not None and last in (sp.stop_token_ids or []):
            self.finished_reason = FinishMatchedToken(last)
            return
        if sp.stop and tokenizer is not None:
            # decode a tail window just long enough to catch any stop string
            max_stop = max(len(s) for s in sp.stop)
            tail_tokens = min(len(self.output_ids), max_stop + 8)
            tail = tokenizer.decode(self.output_ids[-tail_tokens:])
            for s in sp.stop:
                if s in tail:
                    self.finished_reason = FinishMatchedStr(s)
                    return


# ------------------------------------------------------------ ScheduleBatch


class ScheduleBatch:
    """A set of requests running together in one forward mode."""

    def __init__(self, reqs: List[Req], mode: ForwardMode,
                 allocator, tree_cache, page_size: int):
        """allocator/tree_cache: one per attention rank (lists) when DP
        attention is on; bare objects otherwise."""
        self.reqs = reqs
        self.mode = mode
        self.allocators = (allocator if isinstance(allocator, list)
                           else [allocator])
        self.tree_caches = (tree_cache if isinstance(tree_cache, list)
                            else [tree_cache])
        self.allocator = self.allocators[0]
        self.tree_cache = self.tree_caches[0]
        self.page_size = page_size

    def __len__(self):
        return len(self.reqs)

    def is_empty(self) -> bool:
        return len(self.reqs) == 0

    # --------------------------------------------------------------- alloc

    def _alloc_pages(self, n: int, rank: int = 0) -> Optional[np.ndarray]:
        """Allocate from the rank's pool, evicting from its radix tree when
        the free list runs dry (mirrors scheduler.py token_to_kv_pool alloc
        + tree_cache.evict)."""
        alloc = self.allocators[rank]
        pages = alloc.alloc(n)
        if pages is None:
            need = n - alloc.free_pages
            self.tree_caches[rank].evict(need)
            pages = alloc.alloc(n)
        return pages

    def _alloc_growth(self, need_of: dict) -> bool:
        """Grow each request's page table by need_of[id(req)] pages,
        all-or-nothing across the whole batch (per-rank pools, rollback on
        any rank's exhaustion). Returns False without side effects on
        failure — the caller retracts."""
        by_rank: dict[int, int] = {}
        for r in self.reqs:
            n = need_of.get(id(r), 0)
            if n:
                by_rank[r.dp_rank] = by_rank.get(r.dp_rank, 0) + n
        if not by_rank:
            return True
        got: dict[int, np.ndarray] = {}
        for rank, n in by_rank.items():
            pages = self._alloc_pages(n, rank)
            if pages is None:
                for rk, pg in got.items():
                    self.allocators[rk].free(pg)
                return False
            got[rank] = pages
        used = {rank: 0 for rank in got}
        for r in self.reqs:
            n = need_of.get(id(r), 0)
            if not n:
                continue
            i = used[r.dp_rank]
            used[r.dp_rank] += n
            newp = got[r.dp_rank][i : i + n]
            r.owned_pages = (
                np.concatenate([r.owned_pages, newp])
                if len(r.owned_pages) else newp.copy()
            )
        return True

    # -------------------------------------------------------------- extend

    def prepare_for_extend(self) -> HostBatch:
        """Build the HostBatch for a prefill/extend step. PrefillAdder has
        already set req.extend_len per request (schedule_policy.py analog of
        add_one_req chunking)."""
        ps = self.page_size
        ids: List[int] = []
        positions: List[int] = []
        slots: List[int] = []
        page_tables: List[np.ndarray] = []
        seq_lens: List[int] = []
        q_lens: List[int] = []

        for req in self.reqs:
            ext = req.extend_len
            assert ext > 0
            fill = req.fill_len
            new_total = fill + ext
            table = req.page_table_np()
            need = cdiv(new_total, ps) - len(table)
            if need > 0:
                newp = self._alloc_pages(need, req.dp_rank)
                assert newp is not None, "PrefillAdder admitted beyond capacity"
                req.owned_pages = (
                    np.concatenate([req.owned_pages, newp])
                    if len(req.owned_pages) else newp
                )
                table = req.page_table_np()
            chunk = req.fill_ids()[fill:new_total]
            ids.extend(chunk)
            positions.extend(range(fill, new_total))
            slots.extend(slots_for_tokens(table, fill, ext, ps))
            page_tables.append(table[: cdiv(new_total, ps)])
            seq_lens.append(new_total)
            q_lens.append(ext)

        hb = self._host_batch(
            ForwardMode.EXTEND,
            np.asarray(ids, dtype=np.int32),
            np.asarray(positions, dtype=np.int32),
            np.asarray(slots, dtype=np.int32),
            page_tables,
            np.asarray(seq_lens, dtype=np.int32),
            np.asarray(q_lens, dtype=np.int32),
        )
        # prompt logprobs: row p's target is prompt token p+1 (the
        # logits_processor input-logprob analog); rows whose next token is
        # generated (or requests not asking) target the pad id 0
        if any(r.return_logprob and r.logprob_start_len >= 0
               for r in self.reqs):
            targets: List[int] = []
            for req in self.reqs:
                fids = req.fill_ids()
                want = req.return_logprob and req.logprob_start_len >= 0
                # fill_len has NOT been advanced yet: this chunk's rows are
                # positions [fill_len, fill_len + extend_len)
                for p in range(req.fill_len, req.fill_len + req.extend_len):
                    t = fids[p + 1] if (want and p + 1 < req.prompt_len) else 0
                    targets.append(t)
            hb.lp_targets = np.asarray(targets, dtype=np.int32)
        return hb

    # -------------------------------------------------------------- decode

    def prepare_for_decode(self, chain_from: Optional[HostBatch] = None
                           ) -> Optional[HostBatch]:
        """Build the HostBatch for one decode step; returns None when page
        allocation fails (caller must retract).

        chain_from: the previous (still in-flight) decode HostBatch over the
        SAME request list — its on-device sampled tokens become this step's
        input_ids with no host roundtrip. All host metadata (positions,
        slots, page growth) is computed from `fill_len + pending_steps`,
        which is token-value independent."""
        ps = self.page_size
        B = len(self.reqs)

        def eff_fill(r: Req) -> int:
            return r.fill_len + r.pending_steps

        # allocate boundary-crossing pages first, all-or-nothing per step
        # (per attention rank when DP attention is on, with rollback)
        if not self._alloc_growth(
                {id(r): (1 if eff_fill(r) % ps == 0 else 0)
                 for r in self.reqs}):
            return None

        if chain_from is None:
            assert all(r.pending_steps == 0 for r in self.reqs)
            ids = np.asarray([r.output_ids[-1] for r in self.reqs],
                             dtype=np.int32)
        else:
            ids = None
        positions = np.asarray([eff_fill(r) for r in self.reqs], dtype=np.int32)
        slots = np.empty(B, dtype=np.int32)
        page_tables, seq_lens = [], []
        for i, r in enumerate(self.reqs):
            f = eff_fill(r)
            table = r.page_table_np()
            slots[i] = table[f // ps] * ps + f % ps
            page_tables.append(table[: cdiv(f + 1, ps)])
            seq_lens.append(f + 1)
        hb = self._host_batch(
            ForwardMode.DECODE, ids, positions, slots, page_tables,
            np.asarray(seq_lens, dtype=np.int32),
            np.ones(B, dtype=np.int32),
        )
        if chain_from is not None:
            hb.device_tokens = chain_from.device_tokens
        return hb

    def prepare_for_decode_multi(self, n_steps: int,
                                 chain_from: Optional[HostBatch] = None
                                 ) -> Optional[HostBatch]:
        """Decode HostBatch covering n_steps chained device iterations
        (ModelRunner multi_step): pages are pre-allocated through
        fill + n_steps; KV slots per step are computed in-program from the
        page table. Returns None when page allocation fails (caller falls
        back to single-step decode + retraction).

        chain_from: the previous (still in-flight) multi-step HostBatch
        over the SAME request list — its on-device LAST sampled token
        becomes this chain's step-0 input with no host roundtrip (the
        cross-dispatch generalization of single-step chaining: the host
        fetches and processes chain N's 32 tokens while chain N+1 runs).
        All host metadata derives from fill_len + pending_steps, which is
        token-value independent."""
        ps = self.page_size
        B = len(self.reqs)

        def eff_fill(r: Req) -> int:
            return r.fill_len + r.pending_steps

        if not self._alloc_growth({
            id(r): max(cdiv(eff_fill(r) + n_steps, ps)
                       - len(r.page_table_np()), 0)
            for r in self.reqs
        }):
            return None

        if chain_from is None:
            assert all(r.pending_steps == 0 for r in self.reqs)
            ids = np.asarray([r.output_ids[-1] for r in self.reqs],
                             dtype=np.int32)
        else:
            ids = None
        positions = np.asarray([eff_fill(r) for r in self.reqs],
                               dtype=np.int32)
        slots = np.zeros(B, dtype=np.int32)  # recomputed per step in-program
        page_tables, seq_lens = [], []
        for r in self.reqs:
            f = eff_fill(r)
            table = r.page_table_np()
            page_tables.append(table[: cdiv(f + n_steps, ps)])
            seq_lens.append(f + 1)
        hb = self._host_batch(
            ForwardMode.DECODE, ids, positions, slots, page_tables,
            np.asarray(seq_lens, dtype=np.int32),
            np.ones(B, dtype=np.int32),
        )
        hb.multi_steps = n_steps
        if chain_from is not None:
            hb.device_tokens = chain_from.device_tokens
            # penalty count state rides on device across chains
            hb.chain_counts = chain_from._device_counts
        if any(r.token_ids_logprob for r in self.reqs):
            J = max((len(r.token_ids_logprob or []) for r in self.reqs),
                    default=1)
            J = max(8, 1 << (max(J, 1) - 1).bit_length())
            arr = np.full((B, J), -1, np.int32)
            for i, r in enumerate(self.reqs):
                if r.token_ids_logprob:
                    arr[i, : len(r.token_ids_logprob)] = r.token_ids_logprob
            hb.lp_token_ids = arr
        return hb

    def _build_penalty_arrays(self):
        """None when no request needs penalties/bias/min-token masking —
        the step function then compiles without the penalty branch."""
        reqs = self.reqs
        need = any(
            r.sampling_params.frequency_penalty != 0.0
            or r.sampling_params.presence_penalty != 0.0
            or r.sampling_params.repetition_penalty != 1.0
            or r.sampling_params.logit_bias
            or r.sampling_params.custom_logit_processor
            # effective length includes in-flight chain tokens: a chained
            # dispatch is built while pending_steps tokens are on device
            or (len(r.output_ids) + r.pending_steps
                < r.sampling_params.min_new_tokens)
            for r in reqs
        )
        if not need:
            return None
        B = len(reqs)
        L = max(max((len(r.output_ids) for r in reqs), default=1), 1)
        out_ids = np.full((B, L), -1, dtype=np.int32)
        dis: List[List[int]] = []
        bias_ids_l: List[List[int]] = []
        bias_vals_l: List[List[float]] = []
        min_rem = np.zeros(B, dtype=np.int32)
        for i, r in enumerate(reqs):
            out_ids[i, : len(r.output_ids)] = r.output_ids
            sp = r.sampling_params
            d: List[int] = []
            if sp.min_new_tokens > 0:
                # ids are filled whenever min_new_tokens is set; the mask
                # deactivates IN-PROGRAM once the per-dispatch step count
                # reaches min_remaining (multi-step chains cross the
                # boundary without a host round trip)
                d.extend(r.eos_token_ids)
                d.extend(sp.stop_token_ids or [])
                min_rem[i] = max(0, sp.min_new_tokens
                                 - len(r.output_ids) - r.pending_steps)
            dis.append(d)
            bias: dict = ({int(t): float(v)
                           for t, v in sp.logit_bias.items()}
                          if sp.logit_bias else {})
            if sp.custom_logit_processor:
                from iaas_sglang_tpu.sampling.custom_logit_processor import (
                    get_custom_logit_processor)

                fn = get_custom_logit_processor(sp.custom_logit_processor)
                if fn is not None:
                    for t, v in fn(sp.custom_params or {},
                                   r.output_ids).items():
                        bias[int(t)] = bias.get(int(t), 0.0) + float(v)
            bias_ids_l.append(list(bias.keys()))
            bias_vals_l.append(list(bias.values()))
        K = max(max(len(d) for d in dis), 1)
        Kb = max(max(len(b) for b in bias_ids_l), 1)
        disallow = np.full((B, K), -1, dtype=np.int32)
        bias_ids = np.full((B, Kb), -1, dtype=np.int32)
        bias_vals = np.zeros((B, Kb), dtype=np.float32)
        for i in range(B):
            disallow[i, : len(dis[i])] = dis[i]
            bias_ids[i, : len(bias_ids_l[i])] = bias_ids_l[i]
            bias_vals[i, : len(bias_vals_l[i])] = bias_vals_l[i]
        return {
            "output_ids": out_ids,
            "frequency_penalties": np.asarray(
                [r.sampling_params.frequency_penalty for r in reqs], np.float32),
            "presence_penalties": np.asarray(
                [r.sampling_params.presence_penalty for r in reqs], np.float32),
            "repetition_penalties": np.asarray(
                [r.sampling_params.repetition_penalty for r in reqs], np.float32),
            "disallow_ids": disallow,
            "bias_ids": bias_ids,
            "bias_values": bias_vals,
            "min_remaining": min_rem,
        }

    def _build_grammar_masks(self):
        """Packed uint8 vocab bitmasks for constrained requests; None when
        the batch has no grammars (mask branch compiles out)."""
        reqs = self.reqs
        if all(r.grammar is None for r in reqs):
            return None
        V = None
        rows = []
        for r in reqs:
            mask = r.grammar.allowed_tokens() if r.grammar is not None else None
            rows.append(mask)
            if mask is not None:
                V = len(mask)
        if V is None:
            return None  # every grammar is dead/terminated: unconstrained
        nbytes = (V + 7) // 8
        out = np.full((len(reqs), nbytes), 0xFF, dtype=np.uint8)
        for i, mask in enumerate(rows):
            if mask is not None:
                out[i] = np.packbits(mask, bitorder="little")
        return out

    def prepare_for_spec_verify(self, drafts, K: int,
                                kv_moves=None) -> Optional[HostBatch]:
        """Verify step: each request runs q_len = 1+K new tokens
        (its pending output token + K draft tokens — a chain list or a
        TreeDraft). Returns None on page exhaustion (caller falls back to
        plain decode/retract). `kv_moves` (src, dst slot arrays) from the
        previous tree acceptance are folded into this program's prologue."""
        from iaas_sglang_tpu.speculative.ngram_worker import TreeDraft

        ps = self.page_size
        B = len(self.reqs)
        # page needs for fill .. fill+K
        if not self._alloc_growth({
            id(r): max(cdiv(r.fill_len + 1 + K, ps)
                       - len(r.page_table_np()), 0)
            for r in self.reqs
        }):
            return None

        ids, positions, slots_l = [], [], []
        page_tables, seq_lens, q_lens = [], [], []
        verify_idx = np.zeros((B, K + 1), dtype=np.int32)
        tree = any(isinstance(drafts[bi], TreeDraft)
                   for bi in range(B))
        tree_bits = np.zeros((B, 32), dtype=np.int32) if tree else None
        t = 0
        for bi, r in enumerate(self.reqs):
            d = drafts[bi] if drafts[bi] is not None else []
            f = r.fill_len
            table = r.page_table_np()
            if isinstance(d, TreeDraft):
                toks = [r.output_ids[-1]] + (d.tokens + [0] * K)[:K]
                depths = [0] + (d.depths + [K] * K)[:K]
                positions.extend(f + dep for dep in depths)
                tree_bits[bi] = d.bits
            else:
                d = (list(d) + [0] * K)[:K]
                toks = [r.output_ids[-1]] + d
                positions.extend(range(f, f + K + 1))
                if tree:
                    # chain drafts in a mixed batch: lower-triangular bits
                    tree_bits[bi] = [(1 << (j + 1)) - 1
                                     for j in range(K + 1)] + [0] * (31 - K)
            ids.extend(toks)
            # KV of tree rows lands at consecutive SLOTS fill..fill+K (slot
            # order, not depth order); accepted rows move to canonical
            # slots in the next program (kv_move prologue)
            slots_l.extend(slots_for_tokens(table, f, K + 1, ps))
            page_tables.append(table[: cdiv(f + K + 1, ps)])
            seq_lens.append(f + K + 1)
            q_lens.append(K + 1)
            verify_idx[bi] = np.arange(t, t + K + 1)
            t += K + 1
            r._spec_draft = d
        hb = self._host_batch(
            ForwardMode.EXTEND,
            np.asarray(ids, dtype=np.int32),
            np.asarray(positions, dtype=np.int32),
            np.asarray(slots_l, dtype=np.int32),
            page_tables,
            np.asarray(seq_lens, dtype=np.int32),
            np.asarray(q_lens, dtype=np.int32),
        )
        hb.verify_k = K
        hb.verify_idx = verify_idx
        hb.tree_bits = tree_bits
        if kv_moves is not None and len(kv_moves[0]):
            hb.move_src, hb.move_dst = kv_moves
        return hb

    def _host_batch(self, mode, ids, positions, slots, page_tables,
                    seq_lens, q_lens) -> HostBatch:
        reqs = self.reqs
        B = len(reqs)
        lora_ids = None
        if any(r.lora_slot for r in reqs):
            lora_ids = np.repeat(
                np.asarray([r.lora_slot for r in reqs], np.int32),
                np.asarray(q_lens, np.int64))
        return HostBatch(
            penalty_arrays=self._build_penalty_arrays(),
            grammar_masks=self._build_grammar_masks(),
            dp_ranks=(np.asarray([r.dp_rank for r in reqs], np.int32)
                      if len(self.allocators) > 1 else None),
            lora_ids=lora_ids,
            return_hidden=any(r.is_embedding for r in reqs),
            return_logprob=any(r.return_logprob for r in reqs),
            top_logprobs_num=max(
                (getattr(r, "top_logprobs_num", 0) for r in reqs), default=0),
            mode=mode,
            input_ids=ids,
            positions=positions,
            out_slots=slots,
            page_tables=page_tables,
            seq_lens=seq_lens,
            q_lens=q_lens,
            temperatures=np.asarray(
                [r.sampling_params.temperature for r in reqs], dtype=np.float32),
            top_ks=np.asarray(
                [r.sampling_params.top_k for r in reqs], dtype=np.int32),
            top_ps=np.asarray(
                [r.sampling_params.top_p for r in reqs], dtype=np.float32),
            min_ps=np.asarray(
                [r.sampling_params.min_p for r in reqs], dtype=np.float32),
            seeds=np.asarray([r.seed for r in reqs], dtype=np.uint32),
            steps=np.asarray(
                [len(r.output_ids) + r.pending_steps for r in reqs],
                dtype=np.int32),
        )

    # ------------------------------------------------------------ mutation

    def filter_finished(self) -> List[Req]:
        done = [r for r in self.reqs if r.is_finished()]
        self.reqs = [r for r in self.reqs if not r.is_finished()]
        return done

    def merge(self, other: "ScheduleBatch") -> None:
        self.reqs.extend(other.reqs)

    def retract_decode(self, target: int = 0) -> List[Req]:
        """Drop the most-recently-admitted requests back to the waiting queue
        to relieve memory pressure (analog of schedule_batch.py:1375).
        Retracts `target` requests when given (over-cap shedding retracts
        exactly the excess — each retraction pays a full re-prefill), else
        ~1/4 of the batch, at least one."""
        if len(self.reqs) <= 1:
            return []
        self.reqs.sort(key=lambda r: r.queue_time)
        n_drop = target if target > 0 else max(1, len(self.reqs) // 4)
        n_keep = max(1, len(self.reqs) - n_drop)
        retracted = self.reqs[n_keep:]
        self.reqs = self.reqs[:n_keep]
        for r in retracted:
            r.release_pages(self.allocators[r.dp_rank],
                            self.tree_caches[r.dp_rank])
            # generated tokens become part of the new "prompt" to refill
        return retracted
