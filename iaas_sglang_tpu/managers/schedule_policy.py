"""Queue ordering + token-budget admission
(analog of sglang srt/managers/schedule_policy.py:61 SchedulePolicy,
:270 PrefillAdder).

Policies:
    lpm    -- longest prefix match: radix-match every waiting request and
              serve the best cache hits first (cache-aware, the default)
    fcfs   -- arrival order
    lof    -- longest output first (most remaining work first)
    random -- shuffle (starvation-free under adversarial arrival)
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from enum import Enum, auto
from typing import List

from iaas_sglang_tpu.managers.schedule_batch import Req
from iaas_sglang_tpu.mem_cache.radix_cache import BasePrefixCache
from iaas_sglang_tpu.utils import cdiv


class AddReqResult(Enum):
    CONTINUE = auto()     # added; keep admitting
    NO_TOKEN = auto()     # out of KV budget; stop
    OTHER = auto()        # hit batch/chunk limits; stop


class SchedulePolicy:
    def __init__(self, policy: str, tree_cache):
        self.policy = policy
        # one tree per attention rank under DP attention
        self.tree_caches = (tree_cache if isinstance(tree_cache, list)
                            else [tree_cache])
        self.tree_cache = self.tree_caches[0]

    def calc_priority(self, waiting_queue: List[Req]) -> None:
        """Sort the waiting queue in-place; refresh radix matches for lpm."""
        if self.policy == "fcfs":
            return
        if self.policy == "random":
            random.shuffle(waiting_queue)
            return
        if self.policy == "lof":
            waiting_queue.sort(
                key=lambda r: -r.sampling_params.max_new_tokens
            )
            return
        if self.policy == "lpm":
            for r in waiting_queue:
                # DP attention: the request is served by (and matched
                # against) ONE rank's tree; unassigned requests take the
                # best match across ranks
                if len(self.tree_caches) > 1 and r.fill_len == 0:
                    r._lpm_match_len = max(
                        t.match_prefix(r.fill_ids()).prefix_len
                        for t in self.tree_caches)
                else:
                    res = self.tree_caches[r.dp_rank].match_prefix(
                        r.fill_ids())
                    r._lpm_match_len = res.prefix_len
            waiting_queue.sort(key=lambda r: -getattr(r, "_lpm_match_len", 0))
            return
        raise ValueError(f"unknown schedule policy {self.policy!r}")


class PrefillAdder:
    """Token-budget admission with chunked prefill
    (analog of schedule_policy.py:270 PrefillAdder.add_one_req)."""

    def __init__(
        self,
        tree_cache,
        allocator,
        page_size: int,
        *,
        chunk_budget: int,
        max_batch_reqs: int,
        running_reqs: int,
        headroom_tokens: int = 0,
    ):
        # lists = one per attention rank (DP attention); bare objects
        # behave as a single rank
        self.tree_caches = (tree_cache if isinstance(tree_cache, list)
                            else [tree_cache])
        self.allocators = (allocator if isinstance(allocator, list)
                           else [allocator])
        self.tree_cache = self.tree_caches[0]
        self.allocator = self.allocators[0]
        self.page_size = page_size
        self.rem_chunk_tokens = chunk_budget
        self.rem_reqs = max_batch_reqs - running_reqs
        self.headroom_tokens = headroom_tokens
        self.can_run: List[Req] = []
        self.chunked_req: Req | None = None
        # tokens tentatively committed per rank THIS round (allocation
        # happens later, so free_tokens alone would pile a cold-start wave
        # of cache-miss requests onto one rank)
        self._rank_pending = {}

    def _available_tokens(self, rank: int = 0) -> int:
        return (
            self.allocators[rank].free_tokens()
            + self.tree_caches[rank].evictable_pages() * self.page_size
        )

    def _assign_rank(self, req: Req) -> None:
        """DP attention: pin a fresh request to the attention rank with the
        best prefix hit, tie-broken by most free KV (the cache-aware rank
        dispatch the reference delegates to its router/DP controller)."""
        best = (-1, -float("inf"), 0)  # (match_len, eff_free, rank)
        for rank, tree in enumerate(self.tree_caches):
            match = tree.match_prefix(req.fill_ids()).prefix_len
            free = (self._available_tokens(rank)
                    - self._rank_pending.get(rank, 0))
            if (match, free) > best[:2]:
                best = (match, free, rank)
        req.dp_rank = best[2]
        self._rank_pending[best[2]] = (
            self._rank_pending.get(best[2], 0)
            + req.extend_target() + min(req.sampling_params.max_new_tokens, 256))

    def add_one_req(self, req: Req) -> AddReqResult:
        if self.rem_reqs <= 0 or self.rem_chunk_tokens <= 0:
            return AddReqResult.OTHER

        # fresh (or retracted) requests get a prefix match + tree lock;
        # a resuming chunked request already holds its lock and pages.
        # LoRA requests bypass the shared cache entirely: cached KV was
        # computed without their adapter and must not be reused. Encoder-
        # only (no_chunk) requests bypass it too: bidirectional attention
        # has no KV to reuse — a "cached prefix" would skip real compute.
        need_lock = (req.fill_len == 0
                     and not getattr(req, "lora_slot", 0)
                     and not getattr(req, "no_chunk", 0)
                     and not getattr(req, "radix_bypass", 0))
        if need_lock:
            if len(self.tree_caches) > 1:
                self._assign_rank(req)
            res = self.tree_caches[req.dp_rank].match_prefix(req.fill_ids())
            req.cache_hit_tokens = res.prefix_len
            if res.prefix_len > 0:
                req.prefix_pages = res.pages
                req.cached_prefix_len = res.prefix_len
                req.fill_len = res.prefix_len
                req.last_node = res.last_node

        remaining = req.extend_target() - req.fill_len
        if remaining <= 0:
            # fully cached prompt: still need one forward for the last
            # token's logits — back off one token and re-run it (the KV
            # rewrite lands in the shared page with identical values).
            # A jump-requeued request can even match BEYOND extend_target
            # (its whole prompt+jumped sequence is cached), so clamp first.
            req.fill_len = max(min(req.fill_len, req.extend_target()) - 1, 0)
            remaining = req.extend_target() - req.fill_len

        # KV budget: this chunk + decode headroom estimate (+ encoder-KV
        # pages for cross-attention requests not yet written)
        enc_need = 0
        if not getattr(req, "enc_written", False):
            enc_need = sum(getattr(it, "enc_tokens", 0)
                           for it in getattr(req, "mm_items", []) or [])
        est_tokens = remaining + min(
            req.sampling_params.max_new_tokens, 256
        ) + enc_need
        if est_tokens + self.headroom_tokens \
                > self._available_tokens(req.dp_rank):
            return AddReqResult.NO_TOKEN

        if need_lock and req.last_node is not None:
            self.tree_caches[req.dp_rank].inc_lock_ref(req.last_node)
        if remaining > self.rem_chunk_tokens and getattr(req, "no_chunk", 0):
            # encoder-only (bidirectional) requests must run whole: admit
            # solo when the batch is empty, else wait for the next round
            if self.can_run:
                return AddReqResult.OTHER
            req.extend_len = remaining
            self.rem_chunk_tokens = 0
            self.rem_reqs -= 1
            self.can_run.append(req)
            return AddReqResult.OTHER
        if remaining > self.rem_chunk_tokens:
            # chunked prefill: take the remaining budget slice now
            req.extend_len = self.rem_chunk_tokens
            self.rem_chunk_tokens = 0
            self.can_run.append(req)
            self.chunked_req = req
            return AddReqResult.OTHER
        req.extend_len = remaining
        self.rem_chunk_tokens -= remaining
        self.rem_reqs -= 1
        self.can_run.append(req)
        return AddReqResult.CONTINUE
