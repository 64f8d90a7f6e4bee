"""ChunkCache: the no-prefix-sharing fallback used when the radix cache is
disabled (analog of sglang mem_cache/chunk_cache.py:20). All pages of a
finished request are simply returned to the allocator."""

from __future__ import annotations

import numpy as np

from iaas_sglang_tpu.mem_cache.allocator import PageAllocator
from iaas_sglang_tpu.mem_cache.radix_cache import BasePrefixCache, MatchResult


class ChunkCache(BasePrefixCache):
    def __init__(self, allocator: PageAllocator, page_size: int):
        self.allocator = allocator
        self.page_size = page_size

    def match_prefix(self, token_ids: list[int]) -> MatchResult:
        return MatchResult(
            pages=np.empty(0, dtype=np.int32), prefix_len=0, last_node=None
        )

    def cache_finished_req(self, req) -> None:
        from iaas_sglang_tpu.mem_cache.radix_cache import free_encoder_pages

        free_encoder_pages(req, self.allocator)
        self.allocator.free(np.asarray(req.page_table_np(), dtype=np.int32))

    def cache_unfinished_req(self, req) -> None:
        pass  # nothing to share
