"""Host-side KV page allocator.

TPU re-design of sglang's allocator stack (mem_cache/allocator.py:113,407):
the reference runs Triton kernels to compute per-token KV slot indices on
GPU; on TPU the allocator is pure O(pages) numpy on the host — slot indices
are computed vectorized and shipped to the device as part of the batch
metadata, so nothing here is ever traced/compiled.

Pages are the only allocation granularity. Page id `garbage_page_id`
(the last page) is reserved as a write sink for padding lanes.
"""

from __future__ import annotations

import numpy as np


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int):
        # usable page ids: 0 .. num_pages-1 ; page num_pages is the garbage page
        self.num_pages = num_pages
        self.page_size = page_size
        self.garbage_page_id = num_pages
        self._free = np.arange(num_pages - 1, -1, -1, dtype=np.int32)
        self._n_free = num_pages

    @property
    def free_pages(self) -> int:
        return self._n_free

    def free_tokens(self) -> int:
        return self._n_free * self.page_size

    def alloc(self, n: int) -> np.ndarray | None:
        """Pop n pages off the free stack; None if not enough."""
        if n > self._n_free:
            return None
        if n == 0:
            return np.empty(0, dtype=np.int32)
        out = self._free[self._n_free - n : self._n_free].copy()
        self._n_free -= n
        return out

    def free(self, pages: np.ndarray) -> None:
        n = len(pages)
        if n == 0:
            return
        assert self._n_free + n <= self.num_pages, "double free"
        self._free[self._n_free : self._n_free + n] = pages
        self._n_free += n

    def clear(self) -> None:
        self._free = np.arange(self.num_pages - 1, -1, -1, dtype=np.int32)
        self._n_free = self.num_pages


def slots_for_tokens(pages: np.ndarray, start_token: int, num_tokens: int,
                     page_size: int) -> np.ndarray:
    """Flat KV slot index (page_id * page_size + offset) for token positions
    [start_token, start_token + num_tokens) of a sequence whose page table
    is `pages`."""
    pos = start_token + np.arange(num_tokens, dtype=np.int32)
    return pages[pos // page_size] * page_size + pos % page_size
