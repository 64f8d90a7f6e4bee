"""HiRadixCache: hierarchical device -> host-RAM KV tier
(analog of sglang mem_cache/hiradix_cache.py:26 + cache_controller.py —
re-designed around whole-page transfers instead of per-layer CUDA streams).

Write-back on eviction: instead of discarding a victim node's KV, its
pages (all layers) are gathered to host numpy; the tree node stays,
marked host-resident. A later prefix match on a host-resident node
allocates fresh device pages and scatters the KV back — turning what
would be a full recompute into a host->HBM DMA.

Host tier capacity is `hicache_ratio x` the device pool; beyond that,
least-recently-used host nodes are dropped for real.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np

from iaas_sglang_tpu.mem_cache.allocator import PageAllocator
from iaas_sglang_tpu.mem_cache.radix_cache import MatchResult, RadixCache, TreeNode
from iaas_sglang_tpu.utils import logger


class HiRadixCache(RadixCache):
    def __init__(self, allocator: PageAllocator, page_size: int, runner,
                 host_capacity_pages: int):
        self.runner = runner
        self.host_capacity_pages = host_capacity_pages
        self.host_pages_used = 0
        self.load_back_count = 0
        # write-backs whose device->host copy is still in flight (the
        # async-stream analog); resolved to numpy at the next evict/load
        self._pending_writebacks: list = []
        super().__init__(allocator, page_size)

    def _resolve_pending(self) -> None:
        for node in self._pending_writebacks:
            if node.host_data is not None                     and not isinstance(node.host_data, np.ndarray):
                node.host_data = np.asarray(node.host_data)
        self._pending_writebacks = []

    # host_data on a node: np array [n_pages * L, ps, 2Nk, D]

    def evict(self, num_pages: int) -> int:
        """Write back LRU leaves to host instead of dropping them."""
        import heapq

        self._resolve_pending()
        leaves = [n for n in self._collect_leaves()
                  if n.lock_ref == 0 and getattr(n, "on_device", True)]
        heapq.heapify(leaves)
        freed = 0
        while freed < num_pages and leaves:
            leaf = heapq.heappop(leaves)
            if leaf is self.root or leaf.lock_ref > 0:
                continue
            n = len(leaf.pages)
            if self._host_reserve(n):
                # async write-back: the gather + host copy overlap the
                # scheduler's next steps; resolved on the next evict/load
                leaf.host_data = self.runner.gather_kv_pages_async(
                    leaf.pages)
                self._pending_writebacks.append(leaf)
                leaf.on_device = False
                self.allocator.free(leaf.pages)
                leaf.pages = np.empty(0, dtype=np.int32)
                leaf.num_pages_host = n
                freed += n
                self._evictable_pages -= n
            else:
                # host tier full: drop for real (parent may become leaf)
                self.allocator.free(leaf.pages)
                freed += n
                self._evictable_pages -= n
                parent = leaf.parent
                del parent.children[self._child_key(leaf.key)]
                if (parent is not self.root and not parent.children
                        and parent.lock_ref == 0
                        and getattr(parent, "on_device", True)):
                    heapq.heappush(leaves, parent)
        return freed

    def _host_reserve(self, n: int) -> bool:
        if self.host_pages_used + n > self.host_capacity_pages:
            self._drop_host_lru(self.host_pages_used + n
                                - self.host_capacity_pages)
        if self.host_pages_used + n > self.host_capacity_pages:
            return False
        self.host_pages_used += n
        return True

    def _drop_host_lru(self, need: int) -> None:
        host_nodes = [
            n for n in self._collect_all_nodes()
            if not getattr(n, "on_device", True) and not n.children
        ]
        host_nodes.sort(key=lambda n: n.last_access_time)
        for node in host_nodes:
            if need <= 0:
                break
            n = node.num_pages_host
            self.host_pages_used -= n
            need -= n
            del node.parent.children[self._child_key(node.key)]

    def _collect_all_nodes(self):
        out, stack = [], [self.root]
        while stack:
            node = stack.pop()
            if node is not self.root:
                out.append(node)
            stack.extend(node.children.values())
        return out

    # -------------------------------------------------------- match + load

    def match_prefix(self, token_ids: list[int]) -> MatchResult:
        """Like RadixCache.match_prefix but transparently loads
        host-resident nodes back onto the device."""
        aligned = len(token_ids) - (len(token_ids) % self.page_size)
        node = self.root
        matched_pages = []
        matched = 0
        while matched < aligned:
            ck = self._child_key(token_ids[matched:])
            child = node.children.get(ck)
            if child is None:
                break
            child.last_access_time = time.monotonic()
            limit = min(len(child.key), aligned - matched)
            common = 0
            for i in range(0, limit, self.page_size):
                if child.key[i:i + self.page_size] == \
                        token_ids[matched + i:matched + i + self.page_size]:
                    common = i + self.page_size
                else:
                    break
            if common == 0:
                break
            if not getattr(child, "on_device", True):
                if not self._load_back(child):
                    break  # no device pages free: treat as miss
            if common < len(child.key):
                child = self._split_node(child, common)
            matched_pages.append(child.pages)
            matched += common
            node = child
        pages = (np.concatenate(matched_pages) if matched_pages
                 else np.empty(0, dtype=np.int32))
        return MatchResult(pages=pages, prefix_len=matched, last_node=node)

    def _load_back(self, node: TreeNode) -> bool:
        self._resolve_pending()
        n = node.num_pages_host
        pages = self.allocator.alloc(n)
        if pages is None:
            # try evicting other device-resident nodes first
            self.evict(n - self.allocator.free_pages)
            pages = self.allocator.alloc(n)
            if pages is None:
                return False
        self.runner.scatter_kv_pages(pages, node.host_data)
        node.pages = pages
        node.on_device = True
        node.host_data = None
        self.host_pages_used -= n
        self._evictable_pages += n
        self.load_back_count += 1
        return True

    def evictable_pages(self) -> int:
        return self._evictable_pages

    def total_cached_pages(self) -> int:
        # device-resident only (host pages are not allocator pages)
        return self._evictable_pages + self._protected_pages
