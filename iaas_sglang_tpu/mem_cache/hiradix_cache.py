"""HiRadixCache: hierarchical device -> host-RAM KV tier
(analog of sglang mem_cache/hiradix_cache.py:26 + cache_controller.py —
re-designed around whole-page transfers instead of per-layer CUDA streams).

Write policies (reference cache_controller.py:170,194):
  write_back               -- gather a victim's KV to host at EVICTION
                              time; the tree node stays, marked
                              host-resident.
  write_through            -- back every newly inserted node up to host
                              immediately (async device->host copy);
                              eviction then just drops the device pages.
  write_through_selective  -- back a node up once it has been HIT
                              (matched) `backup_threshold` times; cold
                              nodes degrade to write_back. [default]

A later prefix match on a host-resident node allocates fresh device pages
and scatters the KV back — turning what would be a full recompute into a
host->HBM DMA. All device->host copies are launched asynchronously
(jax async dispatch + copy_to_host_async, the TPU analog of the
reference's dedicated write/load CUDA streams) and resolved lazily.

Host tier capacity is `hicache_ratio x` the device pool; beyond that,
least-recently-used host entries are dropped for real (backups of
device-resident nodes are cleared first, then host-only nodes).
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
                 host_capacity_pages: int,
                 write_policy: str = "write_through_selective",
                 backup_threshold: int = 2):
        assert write_policy in ("write_back", "write_through",
                                "write_through_selective"), write_policy
        self.runner = runner
        self.host_capacity_pages = host_capacity_pages
        self.host_pages_used = 0
        self.load_back_count = 0
        self.write_policy = write_policy
        self.backup_threshold = backup_threshold
        # write-backs whose device->host copy is still in flight (the
        # async-stream analog); resolved to numpy at the next evict/load
        self._pending_writebacks: list = []
        super().__init__(allocator, page_size)

    def _resolve_pending(self) -> None:
        for node in self._pending_writebacks:
            if node.host_data is not None                     and not isinstance(node.host_data, np.ndarray):
                node.host_data = np.asarray(node.host_data)
        self._pending_writebacks = []

    # host_data on a node: np array [L * n_pages, ps, 2Nk, D]
    # (layer-major: runner._flat_page_ids order)

    def _backup(self, node: TreeNode) -> bool:
        """Write-through: snapshot an on-device node's KV to host so a
        later eviction is a free drop (cache_controller write_through)."""
        if getattr(node, "host_data", None) is not None \
                or not getattr(node, "on_device", True):
            return True
        n = len(node.pages)
        if n == 0 or not self._host_reserve(n):
            return False
        node.host_data = self.runner.gather_kv_pages_async(node.pages)
        node.num_pages_host = n
        self._pending_writebacks.append(node)
        return True

    def _emit_stored(self, node: TreeNode) -> None:
        super()._emit_stored(node)
        if self.write_policy == "write_through":
            self._backup(node)

    def _note_hit(self, node: TreeNode) -> None:
        node.hit_count = getattr(node, "hit_count", 0) + 1
        if (self.write_policy == "write_through_selective"
                and node.hit_count >= self.backup_threshold):
            self._backup(node)

    def evict(self, num_pages: int) -> int:
        """Write back LRU *device-leaves* to host instead of dropping
        them. A device-leaf is an on-device node with no on-device
        descendant — host-resident children must not pin their parent's
        device pages (they only depend on the token path, which stays)."""
        import heapq

        self._resolve_pending()
        has_dev_desc: dict = {}

        def mark(node: TreeNode) -> bool:
            flag = False
            for c in node.children.values():
                cf = mark(c)
                flag = flag or cf or getattr(c, "on_device", True)
            has_dev_desc[id(node)] = flag
            return flag

        mark(self.root)
        leaves = [n for n in self._collect_all_nodes()
                  if getattr(n, "on_device", True) and n.lock_ref == 0
                  and not has_dev_desc[id(n)]]
        heapq.heapify(leaves)
        freed = 0
        while freed < num_pages and leaves:
            leaf = heapq.heappop(leaves)
            if (leaf is self.root or leaf.lock_ref > 0
                    or not getattr(leaf, "on_device", True)):
                continue
            n = len(leaf.pages)
            parent = leaf.parent
            if getattr(leaf, "host_data", None) is not None:
                # write-through backup already on host: free drop
                leaf.on_device = False
                self.allocator.free(leaf.pages)
                leaf.pages = np.empty(0, dtype=np.int32)
                leaf.num_pages_host = n
                freed += n
                self._evictable_pages -= n
            elif self._host_reserve(n):
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
                # host tier full: drop this node AND its (host-resident)
                # subtree for real — children's KV is unreachable without
                # the prefix
                self.allocator.free(leaf.pages)
                freed += n
                self._evictable_pages -= n
                self._drop_subtree(leaf)
            if (parent is not None and parent is not self.root
                    and getattr(parent, "on_device", True)
                    and parent.lock_ref == 0
                    and not any(getattr(c, "on_device", True)
                                or has_dev_desc.get(id(c), False)
                                for c in parent.children.values())):
                heapq.heappush(leaves, parent)
        return freed

    def _drop_subtree(self, node: TreeNode) -> None:
        """Remove a node and all descendants, releasing their host-tier
        accounting (descendants are host-resident by construction)."""
        stack = [node]
        while stack:
            n = stack.pop()
            if getattr(n, "host_data", None) is not None:
                self.host_pages_used -= getattr(n, "num_pages_host", 0)
                n.host_data = None
            self._emit_removed(n)
            stack.extend(n.children.values())
        del node.parent.children[self._child_key(node.key)]

    def _host_reserve(self, n: int) -> bool:
        if self.host_pages_used + n > self.host_capacity_pages:
            self._drop_host_lru(self.host_pages_used + n
                                - self.host_capacity_pages)
        if self.host_pages_used + n > self.host_capacity_pages:
            return False
        self.host_pages_used += n
        return True

    def _drop_host_lru(self, need: int) -> None:
        # backups of device-resident nodes go first (dropping one loses
        # nothing — the device copy remains); then host-only leaves
        backups, host_only = [], []
        for n in self._collect_all_nodes():
            if getattr(n, "on_device", True):
                if getattr(n, "host_data", None) is not None:
                    backups.append(n)
            elif not n.children:
                host_only.append(n)
        backups.sort(key=lambda n: n.last_access_time)
        host_only.sort(key=lambda n: n.last_access_time)
        for node in backups:
            if need <= 0:
                return
            self.host_pages_used -= node.num_pages_host
            need -= node.num_pages_host
            node.host_data = None
        for node in host_only:
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
            self._note_hit(child)
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
        if self.write_policy == "write_back":
            node.host_data = None
            self.host_pages_used -= n
        # write-through: keep the host copy so the next eviction of this
        # node is again a free drop
        self._evictable_pages += n
        self.load_back_count += 1
        return True

    def reset(self) -> None:
        super().reset()
        self.host_pages_used = 0
        self._pending_writebacks = []

    def _split_node(self, node: TreeNode, split_len: int) -> TreeNode:
        """Split like the base class, but also split a host backup
        (host_data is layer-major [L * n_pages, ...]) and carry the
        hierarchical bookkeeping onto the new parent."""
        had_host = getattr(node, "host_data", None) is not None
        if had_host:
            self._resolve_pending()
            host_data = node.host_data
        new_node = super()._split_node(node, split_len)
        new_node.on_device = getattr(node, "on_device", True)
        new_node.hit_count = getattr(node, "hit_count", 0)
        if had_host:
            k = split_len // self.page_size
            n_total = getattr(node, "num_pages_host", 0) or \
                (k + len(node.pages))
            # page axis: interleaved gather is [L*n, ps, ne, ed]; the
            # K/V-split pool gathers plane-outermost [2, L*n, ps, NkD]
            pax = 1 if getattr(self.runner, "kv_split", False) else 0
            lead = host_data.shape[:pax]
            per_layer = host_data.reshape(
                lead + (-1, n_total) + host_data.shape[pax + 1:])
            tail = (-1,) + host_data.shape[pax + 1:]
            new_node.host_data = np.ascontiguousarray(
                np.take(per_layer, range(k), axis=pax + 1)
            ).reshape(lead + tail)
            node.host_data = np.ascontiguousarray(
                np.take(per_layer, range(k, n_total), axis=pax + 1)
            ).reshape(lead + tail)
            new_node.num_pages_host = k
            node.num_pages_host = n_total - k
        return new_node

    def evictable_pages(self) -> int:
        return self._evictable_pages

    def total_cached_pages(self) -> int:
        # device-resident only (host pages are not allocator pages)
        return self._evictable_pages + self._protected_pages
