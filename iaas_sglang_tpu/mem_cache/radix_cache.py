"""RadixCache: page-granular prefix tree over token ids.

Re-design of sglang mem_cache/radix_cache.py:97 for the TPU stack. The
reference maps prefixes to token-level KV indices; here every cached unit
is a whole KV *page* (page_size tokens), which keeps the device-side page
tables small and the XLA-side shapes page-aligned. Only full pages are
ever cached/shared; the partial tail page of a sequence stays owned by
the request.

Eviction is LRU over unlocked leaves (heap by last_access_time), identical
in spirit to radix_cache.py:271. `lock_ref` protects nodes whose pages are
referenced by in-flight requests (radix_cache.py:296).
"""

from __future__ import annotations

import heapq
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from iaas_sglang_tpu.mem_cache.allocator import PageAllocator


class TreeNode:
    _counter = 0

    def __init__(self):
        self.children: dict[tuple, "TreeNode"] = {}
        self.parent: Optional["TreeNode"] = None
        self.key: list[int] = []          # token ids, len % page_size == 0
        self.pages: np.ndarray = np.empty(0, dtype=np.int32)
        self.lock_ref = 0
        self.last_access_time = time.monotonic()
        # HiRadixCache state (host KV tier)
        self.on_device = True
        self.host_data = None
        self.num_pages_host = 0
        self.id = TreeNode._counter
        TreeNode._counter += 1

    def __lt__(self, other: "TreeNode"):
        return self.last_access_time < other.last_access_time


@dataclass
class MatchResult:
    """Result of a prefix lookup (analog of base_prefix_cache.py:12)."""
    pages: np.ndarray                 # page ids covering the matched prefix
    prefix_len: int                   # tokens covered (multiple of page_size)
    last_node: object                 # node to lock while the request runs


def free_encoder_pages(req, allocator) -> None:
    """Cross-attention (Mllama): release a request's encoder-KV pages
    (allocated outside the text page table) on finish/retract/abort."""
    enc = getattr(req, "enc_pages", None)
    if enc is not None and len(enc):
        allocator.free(np.asarray(enc, dtype=np.int32))
    req.enc_pages = None
    req.enc_written = False
    req.enc_len = 0


class BasePrefixCache:
    def match_prefix(self, token_ids: list[int]) -> MatchResult:
        raise NotImplementedError

    def cache_finished_req(self, req) -> None:
        raise NotImplementedError

    def cache_unfinished_req(self, req) -> None:
        raise NotImplementedError

    def evict(self, num_pages: int) -> int:
        return 0

    def evictable_pages(self) -> int:
        return 0

    def inc_lock_ref(self, node) -> None:
        pass

    def dec_lock_ref(self, node) -> None:
        pass

    def reset(self) -> None:
        pass


class RadixCache(BasePrefixCache):
    def __init__(self, allocator: PageAllocator, page_size: int,
                 event_publisher=None):
        self.allocator = allocator
        self.page_size = page_size
        self.event_publisher = event_publisher
        self.reset()

    def _emit_stored(self, node: "TreeNode") -> None:
        if self.event_publisher is None:
            return
        from iaas_sglang_tpu.mem_cache.kv_events import BlockStored, page_hash

        parent = node.parent
        parent_hash = getattr(parent, "_tail_hash", None) \
            if parent is not None else None
        h = parent_hash or 0
        hashes = []
        for i in range(0, len(node.key), self.page_size):
            h = page_hash(node.key[i:i + self.page_size], h)
            hashes.append(h)
        node._tail_hash = h
        self.event_publisher.record(BlockStored(
            block_hashes=hashes, token_ids=list(node.key),
            parent_block_hash=parent_hash))

    def _emit_removed(self, node: "TreeNode") -> None:
        if self.event_publisher is None:
            return
        from iaas_sglang_tpu.mem_cache.kv_events import BlockRemoved

        if getattr(node, "_tail_hash", None) is not None:
            self.event_publisher.record(
                BlockRemoved(block_hashes=[node._tail_hash]))

    # ------------------------------------------------------------------ core

    def reset(self) -> None:
        self.root = TreeNode()
        self.root.lock_ref = 1  # never evict the root
        self._evictable_pages = 0
        self._protected_pages = 0

    def _child_key(self, key: list[int]) -> tuple:
        return tuple(key[: self.page_size])

    def match_prefix(self, token_ids: list[int]) -> MatchResult:
        """Longest page-aligned prefix of token_ids present in the tree."""
        aligned = len(token_ids) - (len(token_ids) % self.page_size)
        node = self.root
        matched_pages: list[np.ndarray] = []
        matched = 0
        while matched < aligned:
            ck = self._child_key(token_ids[matched:])
            child = node.children.get(ck)
            if child is None:
                break
            child.last_access_time = time.monotonic()
            # common page-aligned prefix between child.key and the query tail
            limit = min(len(child.key), aligned - matched)
            common = 0
            for i in range(0, limit, self.page_size):
                if child.key[i : i + self.page_size] == token_ids[matched + i : matched + i + self.page_size]:
                    common = i + self.page_size
                else:
                    break
            if common == 0:
                break
            if common < len(child.key):
                child = self._split_node(child, common)
            matched_pages.append(child.pages)
            matched += common
            node = child
        pages = (
            np.concatenate(matched_pages)
            if matched_pages
            else np.empty(0, dtype=np.int32)
        )
        return MatchResult(pages=pages, prefix_len=matched, last_node=node)

    def _split_node(self, node: TreeNode, split_len: int) -> TreeNode:
        """Split `node` so its first split_len tokens become a new parent."""
        assert split_len % self.page_size == 0
        new_node = TreeNode()
        new_node.key = node.key[:split_len]
        new_node.pages = node.pages[: split_len // self.page_size]
        new_node.parent = node.parent
        new_node.lock_ref = node.lock_ref
        new_node.children = {self._child_key(node.key[split_len:]): node}
        new_node.parent.children[self._child_key(new_node.key)] = new_node
        node.parent = new_node
        node.key = node.key[split_len:]
        node.pages = node.pages[split_len // self.page_size :]
        return new_node

    def insert(self, token_ids: list[int], pages: np.ndarray) -> int:
        """Insert a page-aligned token sequence with its pages.

        Returns the number of prefix tokens that were ALREADY in the tree —
        the caller must free its duplicate pages for that region
        (mirrors radix_cache.py:219 cache_unfinished dedup).
        """
        assert len(token_ids) % self.page_size == 0
        assert len(pages) == len(token_ids) // self.page_size
        node = self.root
        matched = 0
        total_prior = 0
        while matched < len(token_ids):
            ck = self._child_key(token_ids[matched:])
            child = node.children.get(ck)
            if child is None:
                new_node = TreeNode()
                new_node.key = list(token_ids[matched:])
                new_node.pages = np.asarray(
                    pages[matched // self.page_size :], dtype=np.int32
                ).copy()
                new_node.parent = node
                node.children[ck] = new_node
                self._evictable_pages += len(new_node.pages)
                self._emit_stored(new_node)
                return total_prior
            child.last_access_time = time.monotonic()
            limit = min(len(child.key), len(token_ids) - matched)
            common = 0
            for i in range(0, limit, self.page_size):
                if child.key[i : i + self.page_size] == token_ids[matched + i : matched + i + self.page_size]:
                    common = i + self.page_size
                else:
                    break
            if common == 0:
                # hash collision on first page tuple with different content
                # cannot happen: child key starts with ck == query page
                raise AssertionError("radix invariant violated")
            if common < len(child.key):
                child = self._split_node(child, common)
            matched += common
            total_prior += common
            node = child
        return total_prior

    # ------------------------------------------------------------ lock / evict

    def inc_lock_ref(self, node: TreeNode) -> None:
        while node is not None and node is not self.root:
            if node.lock_ref == 0:
                n = len(node.pages)
                self._evictable_pages -= n
                self._protected_pages += n
            node.lock_ref += 1
            node = node.parent

    def dec_lock_ref(self, node: TreeNode) -> None:
        while node is not None and node is not self.root:
            assert node.lock_ref > 0
            node.lock_ref -= 1
            if node.lock_ref == 0:
                n = len(node.pages)
                self._evictable_pages += n
                self._protected_pages -= n
            node = node.parent

    def evictable_pages(self) -> int:
        return self._evictable_pages

    def protected_pages(self) -> int:
        return self._protected_pages

    def evict(self, num_pages: int) -> int:
        """Evict >= num_pages pages from unlocked leaves, LRU first.
        Returns pages actually freed."""
        leaves = [n for n in self._collect_leaves() if n.lock_ref == 0]
        heapq.heapify(leaves)
        freed = 0
        while freed < num_pages and leaves:
            leaf = heapq.heappop(leaves)
            if leaf is self.root or leaf.lock_ref > 0:
                continue
            self.allocator.free(leaf.pages)
            freed += len(leaf.pages)
            self._evictable_pages -= len(leaf.pages)
            self._emit_removed(leaf)
            parent = leaf.parent
            del parent.children[self._child_key(leaf.key)]
            if parent is not self.root and not parent.children and parent.lock_ref == 0:
                heapq.heappush(leaves, parent)
        return freed

    def _collect_leaves(self) -> list[TreeNode]:
        out, stack = [], [self.root]
        while stack:
            node = stack.pop()
            if not node.children and node is not self.root:
                out.append(node)
            stack.extend(node.children.values())
        return out

    def total_cached_pages(self) -> int:
        return self._evictable_pages + self._protected_pages

    # ------------------------------------------------------- request lifecycle

    def cache_finished_req(self, req) -> None:
        """Move a finished request's full pages into the tree; free the tail.

        Analog of radix_cache.py:182 cache_finished_req.
        """
        free_encoder_pages(req, self.allocator)
        if getattr(req, "lora_slot", 0) or getattr(req, "radix_bypass", 0):
            # adapter-specific KV never enters the shared tree; nor does
            # image-conditioned text KV (cross-attention outputs differ
            # per image while the token ids do not)
            self.allocator.free(np.asarray(req.owned_pages, dtype=np.int32))
            if req.last_node is not None:
                self.dec_lock_ref(req.last_node)
            return
        token_ids = req.fill_ids()[: req.fill_len]
        aligned = len(token_ids) - (len(token_ids) % self.page_size)
        pages = req.page_table_np()[: aligned // self.page_size]
        prior = self.insert(token_ids[:aligned], pages)
        # pages in [cached_prefix_len, prior) were freshly written by this
        # request but already existed in the tree -> free the duplicates
        dup_lo = req.cached_prefix_len // self.page_size
        dup_hi = prior // self.page_size
        if dup_hi > dup_lo:
            self.allocator.free(pages[dup_lo:dup_hi])
        # partial tail page is never shared -> free it
        tail = req.page_table_np()[aligned // self.page_size :]
        self.allocator.free(np.asarray(tail, dtype=np.int32))
        if req.last_node is not None:
            self.dec_lock_ref(req.last_node)

    def cache_unfinished_req(self, req) -> None:
        """Publish the full pages of an in-flight request into the tree so
        concurrent requests can share them (chunked prefill dedup), and
        re-lock the deeper node. Analog of radix_cache.py:219."""
        if getattr(req, "lora_slot", 0) or getattr(req, "radix_bypass", 0):
            return
        token_ids = req.fill_ids()[: req.fill_len]
        aligned = len(token_ids) - (len(token_ids) % self.page_size)
        if aligned == 0:
            return
        pages = req.page_table_np()[: aligned // self.page_size]
        prior = self.insert(token_ids[:aligned], pages)
        dup_lo = req.cached_prefix_len // self.page_size
        dup_hi = prior // self.page_size
        res = self.match_prefix(token_ids[:aligned])
        assert res.prefix_len >= aligned, "just-inserted prefix must match"
        if dup_hi > dup_lo:
            # our freshly-written duplicates are replaced by the tree's pages
            self.allocator.free(pages[dup_lo:dup_hi])
        if req.last_node is not None:
            self.dec_lock_ref(req.last_node)
        self.inc_lock_ref(res.last_node)
        # the request now references tree pages for the aligned region
        req.adopt_prefix(res.pages, aligned, res.last_node)

    # ------------------------------------------------------------------- debug

    def pretty_print(self) -> str:
        lines: list[str] = []

        def rec(node: TreeNode, depth: int):
            for child in node.children.values():
                lines.append(
                    "  " * depth
                    + f"[{len(child.key)} tok, {len(child.pages)} pg, lock={child.lock_ref}] {child.key[:8]}"
                )
                rec(child, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)
