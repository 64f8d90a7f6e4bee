"""Speculative decoding: n-gram (prompt-lookup) drafting + target verify.

The reference ships EAGLE/EAGLE3 (srt/speculative/eagle_worker.py:68):
draft model -> tree expansion -> TARGET_VERIFY forward -> accept. This
module implements the same verify machinery with an n-gram draft source
(prompt-lookup decoding) — zero extra weights, strong on code/extractive
workloads — and the draft interface EAGLE plugs into later.

KV correctness on rejection needs NO rollback in this design: a KV slot
is addressed by (page_table, position), so a rejected draft's garbage KV
at position p is overwritten the moment position p is legitimately
filled. (The reference needs explicit KV-index freeing here,
eagle_worker.py:636.)

Verification is greedy: a draft token is accepted while it equals the
target argmax at its position; the target's own token at the first
mismatch is the bonus token (so every verify step emits >= 1 token).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def draft_ngram(
    token_ids: Sequence[int],
    num_draft: int,
    max_ngram: int = 3,
    min_ngram: int = 1,
) -> Optional[List[int]]:
    """Prompt-lookup draft: find the most recent earlier occurrence of the
    current tail n-gram and propose the tokens that followed it."""
    n = len(token_ids)
    if n < min_ngram + 1:
        return None
    arr = token_ids
    for k in range(min(max_ngram, n - 1), min_ngram - 1, -1):
        tail = list(arr[n - k:])
        # search backwards, excluding the tail occurrence itself
        for start in range(n - k - 1, -1, -1):
            if list(arr[start:start + k]) == tail:
                cont = list(arr[start + k : start + k + num_draft])
                if cont:
                    return cont
        # fall through to a shorter n-gram
    return None


def accept_draft_tokens(
    draft: List[int],
    verify_tokens: np.ndarray,   # i32[K+1] target argmax at each position
    *,
    eos_token_ids: set,
    stop_token_ids: Sequence[int],
    ignore_eos: bool,
) -> List[int]:
    """Returns the tokens to emit: accepted drafts + the bonus token,
    truncated at the first stop/eos token (inclusive)."""
    emitted: List[int] = []
    K = len(draft)

    def is_stop(t: int) -> bool:
        return (not ignore_eos and t in eos_token_ids) or t in stop_token_ids

    for j in range(K):
        target_tok = int(verify_tokens[j])
        if target_tok != draft[j]:
            emitted.append(target_tok)  # bonus token at first divergence
            return emitted
        emitted.append(target_tok)
        if is_stop(target_tok):
            return emitted
    emitted.append(int(verify_tokens[K]))  # all drafts accepted: bonus
    return emitted


class TreeDraft:
    """A selected draft tree for one request (EAGLE topk>1; analog of the
    reference's build_eagle_tree.py:45 output). Rows are verify-segment
    slots: row 0 = the pending output token (root), rows 1..K = tree nodes
    sorted by score (ancestors always precede descendants because a
    parent's cumulative logprob bounds its children's)."""

    __slots__ = ("tokens", "depths", "bits", "parent_rows")

    def __init__(self, tokens, depths, bits, parent_rows):
        self.tokens = tokens            # list[int], len K
        self.depths = depths            # list[int], len K (>= 1)
        self.bits = bits                # np.int32[32] ancestor bitmask/row
        self.parent_rows = parent_rows  # list[int], len K (0 = root)


def build_tree_draft(cand_tokens: np.ndarray, cand_scores: np.ndarray,
                     K: int) -> TreeDraft:
    """Select the top-K nodes of a spine+siblings candidate pool.

    cand_tokens/cand_scores: [S, tk] — step d's topk tokens (desc by
    logprob; column 0 = the greedy spine token) and cumulative scores
    (spine logprob through depth d plus the candidate's own logprob).
    Every candidate's parent is the spine node at the previous depth, so
    a score-descending top-K is automatically ancestor-closed."""
    S, tk = cand_tokens.shape
    flat = [(-float(cand_scores[d, j]), d, j)
            for d in range(S) for j in range(tk)]
    flat.sort()
    sel = flat[:K]
    rows = {}                      # (d, j) -> row id (1-based)
    for r, (_, d, j) in enumerate(sel, start=1):
        rows[(d, j)] = r
    bits = np.zeros(32, dtype=np.int64)
    bits[0] = 1
    tokens, depths, parents = [], [], []
    for r, (_, d, j) in enumerate(sel, start=1):
        prow = 0 if d == 0 else rows.get((d - 1, 0), 0)
        bits[r] = bits[prow] | (np.int64(1) << r)
        tokens.append(int(cand_tokens[d, j]))
        depths.append(d + 1)
        parents.append(prow)
    return TreeDraft(tokens, depths,
                     (bits & 0xFFFFFFFF).astype(np.uint32).view(np.int32),
                     parents)


def accept_tree_tokens(
    tree: TreeDraft,
    verify_tokens: np.ndarray,   # i32[K+1] target argmax at each tree row
    *,
    eos_token_ids: set,
    stop_token_ids: Sequence[int],
    ignore_eos: bool,
):
    """Greedy tree acceptance: walk from the root, at each visited row
    follow the child whose token equals the target's argmax there.
    Returns (emitted, src_rows, node_rows):
      emitted[j]   -- token to emit
      src_rows[j]  -- the row whose hidden state PRODUCED emitted[j]
                      (EAGLE feature feedback)
      node_rows[j] -- the tree row holding emitted[j]'s KV, or -1 when the
                      token has no written KV (bonus / divergence token)
    """
    children: dict = {}
    for i, p in enumerate(tree.parent_rows):
        children.setdefault(p, []).append((i + 1, tree.tokens[i]))

    def is_stop(t: int) -> bool:
        return (not ignore_eos and t in eos_token_ids) or t in stop_token_ids

    emitted, src_rows, node_rows = [], [], []
    cur = 0
    while True:
        t = int(verify_tokens[cur])
        emitted.append(t)
        src_rows.append(cur)
        nxt = None
        for (row, tok) in children.get(cur, ()):
            if tok == t:
                nxt = row
                break
        node_rows.append(-1 if nxt is None else nxt)
        if nxt is None or is_stop(t):
            if nxt is not None and is_stop(t):
                pass  # accepted node token that is also a stop: keep its KV
            return emitted, src_rows, node_rows
        cur = nxt
