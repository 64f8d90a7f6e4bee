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
