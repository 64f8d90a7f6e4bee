"""Speculative decoding (ngram draft + target verify): unit accept logic
and end-to-end greedy parity with plain decoding
(analog of the reference's EAGLE tests, srt/speculative/)."""

import numpy as np
import pytest

from iaas_sglang_tpu.speculative.ngram_worker import (
    accept_draft_tokens,
    draft_ngram,
)
from tests.test_scheduler import make_engine


def test_draft_ngram_finds_repeat():
    ids = [1, 2, 3, 4, 9, 9, 1, 2, 3]
    d = draft_ngram(ids, num_draft=3)
    # tail [1,2,3] occurred earlier, followed by [4, 9, 9]
    assert d == [4, 9, 9]


def test_draft_ngram_no_match():
    assert draft_ngram([1, 2, 3, 4, 5], num_draft=3, min_ngram=2) is None


def test_accept_full():
    out = accept_draft_tokens(
        [5, 6, 7], np.array([5, 6, 7, 8]),
        eos_token_ids=set(), stop_token_ids=[], ignore_eos=False)
    assert out == [5, 6, 7, 8]  # all accepted + bonus


def test_accept_partial():
    out = accept_draft_tokens(
        [5, 9, 7], np.array([5, 6, 7, 8]),
        eos_token_ids=set(), stop_token_ids=[], ignore_eos=False)
    assert out == [5, 6]  # accept 5, then target's 6 as bonus


def test_accept_stops_at_eos():
    out = accept_draft_tokens(
        [5, 2, 7], np.array([5, 2, 7, 8]),
        eos_token_ids={2}, stop_token_ids=[], ignore_eos=False)
    assert out == [5, 2]


def test_spec_matches_plain_greedy():
    """Spec decoding must emit exactly the plain greedy continuation."""
    eng_spec = make_engine(speculative_algorithm="ngram",
                           speculative_num_draft_tokens=4)
    eng_plain = make_engine()
    # a repetitive prompt gives the ngram draft traction
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
    ]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    outs_s = eng_spec.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_s, outs_p):
        assert a["output_ids"] == b["output_ids"]
    st = eng_spec.get_internal_state()
    assert st["spec_accept_length"] >= 1.0  # every verify emits >= 1
    eng_spec.scheduler.check_memory_leak()


def test_spec_with_stop_tokens():
    eng = make_engine(speculative_algorithm="ngram")
    ids = [3, 4, 5, 3, 4, 5, 3, 4]
    free = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0})
    stop_tok = free["output_ids"][2]
    out = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0,
        "stop_token_ids": [stop_tok]})
    assert out["output_ids"][-1] == stop_tok
    assert len(out["output_ids"]) == 3


def test_eagle_matches_plain_greedy():
    """EAGLE (dummy-weight draft) must emit exactly the plain greedy
    continuation — verification is exact regardless of draft quality."""
    eng_eagle = make_engine(speculative_algorithm="eagle",
                            speculative_num_draft_tokens=3)
    eng_plain = make_engine()
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
        list(range(100, 170)),   # > chunked_prefill_size: exercises carry
    ]
    sp = {"max_new_tokens": 14, "temperature": 0.0}
    outs_e = eng_eagle.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_e, outs_p):
        assert a["output_ids"] == b["output_ids"]
    st = eng_eagle.get_internal_state()
    assert st["spec_accept_length"] >= 1.0
    eng_eagle.scheduler.check_memory_leak()


def test_eagle_prefix_cache_reuse_parity():
    """Second pass over the same prompts hits the radix cache (draft primes
    only from the uncached suffix) — tokens must still match."""
    eng = make_engine(speculative_algorithm="eagle",
                      speculative_num_draft_tokens=3)
    prompts = [list(range(20, 40))]
    sp = {"max_new_tokens": 10, "temperature": 0.0}
    first = eng.generate(input_ids=prompts, sampling_params=sp)
    second = eng.generate(input_ids=prompts, sampling_params=sp)
    assert first[0]["output_ids"] == second[0]["output_ids"]
