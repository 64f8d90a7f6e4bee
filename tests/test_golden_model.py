"""Golden-accuracy gate: our JAX model vs HuggingFace transformers with the
exact same random weights (the TPU analog of sglang's HFRunner/SRTRunner
logit-comparison tests, test/srt/models/test_generation_models.py)."""

import numpy as np
import pytest

from tests.utils import (
    TINY_LLAMA,
    TINY_QWEN2,
    TINY_QWEN3,
    RawDriver,
    build_hf_model,
    hf_forward_logits,
    hf_greedy_generate,
    load_hf_weights_into,
    make_runner,
)

PROMPT = [3, 17, 94, 201, 5, 77, 150, 42, 9, 133, 61]


@pytest.mark.parametrize("hf_dict", [TINY_LLAMA, TINY_QWEN2, TINY_QWEN3],
                         ids=["llama", "qwen2", "qwen3"])
def test_prefill_logits_match_hf(hf_dict):
    hf_model = build_hf_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)

    ours = driver.prefill_logits(PROMPT)          # [T, V]
    ref = hf_forward_logits(hf_model, PROMPT)     # [T, V]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


@pytest.mark.parametrize("hf_dict", [TINY_LLAMA, TINY_QWEN2],
                         ids=["llama", "qwen2"])
def test_greedy_decode_matches_hf(hf_dict):
    hf_model = build_hf_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)

    ours = driver.generate_greedy(PROMPT, 16)
    ref = hf_greedy_generate(hf_model, PROMPT, 16)
    assert ours == ref


def test_unscanned_matches_scanned():
    hf_model = build_hf_model(TINY_LLAMA)
    r1, _, sa1 = make_runner(TINY_LLAMA)
    load_hf_weights_into(r1, hf_model)
    r2, _, sa2 = make_runner(TINY_LLAMA, scan_layers=False)
    load_hf_weights_into(r2, hf_model)
    d1, d2 = RawDriver(r1, sa1.page_size), RawDriver(r2, sa2.page_size)
    np.testing.assert_allclose(
        d1.prefill_logits(PROMPT), d2.prefill_logits(PROMPT), rtol=1e-5, atol=1e-5
    )
