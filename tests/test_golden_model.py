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


TINY_MIXTRAL = dict(
    architectures=["MixtralForCausalLM"],
    model_type="mixtral",
    num_hidden_layers=2,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=96,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
    num_local_experts=4,
    num_experts_per_tok=2,
)

TINY_QWEN3_MOE = dict(
    architectures=["Qwen3MoeForCausalLM"],
    model_type="qwen3_moe",
    num_hidden_layers=2,
    hidden_size=64,
    head_dim=16,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=96,
    moe_intermediate_size=48,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
    num_experts=4,
    num_experts_per_tok=2,
    norm_topk_prob=True,
    decoder_sparse_step=1,
    mlp_only_layers=[],
)


def _hf_moe_model(hf_dict):
    import torch
    import transformers

    cls = {"mixtral": transformers.MixtralConfig,
           "qwen3_moe": transformers.Qwen3MoeConfig}[hf_dict["model_type"]]
    config = cls(**{k: v for k, v in hf_dict.items() if k != "architectures"})
    torch.manual_seed(0)
    from transformers import AutoModelForCausalLM

    return AutoModelForCausalLM.from_config(config).eval()


@pytest.mark.parametrize("hf_dict", [TINY_MIXTRAL, TINY_QWEN3_MOE],
                         ids=["mixtral", "qwen3_moe"])
def test_moe_prefill_logits_match_hf(hf_dict):
    hf_model = _hf_moe_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("hf_dict", [TINY_MIXTRAL], ids=["mixtral"])
def test_moe_greedy_decode_matches_hf(hf_dict):
    hf_model = _hf_moe_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.generate_greedy(PROMPT, 12)
    ref = hf_greedy_generate(hf_model, PROMPT, 12)
    assert ours == ref


TINY_GEMMA = dict(
    architectures=["GemmaForCausalLM"],
    model_type="gemma",
    num_hidden_layers=2,
    hidden_size=64,
    head_dim=16,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=True,
    hidden_act="gelu_pytorch_tanh",
    hidden_activation="gelu_pytorch_tanh",
)


def test_gemma_prefill_logits_match_hf():
    import torch
    import transformers

    config = transformers.GemmaConfig(**{
        k: v for k, v in TINY_GEMMA.items() if k != "architectures"})
    torch.manual_seed(0)
    from transformers import AutoModelForCausalLM

    hf_model = AutoModelForCausalLM.from_config(config).eval()
    runner, cfg, sa = make_runner(TINY_GEMMA)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


TINY_DSV2 = dict(
    architectures=["DeepseekV2ForCausalLM"],
    model_type="deepseek_v2",
    num_hidden_layers=3,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=4,
    intermediate_size=96,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
    q_lora_rank=None,
    kv_lora_rank=16,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
    n_routed_experts=4,
    n_shared_experts=1,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    first_k_dense_replace=1,
    routed_scaling_factor=1.0,
    topk_method="greedy",
    n_group=1,
    topk_group=1,
    norm_topk_prob=False,
    aux_loss_alpha=0.0,
    seq_aux=False,
)

TINY_DSV3 = dict(
    architectures=["DeepseekV3ForCausalLM"],
    model_type="deepseek_v3",
    num_hidden_layers=3,
    hidden_size=64,
    num_attention_heads=4,
    num_key_value_heads=4,
    intermediate_size=96,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
    q_lora_rank=24,
    kv_lora_rank=16,
    qk_nope_head_dim=16,
    qk_rope_head_dim=8,
    v_head_dim=16,
    n_routed_experts=8,
    n_shared_experts=1,
    num_experts_per_tok=2,
    moe_intermediate_size=32,
    first_k_dense_replace=1,
    routed_scaling_factor=2.5,
    n_group=2,
    topk_group=1,
    norm_topk_prob=True,
)


def _hf_deepseek_model(hf_dict):
    import torch
    import transformers

    cls = {"deepseek_v2": transformers.DeepseekV2Config,
           "deepseek_v3": transformers.DeepseekV3Config}[hf_dict["model_type"]]
    config = cls(**{k: v for k, v in hf_dict.items() if k != "architectures"})
    config._attn_implementation = "eager"
    torch.manual_seed(0)
    from transformers import AutoModelForCausalLM

    return AutoModelForCausalLM.from_config(config).eval()


@pytest.mark.parametrize("hf_dict", [TINY_DSV2, TINY_DSV3],
                         ids=["deepseek_v2", "deepseek_v3"])
def test_mla_prefill_logits_match_hf(hf_dict):
    hf_model = _hf_deepseek_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("hf_dict", [TINY_DSV2, TINY_DSV3],
                         ids=["deepseek_v2", "deepseek_v3"])
def test_mla_greedy_decode_matches_hf(hf_dict):
    hf_model = _hf_deepseek_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.generate_greedy(PROMPT, 12)
    ref = hf_greedy_generate(hf_model, PROMPT, 12)
    assert ours == ref


TINY_GEMMA2 = dict(
    architectures=["Gemma2ForCausalLM"],
    model_type="gemma2",
    num_hidden_layers=4,
    hidden_size=64,
    head_dim=16,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=True,
    hidden_act="gelu_pytorch_tanh",
    hidden_activation="gelu_pytorch_tanh",
    query_pre_attn_scalar=16,
    attn_logit_softcapping=50.0,
    final_logit_softcapping=30.0,
    sliding_window=8,   # < prompt length: hybrid masking is exercised
)

TINY_GEMMA3 = dict(
    architectures=["Gemma3ForCausalLM"],
    model_type="gemma3_text",
    num_hidden_layers=6,
    hidden_size=64,
    head_dim=16,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    rms_norm_eps=1e-6,
    rope_theta=1000000.0,
    rope_local_base_freq=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=True,
    hidden_act="gelu_pytorch_tanh",
    hidden_activation="gelu_pytorch_tanh",
    query_pre_attn_scalar=16,
    sliding_window=8,
)


def _hf_gemma_model(hf_dict):
    import torch
    import transformers

    cls = {"gemma2": transformers.Gemma2Config,
           "gemma3_text": transformers.Gemma3TextConfig}[hf_dict["model_type"]]
    config = cls(**{k: v for k, v in hf_dict.items() if k != "architectures"})
    config._attn_implementation = "eager"
    torch.manual_seed(0)
    from transformers import AutoModelForCausalLM

    return AutoModelForCausalLM.from_config(config).eval()


@pytest.mark.parametrize("hf_dict", [TINY_GEMMA2, TINY_GEMMA3],
                         ids=["gemma2", "gemma3"])
def test_gemma23_prefill_logits_match_hf(hf_dict):
    hf_model = _hf_gemma_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("hf_dict", [TINY_GEMMA2, TINY_GEMMA3],
                         ids=["gemma2", "gemma3"])
def test_gemma23_greedy_decode_matches_hf(hf_dict):
    hf_model = _hf_gemma_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.generate_greedy(PROMPT, 12)
    ref = hf_greedy_generate(hf_model, PROMPT, 12)
    assert ours == ref


def test_yarn_rope_matches_hf():
    """YaRN NTK-by-parts scaling + attention factor vs HF (llama)."""
    hf_dict = dict(TINY_LLAMA)
    hf_dict["rope_scaling"] = {
        "rope_type": "yarn", "factor": 4.0,
        "original_max_position_embeddings": 128}
    hf_model = build_hf_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    ours = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_yarn_mscale_deepseek_matches_hf():
    """DeepSeek yarn with mscale/mscale_all_dim (the real-V2/V3 rope)."""
    hf_dict = dict(TINY_DSV2)
    hf_dict["rope_scaling"] = {
        "rope_type": "yarn", "factor": 8.0,
        "original_max_position_embeddings": 64,
        "mscale": 0.707, "mscale_all_dim": 0.707,
        "beta_fast": 32, "beta_slow": 1}
    hf_model = _hf_deepseek_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    ours = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_moe_ep_matches_hf():
    """Expert-parallel MoE (shard_map over a 4-way tp axis) must match HF
    exactly like the dense dispatch does."""
    hf_model = _hf_moe_model(TINY_MIXTRAL)
    runner, cfg, sa = make_runner(TINY_MIXTRAL, tp_size=4, ep_size=4)
    assert runner.model.moe_impl == "ep"
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_deepseek_ep_matches_hf():
    hf_model = _hf_deepseek_model(TINY_DSV3)
    runner, cfg, sa = make_runner(TINY_DSV3, tp_size=4, ep_size=4)
    assert runner.model.moe_impl == "ep"
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
