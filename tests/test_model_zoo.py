"""Golden parity for the structural-variant model families (GPT-2, Phi,
Starcoder2, StableLM, OLMo2, OLMoE, Cohere, Granite, GLM4, ...) — same
HF-random-weights logit comparison as test_golden_model.py (the analog of
sglang test/srt/models/test_generation_models.py across its model zoo)."""

import numpy as np
import pytest

from tests.utils import (
    RawDriver,
    hf_forward_logits,
    hf_greedy_generate,
    load_hf_weights_into,
    make_runner,
)

PROMPT = [3, 17, 94, 201, 5, 77, 150, 42, 9, 133, 61]

COMMON = dict(
    num_hidden_layers=2,
    hidden_size=64,
    num_attention_heads=4,
    intermediate_size=128,
    vocab_size=256,
    max_position_embeddings=512,
)

ZOO = {
    "gpt2": dict(
        architectures=["GPT2LMHeadModel"],
        model_type="gpt2",
        n_layer=2, n_embd=64, n_head=4, n_positions=512, n_inner=None,
        vocab_size=256, layer_norm_epsilon=1e-5,
        activation_function="gelu_new",
    ),
    "starcoder2": dict(
        COMMON,
        architectures=["Starcoder2ForCausalLM"],
        model_type="starcoder2",
        num_key_value_heads=2,
        norm_epsilon=1e-5, use_bias=True, hidden_act="gelu_pytorch_tanh",
        rope_theta=10000.0, tie_word_embeddings=True,
        sliding_window=None,
    ),
    "phi": dict(
        COMMON,
        architectures=["PhiForCausalLM"],
        model_type="phi",
        num_key_value_heads=4,
        layer_norm_eps=1e-5, partial_rotary_factor=0.5,
        hidden_act="gelu_new", rope_theta=10000.0,
        tie_word_embeddings=False, qk_layernorm=False,
    ),
    "phi3": dict(
        COMMON,
        architectures=["Phi3ForCausalLM"],
        model_type="phi3",
        num_key_value_heads=2,
        pad_token_id=0,
        rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        tie_word_embeddings=False, sliding_window=None,
    ),
    "stablelm": dict(
        COMMON,
        architectures=["StableLmForCausalLM"],
        model_type="stablelm",
        num_key_value_heads=2,
        layer_norm_eps=1e-5, partial_rotary_factor=0.25,
        hidden_act="silu", rope_theta=10000.0,
        use_qkv_bias=False, qk_layernorm=False,
        tie_word_embeddings=False,
    ),
    "olmo2": dict(
        COMMON,
        architectures=["Olmo2ForCausalLM"],
        model_type="olmo2",
        num_key_value_heads=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        tie_word_embeddings=False,
    ),
    "olmo": dict(
        COMMON,
        architectures=["OlmoForCausalLM"],
        model_type="olmo",
        num_key_value_heads=4,
        hidden_act="silu", rope_theta=10000.0, clip_qkv=8.0,
        tie_word_embeddings=False,
    ),
    "cohere": dict(
        COMMON,
        architectures=["CohereForCausalLM"],
        model_type="cohere",
        num_key_value_heads=2,
        layer_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        logit_scale=0.25, tie_word_embeddings=True, use_qk_norm=False,
    ),
    "cohere2": dict(
        COMMON,
        architectures=["Cohere2ForCausalLM"],
        model_type="cohere2",
        num_key_value_heads=2,
        layer_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        logit_scale=0.25, tie_word_embeddings=True,
        # prompt len 11 > window 4: exercises the sliding mask; layer 0
        # sliding+rope, layer 1 global+NoPE (Command R7B hybrid layout)
        sliding_window=4,
        layer_types=["sliding_attention", "full_attention"],
    ),
    "granite": dict(
        COMMON,
        architectures=["GraniteForCausalLM"],
        model_type="granite",
        num_key_value_heads=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.2, logits_scaling=4.0,
        tie_word_embeddings=False,
    ),
    "glm4": dict(
        COMMON,
        architectures=["Glm4ForCausalLM"],
        model_type="glm4",
        num_key_value_heads=2,
        pad_token_id=0, eos_token_id=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        partial_rotary_factor=0.5, attention_bias=True,
        head_dim=16, tie_word_embeddings=False,
    ),
    "glm": dict(
        COMMON,
        architectures=["GlmForCausalLM"],
        model_type="glm",
        num_key_value_heads=2,
        pad_token_id=0, eos_token_id=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        partial_rotary_factor=0.5, attention_bias=True,
        head_dim=16, tie_word_embeddings=False,
    ),
}

CFG_CLS = {
    "gpt2": "GPT2Config",
    "starcoder2": "Starcoder2Config",
    "phi": "PhiConfig",
    "phi3": "Phi3Config",
    "stablelm": "StableLmConfig",
    "olmo2": "Olmo2Config",
    "olmo": "OlmoConfig",
    "cohere": "CohereConfig",
    "cohere2": "Cohere2Config",
    "granite": "GraniteConfig",
    "glm4": "Glm4Config",
    "glm": "GlmConfig",
}


def _hf_model(hf_dict, seed=0):
    import torch
    import transformers
    from transformers import AutoModelForCausalLM

    cfg_cls = getattr(transformers, CFG_CLS[hf_dict["model_type"]])
    config = cfg_cls(**{k: v for k, v in hf_dict.items()
                        if k != "architectures"})
    config._attn_implementation = "eager"
    torch.manual_seed(seed)
    return AutoModelForCausalLM.from_config(config).eval()


@pytest.mark.parametrize("name", sorted(ZOO), ids=sorted(ZOO))
def test_zoo_prefill_logits_match_hf(name):
    hf_dict = ZOO[name]
    hf_model = _hf_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("name", ["gpt2", "phi", "olmo2", "cohere", "glm4"],
                         ids=["gpt2", "phi", "olmo2", "cohere", "glm4"])
def test_zoo_greedy_decode_matches_hf(name):
    hf_dict = ZOO[name]
    hf_model = _hf_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.generate_greedy(PROMPT, 12)
    ref = hf_greedy_generate(hf_model, PROMPT, 12)
    assert ours == ref


TINY_OLMOE = dict(
    COMMON,
    architectures=["OlmoeForCausalLM"],
    model_type="olmoe",
    num_key_value_heads=2,
    rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
    num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
    intermediate_size=48, tie_word_embeddings=False,
)


def test_olmoe_prefill_logits_match_hf():
    import torch
    import transformers
    from transformers import AutoModelForCausalLM

    config = transformers.OlmoeConfig(**{
        k: v for k, v in TINY_OLMOE.items() if k != "architectures"})
    config._attn_implementation = "eager"
    torch.manual_seed(0)
    hf_model = AutoModelForCausalLM.from_config(config).eval()
    runner, cfg, sa = make_runner(TINY_OLMOE)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_phi3_longrope_matches_hf():
    """Phi-3 LongRope scaling (short-factor path; per-dim rescale)."""
    hf_dict = dict(ZOO["phi3"])
    hf_dict["rope_scaling"] = {
        "type": "longrope",
        "short_factor": [1.0 + 0.05 * i for i in range(8)],
        "long_factor": [2.0] * 8,
    }
    hf_dict["original_max_position_embeddings"] = 512
    hf_model = _hf_model(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    ours = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


# ------------------------------------------------------- wave 3 (nested cfgs)

WAVE3 = {
    "gpt_bigcode": dict(
        architectures=["GPTBigCodeForCausalLM"],
        model_type="gpt_bigcode",
        n_layer=2, n_embd=64, n_head=4, n_positions=512, n_inner=None,
        vocab_size=256, layer_norm_epsilon=1e-5, multi_query=True,
        activation_function="gelu_pytorch_tanh",
    ),
    "smollm3": dict(
        COMMON,
        architectures=["SmolLM3ForCausalLM"],
        model_type="smollm3",
        num_key_value_heads=2, pad_token_id=0,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        no_rope_layer_interval=2,   # rope off on layer 1 (of 2)
        tie_word_embeddings=True,
    ),
    "exaone4": dict(
        COMMON,
        architectures=["Exaone4ForCausalLM"],
        model_type="exaone4",
        num_hidden_layers=4,
        num_key_value_heads=2, pad_token_id=0,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        sliding_window=8, sliding_window_pattern=4,
        tie_word_embeddings=False,
    ),
    "dbrx": dict(
        architectures=["DbrxForCausalLM"],
        model_type="dbrx",
        n_layers=2, d_model=64, n_heads=4, max_seq_len=512,
        vocab_size=256, pad_token_id=0, tie_word_embeddings=False,
        attn_config=dict(kv_n_heads=2, clip_qkv=8.0, rope_theta=10000.0),
        ffn_config=dict(ffn_hidden_size=48, moe_num_experts=4, moe_top_k=2),
    ),
}

W3_CFG = {
    "gpt_bigcode": "GPTBigCodeConfig",
    "smollm3": "SmolLM3Config",
    "exaone4": "Exaone4Config",
    "dbrx": "DbrxConfig",
}


def _hf_w3(hf_dict, seed=0):
    import torch
    import transformers
    from transformers import AutoModelForCausalLM

    cfg_cls = getattr(transformers, W3_CFG[hf_dict["model_type"]])
    config = cfg_cls(**{k: v for k, v in hf_dict.items()
                        if k != "architectures"})
    config._attn_implementation = "eager"
    torch.manual_seed(seed)
    return AutoModelForCausalLM.from_config(config).eval()


@pytest.mark.parametrize("name", sorted(WAVE3), ids=sorted(WAVE3))
def test_wave3_prefill_logits_match_hf(name):
    hf_dict = WAVE3[name]
    hf_model = _hf_w3(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("name", ["gpt_bigcode", "exaone4", "dbrx"],
                         ids=["gpt_bigcode", "exaone4", "dbrx"])
def test_wave3_greedy_decode_matches_hf(name):
    hf_dict = WAVE3[name]
    hf_model = _hf_w3(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.generate_greedy(PROMPT, 12)
    ref = hf_greedy_generate(hf_model, PROMPT, 12)
    assert ours == ref


# ----------------------------------------- wave 4 (mixed dense/MoE stacks)

WAVE4 = {
    # shared expert + sigmoid scalar gate; decoder_sparse_step=2 makes
    # layers 1,3 MoE and 0,2 dense — exercises the layer_map mixed stacks
    "qwen2_moe": dict(
        COMMON,
        architectures=["Qwen2MoeForCausalLM"],
        model_type="qwen2_moe",
        num_hidden_layers=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        moe_intermediate_size=32, shared_expert_intermediate_size=64,
        decoder_sparse_step=2, mlp_only_layers=[],
        tie_word_embeddings=False,
    ),
    # all-MoE variant (decoder_sparse_step=1): shared expert rides the
    # homogeneous "layers." stack inside the scan
    "qwen2_moe_dense_step1": dict(
        COMMON,
        architectures=["Qwen2MoeForCausalLM"],
        model_type="qwen2_moe",
        num_hidden_layers=2,
        num_key_value_heads=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        moe_intermediate_size=32, shared_expert_intermediate_size=64,
        decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False,
    ),
    # Llama-4 text: interleaved MoE (input-scaled sigmoid router + shared
    # expert), NoPE layer 3 with temperature-tuned q, chunked local
    # attention (C=4 < prompt len), post-rope qk l2 norm
    "llama4": dict(
        architectures=["Llama4ForCausalLM"],
        model_type="llama4_text",
        num_hidden_layers=4,
        hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16,
        intermediate_size=32, intermediate_size_mlp=128,
        vocab_size=256, max_position_embeddings=512,
        rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        num_local_experts=4, num_experts_per_tok=2,
        interleave_moe_layer_step=2,
        attention_chunk_size=4,
        attn_temperature_tuning=True, attn_scale=0.1, floor_scale=2.0,
        use_qk_norm=True, attention_bias=False,
        tie_word_embeddings=False, pad_token_id=0,
    ),
    # Phi-3.5-MoE: LayerNorm blocks, attention+lm_head bias, inference
    # sparsemixer top-2 router over mixtral-named experts
    "phimoe": dict(
        COMMON,
        architectures=["PhimoeForCausalLM"],
        model_type="phimoe",
        num_hidden_layers=2,
        num_key_value_heads=2,
        rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        num_local_experts=4, num_experts_per_tok=2,
        router_jitter_noise=0.01, input_jitter_noise=0.0,
        attention_bias=True, lm_head_bias=True,
        tie_word_embeddings=False, sliding_window=None,
    ),
    # HunYuan: post-rope per-head qk RMSNorm, renormalized softmax top-k
    # router, ungated shared_mlp expert
    "hunyuan_v1_moe": dict(
        COMMON,
        architectures=["HunYuanMoEV1ForCausalLM"],
        model_type="hunyuan_v1_moe",
        num_hidden_layers=2,
        num_key_value_heads=2, head_dim=16,
        rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        num_experts=4, moe_topk=2,
        use_mixed_mlp_moe=1, num_shared_expert=1, use_qk_norm=True,
        use_cla=False, attention_bias=False,
        tie_word_embeddings=False, pad_token_id=0,
    ),
    "hunyuan_v1_dense": dict(
        COMMON,
        architectures=["HunYuanDenseV1ForCausalLM"],
        model_type="hunyuan_v1_dense",
        num_hidden_layers=2,
        num_key_value_heads=2, head_dim=16,
        rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        use_qk_norm=True, use_cla=False, attention_bias=False,
        tie_word_embeddings=False, pad_token_id=0,
    ),
}

W4_CFG = {
    "qwen2_moe": "Qwen2MoeConfig",
    "llama4_text": "Llama4TextConfig",
    "phimoe": "PhimoeConfig",
    "hunyuan_v1_moe": "HunYuanMoEV1Config",
    "hunyuan_v1_dense": "HunYuanDenseV1Config",
}


def _hf_w4(hf_dict, seed=0):
    import torch
    import transformers
    from transformers import AutoModelForCausalLM

    cfg_cls = getattr(transformers, W4_CFG[hf_dict["model_type"]])
    config = cfg_cls(**{k: v for k, v in hf_dict.items()
                        if k != "architectures"})
    config._attn_implementation = "eager"
    torch.manual_seed(seed)
    return AutoModelForCausalLM.from_config(config).eval()


@pytest.mark.parametrize("name", sorted(WAVE4), ids=sorted(WAVE4))
def test_wave4_prefill_logits_match_hf(name):
    hf_dict = WAVE4[name]
    hf_model = _hf_w4(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize(
    "name", ["qwen2_moe", "llama4", "phimoe", "hunyuan_v1_moe"],
    ids=["qwen2_moe", "llama4", "phimoe", "hunyuan_v1_moe"])
def test_wave4_greedy_decode_matches_hf(name):
    hf_dict = WAVE4[name]
    hf_model = _hf_w4(hf_dict)
    runner, cfg, sa = make_runner(hf_dict)
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.generate_greedy(PROMPT, 12)
    ref = hf_greedy_generate(hf_model, PROMPT, 12)
    assert ours == ref


def test_deepseek_v1_mixed_stack_smoke():
    """DeepSeek-V1 (remote-code arch, no HF class in the image):
    first_k_dense_replace mixed stack builds, loads dummy weights and
    prefills without NaNs."""
    hf_dict = dict(
        COMMON,
        architectures=["DeepseekForCausalLM"],
        model_type="deepseek",
        num_hidden_layers=4,
        num_key_value_heads=2,
        rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
        n_routed_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        moe_intermediate_size=32, n_shared_experts=2,
        first_k_dense_replace=1, moe_layer_freq=1,
        tie_word_embeddings=False,
    )
    runner, cfg, sa = make_runner(hf_dict)
    assert cfg.moe_layer_mask == [False, True, True, True]
    assert cfg.shared_expert_size == 64
    driver = RawDriver(runner, sa.page_size)
    logits = driver.prefill_logits(PROMPT)
    assert np.isfinite(logits).all()
