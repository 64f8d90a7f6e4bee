"""Llama/Qwen2 structural clones without HF classes in the image
(InternLM2, Baichuan, XVERSE, MiMo, Qwen-1, EXAONE-3, MiniCPM).

Test scheme: these archs are semantically identical to a tested oracle
(HF Llama / Qwen2) modulo checkpoint key naming and weight fusion layout.
We build the oracle HF model, repack its state dict into the variant's
checkpoint format (fusing/interleaving exactly the way the real
checkpoints store it), load that through our variant config, and require
logit parity with the oracle — this validates the key tables and fusion
slicing end to end (analog of sglang's per-model HF-parity runners)."""

import numpy as np
import pytest
import torch

from tests.utils import (
    RawDriver,
    hf_forward_logits,
    load_hf_weights_into,
    make_runner,
)

PROMPT = [3, 17, 94, 201, 5, 77, 150, 42, 9, 133, 61]

GEOM = dict(num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
            intermediate_size=128, vocab_size=256,
            max_position_embeddings=512)


def _llama_oracle(kv_heads, bias=False, seed=0):
    import transformers
    from transformers import AutoModelForCausalLM

    cfg = transformers.LlamaConfig(
        **GEOM, num_key_value_heads=kv_heads, rms_norm_eps=1e-6,
        hidden_act="silu", rope_theta=10000.0, attention_bias=bias,
        tie_word_embeddings=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    return AutoModelForCausalLM.from_config(cfg).eval()


def _qwen2_oracle(kv_heads, seed=0):
    import transformers
    from transformers import AutoModelForCausalLM

    cfg = transformers.Qwen2Config(
        **GEOM, num_key_value_heads=kv_heads, rms_norm_eps=1e-6,
        hidden_act="silu", rope_theta=10000.0, tie_word_embeddings=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(seed)
    return AutoModelForCausalLM.from_config(cfg).eval()


def _load_repacked(runner, sd):
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, sd)


def _check(hf_dict, oracle, sd):
    runner, cfg, sa = make_runner(hf_dict)
    _load_repacked(runner, sd)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(oracle, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_xverse_llama_key_parity():
    oracle = _llama_oracle(kv_heads=2)
    hf_dict = dict(GEOM, architectures=["XverseForCausalLM"],
                   model_type="xverse", num_key_value_heads=2,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   tie_word_embeddings=False)
    _check(hf_dict, oracle, dict(oracle.state_dict()))


def test_mimo_qwen2_key_parity():
    oracle = _qwen2_oracle(kv_heads=2)
    hf_dict = dict(GEOM, architectures=["MiMoForCausalLM"],
                   model_type="mimo", num_key_value_heads=2,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   tie_word_embeddings=False)
    _check(hf_dict, oracle, dict(oracle.state_dict()))


def test_exaone3_repacked_matches_llama():
    oracle = _llama_oracle(kv_heads=2)
    sd = {}
    for k, v in oracle.state_dict().items():
        k = (k.replace("model.embed_tokens.", "transformer.wte.")
             .replace("model.norm.", "transformer.ln_f.")
             .replace("model.layers.", "transformer.h.")
             .replace("self_attn.q_proj", "attn.attention.q_proj")
             .replace("self_attn.k_proj", "attn.attention.k_proj")
             .replace("self_attn.v_proj", "attn.attention.v_proj")
             .replace("self_attn.o_proj", "attn.attention.out_proj")
             .replace("mlp.gate_proj", "mlp.c_fc_0")
             .replace("mlp.up_proj", "mlp.c_fc_1")
             .replace("mlp.down_proj", "mlp.c_proj")
             .replace("input_layernorm", "ln_1")
             .replace("post_attention_layernorm", "ln_2"))
        sd[k] = v
    hf_dict = dict(architectures=["ExaoneForCausalLM"], model_type="exaone",
                   num_layers=2, hidden_size=64, num_attention_heads=4,
                   num_key_value_heads=2, intermediate_size=128,
                   vocab_size=256, max_position_embeddings=512,
                   layer_norm_epsilon=1e-6, activation_function="silu",
                   rope_theta=10000.0, tie_word_embeddings=False)
    _check(hf_dict, oracle, sd)


def test_internlm2_interleaved_wqkv_matches_llama():
    oracle = _llama_oracle(kv_heads=2)
    Nq, Nk, D = 4, 2, 16
    g = Nq // Nk
    sd, per_layer = {}, {}
    for k, v in oracle.state_dict().items():
        if "self_attn." in k and "_proj.weight" in k:
            per_layer.setdefault(k.split(".self_attn.")[0], {})[
                k.split("self_attn.")[1].split("_proj")[0]] = v
            if not k.endswith("o_proj.weight"):
                continue
        k2 = (k.replace("model.embed_tokens.", "model.tok_embeddings.")
              .replace("self_attn.o_proj", "attention.wo")
              .replace("mlp.gate_proj", "feed_forward.w1")
              .replace("mlp.up_proj", "feed_forward.w3")
              .replace("mlp.down_proj", "feed_forward.w2")
              .replace("input_layernorm", "attention_norm")
              .replace("post_attention_layernorm", "ffn_norm")
              .replace("lm_head.", "output."))
        sd[k2] = v
    for pre, qkv in per_layer.items():
        H = qkv["q"].shape[1]
        q = qkv["q"].reshape(Nk, g, D, H)
        kk = qkv["k"].reshape(Nk, 1, D, H)
        vv = qkv["v"].reshape(Nk, 1, D, H)
        sd[pre + ".attention.wqkv.weight"] = torch.cat(
            [q, kk, vv], dim=1).reshape(-1, H)
    hf_dict = dict(GEOM, architectures=["InternLM2ForCausalLM"],
                   model_type="internlm2", num_key_value_heads=2,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   tie_word_embeddings=False)
    _check(hf_dict, oracle, sd)


def test_baichuan_wpack_matches_llama():
    oracle = _llama_oracle(kv_heads=4)    # Baichuan is MHA
    sd, per_layer = {}, {}
    for k, v in oracle.state_dict().items():
        if "self_attn." in k and not k.endswith("o_proj.weight"):
            per_layer.setdefault(k.split(".self_attn.")[0], {})[
                k.split("self_attn.")[1].split("_proj")[0]] = v
            continue
        sd[k] = v
    for pre, qkv in per_layer.items():
        sd[pre + ".self_attn.W_pack.weight"] = torch.cat(
            [qkv["q"], qkv["k"], qkv["v"]], dim=0)
    hf_dict = dict(GEOM, architectures=["BaichuanForCausalLM"],
                   model_type="baichuan", num_key_value_heads=4,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   tie_word_embeddings=False)
    _check(hf_dict, oracle, sd)


def test_qwen1_repacked_matches_qwen2():
    oracle = _qwen2_oracle(kv_heads=4)    # Qwen-1 is MHA with qkv bias
    sd, per_layer = {}, {}
    for k, v in oracle.state_dict().items():
        if "self_attn." in k and "o_proj" not in k:
            pre = k.split(".self_attn.")[0]
            name = k.split("self_attn.")[1]   # e.g. q_proj.weight
            per_layer.setdefault(pre, {})[name] = v
            continue
        k2 = (k.replace("model.embed_tokens.", "transformer.wte.")
              .replace("model.norm.", "transformer.ln_f.")
              .replace("model.layers.", "transformer.h.")
              .replace("self_attn.o_proj", "attn.c_proj")
              .replace("mlp.gate_proj", "mlp.w2")
              .replace("mlp.up_proj", "mlp.w1")
              .replace("mlp.down_proj", "mlp.c_proj")
              .replace("input_layernorm", "ln_1")
              .replace("post_attention_layernorm", "ln_2"))
        sd[k2] = v
    for pre, qkv in per_layer.items():
        pre2 = pre.replace("model.layers.", "transformer.h.")
        sd[pre2 + ".attn.c_attn.weight"] = torch.cat(
            [qkv["q_proj.weight"], qkv["k_proj.weight"],
             qkv["v_proj.weight"]], dim=0)
        sd[pre2 + ".attn.c_attn.bias"] = torch.cat(
            [qkv["q_proj.bias"], qkv["k_proj.bias"],
             qkv["v_proj.bias"]], dim=0)
    hf_dict = dict(architectures=["QWenLMHeadModel"], model_type="qwen",
                   num_hidden_layers=2, hidden_size=64,
                   num_attention_heads=4,
                   intermediate_size=256,   # checkpoint value = 2x real
                   vocab_size=256, seq_length=512,
                   layer_norm_epsilon=1e-6, rotary_emb_base=10000.0,
                   tie_word_embeddings=False)
    _check(hf_dict, oracle, sd)


def test_minicpm_mup_scaling_config():
    """MiniCPM muP scaling maps onto the Granite-tested mechanisms."""
    from iaas_sglang_tpu.configs.model_config import ModelConfig

    hf_dict = dict(GEOM, architectures=["MiniCPMForCausalLM"],
                   model_type="minicpm", num_key_value_heads=2,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   scale_emb=12.0, scale_depth=1.4, dim_model_base=32,
                   tie_word_embeddings=False)
    cfg = ModelConfig.from_hf(hf_dict, model_path="test://tiny",
                              dtype="float32")
    assert cfg.embed_multiplier == 12.0
    assert abs(cfg.residual_multiplier - 1.4 / np.sqrt(2)) < 1e-9
    assert abs(cfg.logits_scale - 32 / 64) < 1e-9
    runner, cfg, sa = make_runner(hf_dict)
    logits = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)
    assert np.isfinite(logits).all()


def test_internlm2_reward_head():
    """v_head reward scoring through the pooled-output path."""
    oracle = _llama_oracle(kv_heads=2)
    hf_dict = dict(GEOM, architectures=["InternLM2ForRewardModel"],
                   model_type="internlm2", num_key_value_heads=2,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   tie_word_embeddings=False)
    runner, cfg, sa = make_runner(hf_dict)
    assert cfg.num_labels == 1
    specs = runner.model.weight_specs()
    assert specs["score"].hf_key == "v_head.weight"
    assert "lm_head" not in specs


def test_baichuan_13b_alibi_rejected():
    from iaas_sglang_tpu.configs.model_config import ModelConfig

    hf_dict = dict(architectures=["BaichuanForCausalLM"],
                   model_type="baichuan", num_hidden_layers=2,
                   hidden_size=5120, num_attention_heads=40,
                   intermediate_size=128, vocab_size=256)
    with pytest.raises(ValueError, match="ALIBI"):
        ModelConfig.from_hf(hf_dict, model_path="test://tiny")


def test_chatglm_repacked_matches_glm():
    """ChatGLM maps onto the HF Glm semantics (qkv bias, half-dim
    interleaved rotary, fused swiglu) with transformer.encoder.* naming."""
    import transformers
    from transformers import AutoModelForCausalLM

    cfg = transformers.GlmConfig(
        num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512, head_dim=16,
        rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
        partial_rotary_factor=0.5, attention_bias=True,
        pad_token_id=0, eos_token_id=2, tie_word_embeddings=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    oracle = AutoModelForCausalLM.from_config(cfg).eval()

    sd, per_layer = {}, {}
    for k, v in oracle.state_dict().items():
        if "self_attn." in k and "o_proj" not in k:
            pre = k.split(".self_attn.")[0]
            per_layer.setdefault(pre, {})[k.split("self_attn.")[1]] = v
            continue
        k2 = (k.replace("model.embed_tokens.",
                        "transformer.embedding.word_embeddings.")
              .replace("model.norm.", "transformer.encoder.final_layernorm.")
              .replace("model.layers.", "transformer.encoder.layers.")
              .replace("self_attn.o_proj", "self_attention.dense")
              .replace("mlp.gate_up_proj", "mlp.dense_h_to_4h")
              .replace("mlp.down_proj", "mlp.dense_4h_to_h")
              .replace("lm_head.", "transformer.output_layer."))
        sd[k2] = v
    for pre, qkv in per_layer.items():
        pre2 = pre.replace("model.layers.", "transformer.encoder.layers.")
        sd[pre2 + ".self_attention.query_key_value.weight"] = torch.cat(
            [qkv["q_proj.weight"], qkv["k_proj.weight"],
             qkv["v_proj.weight"]], dim=0)
        sd[pre2 + ".self_attention.query_key_value.bias"] = torch.cat(
            [qkv["q_proj.bias"], qkv["k_proj.bias"],
             qkv["v_proj.bias"]], dim=0)
    hf_dict = dict(
        architectures=["ChatGLMModel"], model_type="chatglm",
        num_layers=2, hidden_size=64, num_attention_heads=4,
        multi_query_attention=True, multi_query_group_num=2,
        kv_channels=16, ffn_hidden_size=128, padded_vocab_size=256,
        layernorm_epsilon=1e-5, rmsnorm=True, add_qkv_bias=True,
        add_bias_linear=False, rope_ratio=1.0, seq_length=512,
        apply_residual_connection_post_layernorm=False)
    _check(hf_dict, oracle, sd)


def test_grok_router_softcap_math():
    """Grok router: weights are the FULL softmax probs (over tanh-capped
    logits) gathered at the top-k — no renormalization (reference
    srt/layers/moe/router.py fused_moe_router_kernel)."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.moe import route_topk

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((5, 8)).astype(np.float32) * 50
    cap = 30.0
    capped = cap * np.tanh(logits / cap)
    w, ids = route_topk(jnp.asarray(capped), 2, renormalize=False)
    p = np.exp(capped - capped.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    order = np.argsort(-capped, axis=-1)[:, :2]
    np.testing.assert_array_equal(np.asarray(ids), order)
    np.testing.assert_allclose(
        np.asarray(w), np.take_along_axis(p, order, axis=-1), rtol=1e-5)


def test_grok_smoke_prefill():
    """Grok-1 tiny config builds (sandwich norms, mixtral keys, gelu
    experts, softcapped router) and prefills finitely with dummy weights."""
    hf_dict = dict(
        architectures=["Grok1ForCausalLM"], model_type="grok-1",
        num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, max_position_embeddings=512,
        rms_norm_eps=1e-5, rope_theta=10000.0,
        num_local_experts=4, num_experts_per_tok=2,
        attn_logit_softcapping=30.0, router_logit_softcapping=30.0,
        embedding_multiplier_scale=8.0, output_multiplier_scale=0.5,
        tie_word_embeddings=True)
    runner, cfg, sa = make_runner(hf_dict)
    assert cfg.sandwich_norms and cfg.moe_gating == "softcap"
    assert cfg.hidden_act == "gelu" and cfg.embed_multiplier == 8.0
    specs = runner.model.weight_specs()
    assert specs["layers.w_router"].hf_key == \
        "model.layers.{l}.block_sparse_moe.gate.weight"
    assert specs["layers.input_norm"].hf_key == \
        "model.layers.{l}.pre_attn_norm.weight"
    assert specs["layers.post_norm"].hf_key == \
        "model.layers.{l}.pre_moe_norm.weight"
    assert specs["layers.post_attn_norm"].hf_key == \
        "model.layers.{l}.post_attn_norm.weight"
    logits = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)
    assert np.isfinite(logits).all()


def test_xverse_moe_smoke_prefill():
    """XVERSE-MoE: softmax top-k over per-expert MLPs at the dense width
    plus ungated shared experts (num_shared_experts * intermediate)."""
    hf_dict = dict(
        architectures=["XverseMoeForCausalLM"], model_type="xverse",
        num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=32, vocab_size=256,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        hidden_act="silu", rope_theta=10000.0,
        num_experts=4, moe_top_k=2, num_shared_experts=2,
        tie_word_embeddings=False)
    runner, cfg, sa = make_runner(hf_dict)
    assert cfg.model_type == "xverse_moe"
    assert cfg.shared_expert_size == 64 and cfg.moe_intermediate_size == 32
    specs = runner.model.weight_specs()
    assert specs["layers.w_router"].hf_key == \
        "model.layers.{l}.mlp.router.weight"
    assert specs["layers.ws_gate"].hf_key == \
        "model.layers.{l}.mlp.shared_experts.gate_proj.weight"
    logits = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)
    assert np.isfinite(logits).all()


def test_minicpm3_mla_smoke():
    """MiniCPM3: deepseek-v2 MLA keys + muP scaling + neox rope on the
    rope channels (reference models/minicpm3.py uses plain get_rope)."""
    hf_dict = dict(
        architectures=["MiniCPM3ForCausalLM"], model_type="minicpm3",
        num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, intermediate_size=96, vocab_size=256,
        max_position_embeddings=512, rms_norm_eps=1e-6, rope_theta=10000.0,
        q_lora_rank=32, kv_lora_rank=16, qk_nope_head_dim=16,
        qk_rope_head_dim=8, v_head_dim=16,
        scale_emb=12.0, scale_depth=1.4, dim_model_base=32,
        hidden_act="silu", tie_word_embeddings=False)
    runner, cfg, sa = make_runner(hf_dict)
    assert cfg.is_mla and not cfg.rope_interleaved
    assert cfg.embed_multiplier == 12.0
    assert abs(cfg.logits_scale - 0.5) < 1e-9
    driver = RawDriver(runner, sa.page_size)
    logits = driver.prefill_logits(PROMPT)
    assert np.isfinite(logits).all()
    a = driver.generate_greedy(PROMPT, 8)
    # decode path determinism (prefill+decode consistency)
    b = driver.generate_greedy(PROMPT, 8)
    assert a == b


def test_registry_resolves_alias_archs():
    """Every reference-registered architecture alias resolves (SURVEY §2.11
    coverage: classification aliases, embedding models, draft models,
    torch-native demos, generic fallback)."""
    from iaas_sglang_tpu.models.registry import _REGISTRY

    for arch in [
        "Cohere2ForCausalLM", "InternLM3ForCausalLM",
        "QuantMixtralForCausalLM", "LlamaEmbeddingModel", "MistralModel",
        "LlamaForClassification",
        "LlamaForSequenceClassificationWithNormal_Weights",
        "TorchNativeLlamaForCausalLM", "TorchNativePhi3ForCausalLM",
        "LlamaForCausalLMEagle", "LlamaForCausalLMEagle3",
        "Qwen2ForCausalLMEagle", "MiMoMTP", "DeepseekV3ForCausalLMNextN",
        "TransformersForCausalLM", "Contriever",
        "BertForSequenceClassification",
        "XLMRobertaForSequenceClassification",
        "LlavaMistralForCausalLM", "LlavaQwenForCausalLM",
    ]:
        assert arch in _REGISTRY, arch


def test_llama_for_classification_head_key():
    """LlamaForClassification stores its head as classification_head.weight
    (reference models/llama_classification.py:43)."""
    import torch

    oracle = _llama_oracle(kv_heads=2)
    sd = {k: v for k, v in oracle.state_dict().items()
          if k != "lm_head.weight"}
    torch.manual_seed(7)
    sd["classification_head.weight"] = torch.randn(3, 64)
    hf_dict = dict(GEOM, architectures=["LlamaForClassification"],
                   model_type="llama", num_key_value_heads=2,
                   rms_norm_eps=1e-6, hidden_act="silu", rope_theta=10000.0,
                   tie_word_embeddings=True, num_labels=3)
    runner, cfg, sa = make_runner(hf_dict)
    _load_repacked(runner, sd)

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    driver = RawDriver(runner, sa.page_size)
    ids = PROMPT[:5]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]

    import torch as _t
    with _t.no_grad():
        hs = oracle.model(_t.tensor([ids])).last_hidden_state[0, -1]
        ref = (hs @ sd["classification_head.weight"].T).float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)
