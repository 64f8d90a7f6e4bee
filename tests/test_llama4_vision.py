"""Llama-4 vision golden gate vs HF Llama4VisionModel: unfold-linear patch
embed, trailing CLS, 2D rope with zeroed CLS angles, biased blocks,
pixel-shuffle adapter (double gelu) and the bias-less projector
(reference srt/models/mllama4.py)."""

import numpy as np
import pytest
import torch

from tests.utils import make_runner

IMG_TOK = 250

TEXT = dict(
    model_type="llama4_text", num_hidden_layers=4,
    hidden_size=64, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, intermediate_size=32, intermediate_size_mlp=128,
    vocab_size=256, max_position_embeddings=512,
    rms_norm_eps=1e-5, hidden_act="silu", rope_theta=10000.0,
    num_local_experts=4, num_experts_per_tok=2,
    interleave_moe_layer_step=2, attention_chunk_size=4,
    attn_temperature_tuning=True, attn_scale=0.1, floor_scale=2.0,
    use_qk_norm=True, attention_bias=False,
    tie_word_embeddings=False, pad_token_id=0,
)

# shuffled channels = hidden/(r^2) must equal intermediate_size (HF
# Llama4VisionMLP2 reuses it as fc1's input dim)
VISION = dict(hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
              intermediate_size=128, image_size=56, patch_size=14,
              pixel_shuffle_ratio=0.5, projector_input_dim=64,
              projector_output_dim=64, vision_output_dim=64,
              norm_eps=1e-5, rope_theta=10000)

L4_CFG = dict(
    architectures=["Llama4ForConditionalGeneration"], model_type="llama4",
    text_config=TEXT, vision_config=VISION, image_token_index=IMG_TOK,
)


@pytest.fixture(scope="module")
def l4_pair():
    from transformers import (Llama4ForCausalLM, Llama4TextConfig,
                              Llama4VisionConfig, Llama4VisionModel)

    vcfg = Llama4VisionConfig(**VISION)
    vcfg._attn_implementation = "eager"
    torch.manual_seed(0)
    vt = Llama4VisionModel(vcfg).eval()
    tcfg = Llama4TextConfig(
        **{k: v for k, v in TEXT.items() if k != "model_type"})
    tcfg._attn_implementation = "eager"
    lm = Llama4ForCausalLM(tcfg).eval()
    mmp = torch.nn.Linear(64, 64, bias=False)
    torch.nn.init.normal_(mmp.weight, std=0.1)

    sd = {f"vision_model.{k}": v for k, v in vt.state_dict().items()}
    sd.update({f"language_model.{k}": v for k, v in lm.state_dict().items()})
    sd["multi_modal_projector.linear_1.weight"] = mmp.weight
    runner, mc, sa = make_runner(L4_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    torch.manual_seed(7)
    pixel = torch.randn(2, 3, 56, 56)
    return vt, mmp, lm, runner, sa, pixel


def test_llama4_image_features_match_hf(l4_pair):
    vt, mmp, lm, runner, sa, pixel = l4_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    with torch.no_grad():
        feats = vt(pixel).last_hidden_state       # [2, 4, 64]
        ref = mmp(feats.reshape(-1, 64)).reshape(2, 4, 64).float().numpy()
    assert ours.shape == ref.shape == (2, 4, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_llama4_prefill_logits_match_hf(l4_pair):
    vt, mmp, lm, runner, sa, pixel = l4_pair
    from tests.utils import RawDriver

    with torch.no_grad():
        img_rows = mmp(vt(pixel[:1]).last_hidden_state[0])   # [4, H]
    prompt = [3, 17, 0, 0, 0, 0, 94, 201, 5]
    driver = RawDriver(runner, sa.page_size)
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(prompt)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(prompt, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = img_rows.detach().numpy()
    hb.mm_positions = np.asarray([2, 3, 4, 5], np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        emb = lm.get_input_embeddings()(torch.tensor([prompt]))
        emb[0, 2:6] = img_rows
        ref = lm(inputs_embeds=emb).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_llama4_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://l4", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=L4_CFG)
    img = np.zeros((64, 48, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8], [9, 10, 11]],
        image_data=[img, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + 4
