"""Mistral-3 / Pixtral golden gate vs HF Mistral3ForConditionalGeneration
(tower 2D rope + RMSNorm blocks + patch merger + projector share weights
with the HF oracle; reference srt/models/pixtral.py + mistral.py)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, load_hf_weights_into, make_runner

IMG_TOK = 10

TEXT = dict(model_type="mistral", hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=512,
            tie_word_embeddings=False)

VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, head_dim=8, image_size=64,
              patch_size=16, rope_theta=10000.0,
              serving_image_size=64)   # grid 4x4 -> merger 2x2 -> 4 rows

M3_CFG = dict(
    architectures=["Mistral3ForConditionalGeneration"], model_type="mistral3",
    text_config=TEXT, vision_config=VISION,
    spatial_merge_size=2, image_token_index=IMG_TOK,
    multimodal_projector_bias=False, vision_feature_layer=-1,
)


@pytest.fixture(scope="module")
def m3_pair():
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration

    cfg = Mistral3Config(
        text_config=TEXT,
        vision_config={k: v for k, v in VISION.items()
                       if k != "serving_image_size"},
        spatial_merge_size=2, image_token_index=IMG_TOK,
        multimodal_projector_bias=False, vision_feature_layer=-1)
    torch.manual_seed(0)
    hf = Mistral3ForConditionalGeneration(cfg).eval()
    runner, mc, sa = make_runner(M3_CFG)
    load_hf_weights_into(runner, hf)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 64, 64)
    return hf, runner, sa, pixel


def test_mistral3_image_features_match_hf(m3_pair):
    hf, runner, sa, pixel = m3_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=pixel,
                                    image_sizes=torch.tensor([[64, 64]]))
    if isinstance(ref, (list, tuple)):
        ref = ref[0]
    ref = ref.float().numpy().reshape(1, -1, 64)
    assert ours.shape == ref.shape == (1, 4, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_mistral3_prefill_logits_match_hf(m3_pair):
    hf, runner, sa, pixel = m3_pair
    prompt = [3, IMG_TOK, IMG_TOK, IMG_TOK, IMG_TOK, 94, 201, 5]
    driver = RawDriver(runner, sa.page_size)
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(prompt)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(prompt, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = np.asarray(runner.encode_images(pixel.numpy()))[0]
    hb.mm_positions = np.arange(1, 5, dtype=np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        out = hf(input_ids=torch.tensor([prompt]), pixel_values=pixel,
                 image_sizes=torch.tensor([[64, 64]]))
    ref = out.logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_mistral3_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://m3", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=M3_CFG)
    img = np.zeros((64, 64, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8]],
        image_data=[img],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4


def test_pixtral_standalone_registry():
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.models.registry import resolve_model_cls

    mc = ModelConfig.from_hf(dict(
        model_type="pixtral", architectures=["PixtralVisionModel"],
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        head_dim=8, intermediate_size=64, image_size=64, patch_size=16))
    model = resolve_model_cls(mc)(mc)
    assert model.vc.num_patches == 16
