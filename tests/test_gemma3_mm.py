"""Gemma3 multimodal golden gate: our SigLIP tower + pooled projector vs
HF Gemma3ForConditionalGeneration.get_image_features with identical
weights (reference pattern: srt/models/gemma3_mm.py + siglip.py)."""

import numpy as np
import pytest

from tests.utils import RawDriver, load_hf_weights_into, make_runner

IMG_TOK = 290


def tiny_gemma3_cfg():
    from transformers import Gemma3Config

    return Gemma3Config(
        text_config=dict(
            model_type="gemma3_text",
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=128, vocab_size=300,
            head_dim=16, rms_norm_eps=1e-6, rope_theta=10000.0,
            query_pre_attn_scalar=16, sliding_window=8,
            sliding_window_pattern=2, rope_local_base_freq=10000.0,
            max_position_embeddings=512, attention_bias=False,
            attn_logit_softcapping=None, final_logit_softcapping=None,
            tie_word_embeddings=True),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14,
            layer_norm_eps=1e-6),
        mm_tokens_per_image=1,   # grid 2x2 pooled 2x2 -> 1 token
        image_token_index=IMG_TOK, boi_token_index=288,
        eoi_token_index=289,
    )


@pytest.fixture(scope="module")
def gemma3_pair():
    import torch
    from transformers import Gemma3ForConditionalGeneration

    cfg = tiny_gemma3_cfg()
    torch.manual_seed(0)
    hf = Gemma3ForConditionalGeneration(cfg).eval()
    runner, mc, sa = make_runner(cfg.to_dict())
    load_hf_weights_into(runner, hf)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 28, 28)
    return hf, runner, sa, pixel


def test_gemma3_image_features_match_hf(gemma3_pair):
    import torch

    hf, runner, sa, pixel = gemma3_pair
    ours = runner.encode_images(pixel.numpy())          # [1, 1, H]
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=pixel)
    ref = np.asarray(ref).reshape(1, 1, -1)
    np.testing.assert_allclose(np.asarray(ours, np.float32), ref,
                               rtol=2e-3, atol=5e-3)


def test_gemma3_mm_prefill_logits_match_hf(gemma3_pair):
    """Text rows AFTER an image span must match HF when the bidirectional
    image mask is inert (single image token => bidirectional == causal)."""
    import torch

    hf, runner, sa, pixel = gemma3_pair
    prompt = [3, 17, IMG_TOK, 94, 201, 5, 77]
    driver = RawDriver(runner, sa.page_size)
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(prompt)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(prompt, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = runner.encode_images(pixel.numpy())[0]    # [1, H]
    hb.mm_positions = np.asarray([2], np.int32)
    ours = runner.forward_all_logits(hb)
    with torch.no_grad():
        out = hf(input_ids=torch.tensor([prompt]),
                 pixel_values=pixel)
    ref = out.logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_engine_gemma3_mm_serving():
    """End-to-end: image through Engine -> deterministic tokens + mm cache
    reuse on the second request."""
    import base64
    import io

    from PIL import Image

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (40, 52, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()

    hf = tiny_gemma3_cfg().to_dict()
    hf["vision_config"]["image_size"] = 28   # serving bucket
    sa = ServerArgs(model_path="dummy://g3mm", load_format="dummy",
                    dtype="float32", page_size=4, max_total_tokens=512,
                    device="cpu", max_running_requests=8,
                    max_prefill_tokens=128, chunked_prefill_size=32,
                    skip_tokenizer_init=True, random_seed=0)
    eng = Engine(sa, hf_config_override=hf)
    prompt = [3, 17, IMG_TOK, 94, 201]
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    o1 = eng.generate(input_ids=[prompt], sampling_params=sp,
                      image_data=[b64])
    o2 = eng.generate(input_ids=[prompt], sampling_params=sp,
                      image_data=[b64])
    assert o1[0]["output_ids"] == o2[0]["output_ids"]
    assert o2[0]["meta_info"]["cached_tokens"] > 0
    eng.shutdown()
