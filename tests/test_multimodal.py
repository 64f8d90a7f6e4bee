"""VLM golden gate: our JAX LLaVA (CLIP tower + projector + embedding
scatter) vs HF transformers with identical weights (the multimodal analog
of test_golden_model.py; reference test pattern: HFRunner/SRTRunner)."""

import numpy as np
import pytest

from tests.utils import RawDriver, load_hf_weights_into, make_runner


def tiny_llava_cfg():
    from transformers import CLIPVisionConfig, LlamaConfig, LlavaConfig

    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        projection_dim=32)
    tc = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512)
    return LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=255,
        vision_feature_layer=-2, vision_feature_select_strategy="default")


def build_hf_llava(seed: int = 0):
    import torch
    from transformers import LlavaForConditionalGeneration

    torch.manual_seed(seed)
    return LlavaForConditionalGeneration(tiny_llava_cfg()).eval()


IMG = 255  # image_token_index
N_IMG_TOKENS = 4  # (28/14)^2
PROMPT = [3, 17, IMG, IMG, IMG, IMG, 94, 201, 5, 77]
IMG_OFFSET = 2


@pytest.fixture(scope="module")
def llava_pair():
    import torch

    hf = build_hf_llava()
    runner, cfg, sa = make_runner(tiny_llava_cfg().to_dict())
    load_hf_weights_into(runner, hf)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 28, 28)
    return hf, runner, sa, pixel


def test_encode_images_matches_hf(llava_pair):
    import torch

    hf, runner, sa, pixel = llava_pair
    ours = runner.encode_images(pixel.numpy())          # [1, 4, H]
    with torch.no_grad():
        ref = hf.get_image_features(
            pixel_values=pixel,
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
    ref = (ref[0] if isinstance(ref, (list, tuple)) else ref)
    ref = np.asarray(ref.reshape(1, N_IMG_TOKENS, -1))
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_prefill_logits_match_hf(llava_pair):
    import torch

    hf, runner, sa, pixel = llava_pair
    driver = RawDriver(runner, sa.page_size)

    emb = runner.encode_images(pixel.numpy())[0]        # [4, H]
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(PROMPT)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(PROMPT, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = emb
    hb.mm_positions = np.arange(IMG_OFFSET, IMG_OFFSET + N_IMG_TOKENS,
                                dtype=np.int32)
    ours = runner.forward_all_logits(hb)                # [T, V]

    ids = torch.tensor([PROMPT], dtype=torch.long)
    with torch.no_grad():
        ref = hf(input_ids=ids, pixel_values=pixel).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


# ------------------------------------------------------- end-to-end serving


def _img_b64(seed: int) -> str:
    import base64
    import io

    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (40, 52, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


def test_engine_vlm_serving():
    """Full serving path: image decode -> preprocess -> hash-keyed pseudo
    ids -> vision encode (cached) -> embedding scatter -> chunked prefill.
    The radix cache must key on image CONTENT: same image reuses KV, a
    different image with the same text must NOT."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = tiny_llava_cfg().to_dict()
    eng = Engine(ServerArgs(
        model_path="dummy://llava", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=4,  # force chunks splitting the image span
        random_seed=0), hf_config_override=hf)
    prompt = [3, 17, IMG, 94, 201, 5, 77, 9, 11, 13]
    sp = {"max_new_tokens": 6, "temperature": 0.0}

    out_a = eng.generate(input_ids=prompt, sampling_params=sp,
                         image_data=_img_b64(0), rid="a")
    out_a2 = eng.generate(input_ids=prompt, sampling_params=sp,
                          image_data=_img_b64(0), rid="a2")
    out_b = eng.generate(input_ids=prompt, sampling_params=sp,
                         image_data=_img_b64(1), rid="b")

    # deterministic + cache-hit on the repeat of the SAME image
    assert out_a["output_ids"] == out_a2["output_ids"]
    assert out_a2["meta_info"]["cached_tokens"] > 0
    # different image, same text -> different pseudo ids -> no stale reuse
    assert out_b["output_ids"] != out_a["output_ids"] or \
        out_b["meta_info"]["cached_tokens"] == 0
    # vision-tower cache hit count grew (encode ran once per unique image)
    assert eng.scheduler.mm_cache.hits >= 1
    st = eng.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
    eng.shutdown()


def test_http_vlm_chat_completions(tmp_path):
    """Server path: /v1/chat/completions with an image_url content part."""
    import json

    import requests

    from iaas_sglang_tpu.utils import get_open_port
    from tests.server_utils import kill_server, make_tiny_model_dir, \
        popen_launch_server

    model_dir = make_tiny_model_dir(str(tmp_path / "tiny-llava"))
    cfg = tiny_llava_cfg().to_dict()
    cfg["text_config"]["vocab_size"] = 512  # match the byte tokenizer
    cfg["image_token_index"] = 511
    with open(f"{model_dir}/config.json", "w") as f:
        json.dump(cfg, f)
    port = get_open_port()
    proc = popen_launch_server(model_dir, port)
    try:
        r = requests.post(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            json={"model": "llava", "messages": [{
                "role": "user",
                "content": [
                    {"type": "text", "text": "what is this?"},
                    {"type": "image_url",
                     "image_url": {"url": _img_b64(3)}},
                ]}],
                "max_tokens": 4, "temperature": 0},
            timeout=300)
        assert r.status_code == 200, r.text
        out = r.json()
        assert out["choices"][0]["finish_reason"] in ("length", "stop")
        # prompt grew by the image span
        assert out["usage"]["prompt_tokens"] > N_IMG_TOKENS
    finally:
        kill_server(proc)


def test_engine_vlm_no_placeholder_prepends_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = tiny_llava_cfg().to_dict()
    eng = Engine(ServerArgs(
        model_path="dummy://llava", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=32, random_seed=0), hf_config_override=hf)
    out = eng.generate(input_ids=[9, 11, 13], sampling_params={
        "max_new_tokens": 4, "temperature": 0.0}, image_data=_img_b64(2))
    assert len(out["output_ids"]) == 4
    # prompt grew by the image span
    assert out["meta_info"]["prompt_tokens"] == 3 + N_IMG_TOKENS
    eng.shutdown()


# --------------------------------------------------- LLaVA variants (wave 4)


def test_yivl_projector_matches_torch():
    """Yi-VL layernormed projector (reference models/yivl.py
    YiVLMultiModalProjector) vs a torch reference on the same weights."""
    import torch

    hf = build_hf_llava()
    cfg_dict = tiny_llava_cfg().to_dict()
    cfg_dict["architectures"] = ["YiVLForCausalLM"]
    runner, mc, sa = make_runner(cfg_dict)
    sd = dict(hf.state_dict())
    mmp = ("model.multi_modal_projector."
           if "model.multi_modal_projector.linear_1.weight" in sd
           else "multi_modal_projector.")
    torch.manual_seed(5)
    Hl = 64
    extra = {
        mmp + "ln_1.weight": torch.randn(Hl) * 0.1 + 1,
        mmp + "ln_1.bias": torch.randn(Hl) * 0.1,
        mmp + "ln_2.weight": torch.randn(Hl) * 0.1 + 1,
        mmp + "ln_2.bias": torch.randn(Hl) * 0.1,
    }
    sd.update(extra)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, mc, runner.mesh_ctx, sd)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 28, 28)
    ours = runner.encode_images(pixel.numpy())   # [1, 4, H]

    with torch.no_grad():
        feats = hf.vision_tower(pixel, output_hidden_states=True)
        f = feats.hidden_states[-2][:, 1:]       # feature layer -2, drop CLS
        x = f @ sd[mmp + "linear_1.weight"].T + sd[mmp + "linear_1.bias"]
        x = torch.nn.functional.layer_norm(
            x, (Hl,), extra[mmp + "ln_1.weight"], extra[mmp + "ln_1.bias"])
        x = torch.nn.functional.gelu(x)
        x = x @ sd[mmp + "linear_2.weight"].T + sd[mmp + "linear_2.bias"]
        ref = torch.nn.functional.layer_norm(
            x, (Hl,), extra[mmp + "ln_2.weight"], extra[mmp + "ln_2.bias"])
    np.testing.assert_allclose(
        np.asarray(ours, np.float32), ref[0].reshape(1, 4, -1).numpy(),
        rtol=2e-3, atol=5e-3)


def test_llavavid_video_serving():
    """LLaVA-video end-to-end: a list of frames through the Engine,
    deterministic tokens, pooled token count num_frames*(g/stride)^2."""
    import base64
    import io

    from PIL import Image

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    def frame_b64(seed):
        rng = np.random.default_rng(seed)
        buf = io.BytesIO()
        Image.fromarray(
            rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)).save(
            buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    hf = tiny_llava_cfg().to_dict()
    hf["architectures"] = ["LlavaVidForCausalLM"]
    hf["num_frames"] = 4
    hf["mm_spatial_pool_stride"] = 2
    sa = ServerArgs(model_path="dummy://lvid", load_format="dummy",
                    dtype="float32", page_size=4, max_total_tokens=512,
                    device="cpu", max_running_requests=8,
                    max_prefill_tokens=128, chunked_prefill_size=64,
                    skip_tokenizer_init=True, random_seed=0)
    eng = Engine(sa, hf_config_override=hf)
    # grid 2, stride 2 -> 1 token/frame, 4 frames -> span of 4
    video = [frame_b64(i) for i in range(3)]    # padded to 4 frames
    prompt = [3, 17, 255, 94, 201]
    sp = {"max_new_tokens": 5, "temperature": 0.0}
    o1 = eng.generate(input_ids=[prompt], sampling_params=sp,
                      image_data=[video])
    o2 = eng.generate(input_ids=[prompt], sampling_params=sp,
                      image_data=[video])
    assert o1[0]["output_ids"] == o2[0]["output_ids"]
    assert o1[0]["meta_info"]["prompt_tokens"] == len(prompt) - 1 + 4
    eng.shutdown()
