"""Qwen2.5-VL golden gate: windowed ViT (RMSNorm blocks, gated MLP,
window/full attention interleave) + MRope LM vs HF transformers."""

import numpy as np
import pytest

from tests.utils import RawDriver, load_hf_weights_into, make_runner

IMG = 255


def tiny_cfg():
    from transformers import Qwen2_5_VLConfig

    return Qwen2_5_VLConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=False,
        pad_token_id=0,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(
            depth=2, hidden_size=32, out_hidden_size=64, num_heads=4,
            in_chans=3, intermediate_size=48, patch_size=14,
            spatial_merge_size=2, temporal_patch_size=2,
            window_size=56,              # 2x2 merge units per window
            fullatt_block_indexes=[1],   # layer 0 windowed, layer 1 full
            hidden_act="silu"),
        image_token_id=IMG, video_token_id=254,
        vision_start_token_id=253, vision_end_token_id=252)


@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import Qwen2_5_VLForConditionalGeneration

    torch.manual_seed(0)
    hf = Qwen2_5_VLForConditionalGeneration(tiny_cfg()).eval()
    runner, cfg, sa = make_runner(tiny_cfg().to_dict())
    load_hf_weights_into(runner, hf)
    return hf, runner, sa


def _pixel_input(seed: int = 7, grid=(1, 8, 8)):
    import torch

    t, h, w = grid
    torch.manual_seed(seed)
    return torch.randn(t * h * w, 3 * 2 * 14 * 14), torch.tensor([list(grid)])


def test_vision_tower_matches_hf(pair):
    """8x8 patch grid = 4x4 merge units = 2x2 windows: exercises the
    window permutation, the block-diagonal mask, the full-attention
    layer, and the inverse reorder after the merger."""
    import jax.numpy as jnp
    import torch

    hf, runner, sa = pair
    patches, grid_thw = _pixel_input()
    with torch.no_grad():
        ref = hf.model.visual(patches, grid_thw=grid_thw).float().numpy()

    tables = runner.model.vision_host_tables((1, 8, 8))
    ours = np.asarray(runner.model.encode_images(
        runner.params, jnp.asarray(patches.numpy()[None]),
        *(jnp.asarray(t) for t in tables)))[0]
    assert ours.shape == ref.shape    # [16, H]
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_prefill_logits_match_hf(pair):
    import jax.numpy as jnp
    import torch

    hf, runner, sa = pair
    driver = RawDriver(runner, sa.page_size)
    patches, grid_thw = _pixel_input()
    tables = runner.model.vision_host_tables((1, 8, 8))
    emb = np.asarray(runner.model.encode_images(
        runner.params, jnp.asarray(patches.numpy()[None]),
        *(jnp.asarray(t) for t in tables)))[0]   # [16, H]

    from iaas_sglang_tpu.models.qwen2_vl import compute_mrope_positions

    ids = [3, 17, 253] + [IMG] * 16 + [252, 94, 201]
    pos3, _ = compute_mrope_positions(len(ids), [(3, 16, (1, 4, 4))])

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = emb
    hb.mm_positions = np.arange(3, 19, dtype=np.int32)
    hb.mrope_positions = pos3
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=patches,
                 image_grid_thw=grid_thw).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_engine_qwen25vl_serving():
    import base64
    import io

    from PIL import Image

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    cfg = tiny_cfg().to_dict()
    cfg["vision_config"]["serving_image_size"] = 112  # 8x8 grid, 16 tokens
    eng = Engine(ServerArgs(
        model_path="dummy://qwen25vl", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=8, random_seed=0), hf_config_override=cfg)

    def b64(seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 255, (80, 112, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return ("data:image/png;base64,"
                + base64.b64encode(buf.getvalue()).decode())

    prompt = [3, 17, 253, IMG, 252, 94, 201, 5]
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    o1 = eng.generate(input_ids=prompt, sampling_params=sp,
                      image_data=b64(0), rid="q1")
    o2 = eng.generate(input_ids=prompt, sampling_params=sp,
                      image_data=b64(0), rid="q2")
    assert o1["output_ids"] == o2["output_ids"]
    assert o2["meta_info"]["cached_tokens"] > 0
    st = eng.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
    eng.shutdown()
