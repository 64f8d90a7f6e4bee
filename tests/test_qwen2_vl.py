"""Qwen2-VL golden gate: JAX ViT (2D rope + PatchMerger) and MRope LM vs
HF transformers with identical weights."""

import numpy as np
import pytest

from tests.utils import RawDriver, load_hf_weights_into, make_runner

IMG = 255  # image_token_id


def tiny_qwen2vl_cfg():
    from transformers import Qwen2VLConfig

    return Qwen2VLConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=False,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        vision_config=dict(depth=2, embed_dim=32, hidden_size=64,
                           num_heads=4, in_chans=3, mlp_ratio=2,
                           patch_size=14, spatial_merge_size=2,
                           temporal_patch_size=2),
        image_token_id=IMG, video_token_id=254,
        vision_start_token_id=253, vision_end_token_id=252)


@pytest.fixture(scope="module")
def qwen2vl_pair():
    import torch
    from transformers import Qwen2VLForConditionalGeneration

    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(tiny_qwen2vl_cfg()).eval()
    runner, cfg, sa = make_runner(tiny_qwen2vl_cfg().to_dict())
    load_hf_weights_into(runner, hf)
    return hf, runner, sa


def _pixel_input(seed: int = 7, grid=(1, 4, 4)):
    """Build flattened patches the way the HF processor does."""
    import torch

    t, h, w = grid
    torch.manual_seed(seed)
    S = t * h * w
    return torch.randn(S, 3 * 2 * 14 * 14), torch.tensor([list(grid)])


def test_vision_tower_matches_hf(qwen2vl_pair):
    import torch

    hf, runner, sa = qwen2vl_pair
    patches, grid_thw = _pixel_input()
    with torch.no_grad():
        ref = hf.model.visual(patches, grid_thw=grid_thw).float().numpy()

    from iaas_sglang_tpu.models.qwen2_vl import vision_rope_cos_sin

    import jax.numpy as jnp

    cos, sin = vision_rope_cos_sin((1, 4, 4), runner.model.vc)
    ours = np.asarray(runner.model.encode_images(
        runner.params, jnp.asarray(patches.numpy()[None]),
        jnp.asarray(cos), jnp.asarray(sin)))[0]
    assert ours.shape == ref.shape  # [4, H] (16 patches / 2x2 merge)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_mrope_positions_match_hf(qwen2vl_pair):
    import torch

    hf, runner, sa = qwen2vl_pair
    # real Qwen2-VL prompt shape: <|vision_start|> IMG... <|vision_end|>
    ids = [3, 17, 253, IMG, IMG, IMG, IMG, 252, 94, 201]
    grid_thw = torch.tensor([[1, 4, 4]])
    pos_ref, delta_ref = hf.model.get_rope_index(
        torch.tensor([ids]), image_grid_thw=grid_thw)
    from iaas_sglang_tpu.models.qwen2_vl import compute_mrope_positions

    pos3, delta = compute_mrope_positions(len(ids), [(3, 4, (1, 2, 2))])
    np.testing.assert_array_equal(pos3, pos_ref[:, 0].numpy())
    assert delta == int(delta_ref[0, 0])


def test_prefill_logits_match_hf(qwen2vl_pair):
    import jax.numpy as jnp
    import torch

    hf, runner, sa = qwen2vl_pair
    driver = RawDriver(runner, sa.page_size)
    patches, grid_thw = _pixel_input()

    from iaas_sglang_tpu.models.qwen2_vl import (compute_mrope_positions,
                                                  vision_rope_cos_sin)

    cos, sin = vision_rope_cos_sin((1, 4, 4), runner.model.vc)
    emb = np.asarray(runner.model.encode_images(
        runner.params, jnp.asarray(patches.numpy()[None]),
        jnp.asarray(cos), jnp.asarray(sin)))[0]      # [4, H]

    ids = [3, 17, 253, IMG, IMG, IMG, IMG, 252, 94, 201]
    pos3, _ = compute_mrope_positions(len(ids), [(3, 4, (1, 2, 2))])

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = emb
    hb.mm_positions = np.arange(3, 7, dtype=np.int32)
    hb.mrope_positions = pos3
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor([ids]),
                 pixel_values=patches,
                 image_grid_thw=grid_thw).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_engine_qwen2vl_serving():
    """Full serving path for Qwen2-VL: fixed-bucket patch preprocessing,
    per-grid vision encode, MRope positions through extend + decode +
    chained overlap decode, radix keyed on image content."""
    import base64
    import io

    from PIL import Image

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    cfg = tiny_qwen2vl_cfg().to_dict()
    cfg["vision_config"]["serving_image_size"] = 56  # grid 4x4 -> 4 tokens
    eng = Engine(ServerArgs(
        model_path="dummy://qwen2vl", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=6, random_seed=0), hf_config_override=cfg)

    def b64(seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 255, (40, 56, 3), dtype=np.uint8)
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
    assert len(o1["output_ids"]) == 6
    assert o2["meta_info"]["cached_tokens"] > 0
    # text-only request on the same (mrope) model shares the batch machinery
    o3 = eng.generate(input_ids=[7, 8, 9, 10], sampling_params=sp, rid="q3")
    assert len(o3["output_ids"]) == 6
    st = eng.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
    eng.shutdown()
