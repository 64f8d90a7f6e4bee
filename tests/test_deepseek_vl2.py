"""DeepSeek-VL2 golden gate: timm SigLIP tower + downsample_mlp_gelu
projector (zero-pad + channel-major 2x2 unfold) + 2D tile-tag layout
(image_newline per row, view_seperator between views) vs a torch oracle
replicating the reference modules (srt/models/deepseek_vl2.py), into an HF
DeepseekV2 LM under the 'language.' prefix."""

import numpy as np
import pytest
import torch

from tests.test_janus import _TorchTimmBlock
from tests.test_kimi_vl import TEXT as DSV2_TEXT
from tests.utils import RawDriver, make_runner

IMG_TOK = 250

VISION = dict(model_name="siglip_so400m_patch14_384", image_size=70,
              patch_size=14, width=32, layers=2, heads=4, mlp_ratio=2.0)
# grid 5 (odd) -> projector zero-pads to 6 before the 2x2 unfold

PROJ = dict(projector_type="downsample_mlp_gelu", depth=2, mlp_ratio=1,
            downsample_ratio=2, n_embed=64)

DSVL2_CFG = dict(
    architectures=["DeepseekVL2ForCausalLM"], model_type="deepseek_vl_v2",
    language_config=dict(DSV2_TEXT), vision_config=VISION,
    projector_config=PROJ, tile_tag="2D", global_view_pos="head",
    image_token_id=IMG_TOK,
)

HP = 3                       # ceil(5/2)
N_TOK = 2 * HP * (HP + 1) + 1


def _torch_encode(conv, pos, blocks, norm, pj0, pj2, newline, sep, px):
    """Reference get_image_feature for a (1,1) crop (deepseek_vl2.py:283)."""
    with torch.no_grad():
        h = conv(px).flatten(2).transpose(1, 2) + pos
        for b in blocks:
            h = b(h)
        h = norm(h)                                   # [N, 25, C]
        N, hw, C = h.shape
        g = int(hw ** 0.5)
        x = h.reshape(N, g, g, C)
        pad = (2 - g % 2) % 2
        if pad:
            x = torch.nn.functional.pad(x, (0, 0, 0, pad, 0, pad))
        x = x.permute(0, 3, 1, 2)
        x = torch.nn.functional.unfold(x, kernel_size=2, stride=2)
        x = x.permute(0, 2, 1)                        # [N, hp*hp, C*4]
        x = pj2(torch.nn.functional.gelu(pj0(x)))     # [N, hp*hp, D]
        D = x.shape[-1]
        view = x.reshape(N, HP, HP, D)
        nl = newline[None, None, None].expand(N, HP, 1, D)
        view = torch.cat([view, nl], dim=2).reshape(N, -1, D)
        s = sep[None, None].expand(N, 1, D)
        return torch.cat([view, s, view], dim=1)      # [N, 25, D]


@pytest.fixture(scope="module")
def dsvl2_pair():
    import transformers
    from transformers import AutoModelForCausalLM

    cfg = transformers.DeepseekV2Config(
        **{k: v for k, v in DSV2_TEXT.items() if k != "model_type"})
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    lm = AutoModelForCausalLM.from_config(cfg).eval()
    d, heads, inter, p = 32, 4, 64, 14
    conv = torch.nn.Conv2d(3, d, p, stride=p)
    pos = torch.randn(1, 25, d) * 0.02
    blocks = [_TorchTimmBlock(d, heads, inter).eval() for _ in range(2)]
    norm = torch.nn.LayerNorm(d, eps=1e-6)
    pj0 = torch.nn.Linear(4 * d, 64)
    pj2 = torch.nn.Linear(64, 64)
    newline = torch.randn(64) * 0.1
    sep = torch.randn(64) * 0.1

    sd = {f"language.{k}": v for k, v in lm.state_dict().items()}
    sd["vision.patch_embed.proj.weight"] = conv.weight
    sd["vision.patch_embed.proj.bias"] = conv.bias
    sd["vision.pos_embed"] = pos
    sd["vision.norm.weight"] = norm.weight
    sd["vision.norm.bias"] = norm.bias
    for i, b in enumerate(blocks):
        for pn, pv in b.state_dict().items():
            key = (pn.replace("qkv.", "attn.qkv.")
                   .replace("proj.", "attn.proj.")
                   .replace("fc1.", "mlp.fc1.").replace("fc2.", "mlp.fc2."))
            sd[f"vision.blocks.{i}.{key}"] = pv
    for pn, pv in pj0.state_dict().items():
        sd[f"projector.layers.0.{pn}"] = pv
    for pn, pv in pj2.state_dict().items():
        sd[f"projector.layers.2.{pn}"] = pv
    sd["image_newline"] = newline
    sd["view_seperator"] = sep

    runner, mc, sa = make_runner(DSVL2_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    torch.manual_seed(7)
    pixel = torch.randn(2, 3, 70, 70)
    oracle = (conv, pos, blocks, norm, pj0, pj2, newline, sep)
    return lm, oracle, runner, sa, pixel


def test_deepseek_vl2_image_features_match_oracle(dsvl2_pair):
    lm, oracle, runner, sa, pixel = dsvl2_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    ref = _torch_encode(*oracle, pixel).float().numpy()
    assert ours.shape == ref.shape == (2, N_TOK, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_deepseek_vl2_prefill_logits_match_oracle(dsvl2_pair):
    lm, oracle, runner, sa, pixel = dsvl2_pair
    img_rows = _torch_encode(*oracle, pixel[:1])[0]     # [25, H]
    prompt = [3, 17] + [0] * N_TOK + [94, 5]
    driver = RawDriver(runner, sa.page_size)
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(prompt)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(prompt, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = img_rows.numpy()
    hb.mm_positions = np.arange(2, 2 + N_TOK, dtype=np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        emb = lm.get_input_embeddings()(torch.tensor([prompt]))
        emb[0, 2 : 2 + N_TOK] = img_rows
        ref = lm(inputs_embeds=emb).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_deepseek_vl2_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://dsvl2", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=DSVL2_CFG)
    img = np.zeros((64, 48, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8], [9, 10, 11]],
        image_data=[img, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + N_TOK


def test_deepseek_vl2_tiny_rejected():
    """use_mla=False (deepseek-vl2-tiny) must fail loudly, not silently
    mis-serve."""
    from iaas_sglang_tpu.configs.model_config import ModelConfig

    cfg = dict(DSVL2_CFG)
    cfg["language_config"] = dict(DSV2_TEXT, use_mla=False)
    with pytest.raises(ValueError, match="use_mla"):
        ModelConfig.from_hf(cfg, model_path="x")
