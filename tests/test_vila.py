"""VILA golden gate: SigLIP tower tapped at mm_vision_select_layer + the
mlp_downsample_3x3_fix projector vs a torch oracle built from HF
SiglipVisionModel + the reference projector ops (srt/models/vila.py has no
HF class to compare against directly)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, hf_forward_logits, make_runner

IMG_TOK = 250

TEXT = dict(model_type="qwen2", hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=512,
            tie_word_embeddings=False)

VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=3,
              num_attention_heads=4, image_size=84, patch_size=14,
              layer_norm_eps=1e-6)   # grid 6x6 -> 2x2 projector tokens

VILA_CFG = dict(
    architectures=["VILAForConditionalGeneration"], model_type="vila",
    text_config=TEXT, vision_config=VISION,
    hidden_size=64, mm_hidden_size=32, image_token_id=IMG_TOK,
    mm_projector_type="mlp_downsample_3x3_fix",
    mm_vision_select_feature="cls_patch", mm_vision_select_layer=-2,
)


@pytest.fixture(scope="module")
def vila_pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM, SiglipVisionModel
    from transformers.models.siglip import SiglipVisionConfig

    torch.manual_seed(0)
    lm = Qwen2ForCausalLM(Qwen2Config(**TEXT)).eval()
    tower = SiglipVisionModel(SiglipVisionConfig(**VISION)).eval()
    m, H = 32, 64
    g = torch.Generator().manual_seed(1)
    proj = {
        "1": torch.nn.LayerNorm(9 * m),
        "2": torch.nn.Linear(9 * m, 3 * m),
        "4": torch.nn.LayerNorm(3 * m),
        "5": torch.nn.Linear(3 * m, H),
        "7": torch.nn.Linear(H, H),
    }
    for mod in proj.values():
        for p in mod.parameters():
            p.data = torch.randn(p.shape, generator=g) * 0.1

    sd = {}
    sd.update({f"llm.{k}": v for k, v in lm.state_dict().items()})
    sd.update({f"vision_tower.{k}": v for k, v in tower.state_dict().items()})
    for i, mod in proj.items():
        for pn, p in mod.state_dict().items():
            sd[f"mm_projector.layers.{i}.{pn}"] = p

    runner, mc, sa = make_runner(VILA_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, sd)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 84, 84)
    return lm, tower, proj, runner, sa, pixel


def _torch_project(tower, proj, pixel):
    with torch.no_grad():
        out = tower(pixel, output_hidden_states=True)
        feats = out.hidden_states[-2]                  # [1, 36, m]
        N, P, m = feats.shape
        gsz = int(P ** 0.5)
        x = feats.reshape(N, gsz, gsz, m)
        pad = (3 - gsz % 3) % 3
        if pad:
            x = torch.nn.functional.pad(x, (0, 0, 0, pad, 0, pad))
        t = (gsz + pad) // 3
        x = x.reshape(N, t, 3, t, 3, m).permute(0, 1, 3, 2, 4, 5)
        x = x.reshape(N, t * t, 9 * m)
        x = proj["2"](proj["1"](x))
        x = torch.nn.functional.gelu(x)
        x = proj["5"](proj["4"](x))
        x = torch.nn.functional.gelu(x)
        return proj["7"](x)                            # [1, t*t, H]


def test_vila_image_features_match_oracle(vila_pair):
    lm, tower, proj, runner, sa, pixel = vila_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    ref = _torch_project(tower, proj, pixel).float().numpy()
    assert ours.shape == ref.shape == (1, 4, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_vila_prefill_logits_match_oracle(vila_pair):
    """LM rows with the projected image embedding scattered in must match
    the HF qwen2 oracle run on merged inputs_embeds."""
    lm, tower, proj, runner, sa, pixel = vila_pair
    img_rows = _torch_project(tower, proj, pixel)[0]   # [4, H]
    prompt = [3, 17, 0, 0, 0, 0, 94, 201, 5]           # rows 2..5 = image
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


def test_vila_engine_generate_with_image():
    """End-to-end dummy-weight engine drive: image ingestion through the
    processor (ceil(g/3)^2 pseudo ids), batched with a text-only request."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://vila", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=VILA_CFG)
    img = np.zeros((84, 84, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8], [9, 10, 11]],
        image_data=[img, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert len(outs[1]["output_ids"]) == 4
