"""Janus-Pro (MultiModalityCausalLM) golden gate: timm-layout SigLIP tower
+ mlp_gelu aligner vs a torch oracle replicating the reference modules
(srt/models/deepseek_janus_pro.py VisionTransformer/MlpProjector — timm is
not in the image, so the oracle is built from torch primitives in the
reference's layout)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, make_runner

IMG_TOK = 250

TEXT = dict(model_type="llama", hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=512,
            tie_word_embeddings=False)

# tiny override of the siglip_large geometry (table entry supplies defaults)
VPARAMS = dict(model_name="siglip_large_patch16_384", image_size=48,
               patch_size=16, width=32, layers=2, heads=4, mlp_ratio=2.0)

JANUS_CFG = dict(
    architectures=["MultiModalityCausalLM"], model_type="multi_modality",
    language_config=TEXT,
    vision_config={"cls": "CLIPVisionTower", "params": VPARAMS},
    aligner_config={"cls": "MlpProjector",
                    "params": {"projector_type": "mlp_gelu", "depth": 2,
                               "input_dim": 32, "n_embed": 64}},
    image_token_id=IMG_TOK,
)


class _TorchTimmBlock(torch.nn.Module):
    def __init__(self, d, heads, inter):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(d, eps=1e-6)
        self.qkv = torch.nn.Linear(d, 3 * d)
        self.proj = torch.nn.Linear(d, d)
        self.norm2 = torch.nn.LayerNorm(d, eps=1e-6)
        self.fc1 = torch.nn.Linear(d, inter)
        self.fc2 = torch.nn.Linear(inter, d)
        self.heads = heads

    def forward(self, x):
        B, P, D = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(B, P, 3, self.heads, D // self.heads)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        a = torch.softmax(q @ k.transpose(-1, -2) * (D // self.heads) ** -0.5,
                          dim=-1)
        ctx = (a @ v).transpose(1, 2).reshape(B, P, D)
        x = x + self.proj(ctx)
        h2 = self.norm2(x)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h2)))


@pytest.fixture(scope="module")
def janus_pair():
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    lm = LlamaForCausalLM(LlamaConfig(**TEXT)).eval()
    d, heads, inter, p, img = 32, 4, 64, 16, 48
    g = img // p
    conv = torch.nn.Conv2d(3, d, p, stride=p)
    pos = torch.randn(1, g * g, d) * 0.02
    blocks = [_TorchTimmBlock(d, heads, inter) for _ in range(2)]
    norm = torch.nn.LayerNorm(d, eps=1e-6)
    al0 = torch.nn.Linear(32, 64)
    al2 = torch.nn.Linear(64, 64)

    sd = {}
    sd.update({f"language_model.{k}": v for k, v in lm.state_dict().items()})
    vt = "vision_model.vision_tower."
    sd[vt + "patch_embed.proj.weight"] = conv.weight
    sd[vt + "patch_embed.proj.bias"] = conv.bias
    sd[vt + "pos_embed"] = pos
    for i, b in enumerate(blocks):
        for pn, pv in b.state_dict().items():
            key = (pn.replace("qkv.", "attn.qkv.")
                   .replace("proj.", "attn.proj.")
                   .replace("fc1.", "mlp.fc1.").replace("fc2.", "mlp.fc2."))
            sd[f"{vt}blocks.{i}.{key}"] = pv
    sd[vt + "norm.weight"] = norm.weight
    sd[vt + "norm.bias"] = norm.bias
    sd["aligner.layers.0.weight"] = al0.weight
    sd["aligner.layers.0.bias"] = al0.bias
    sd["aligner.layers.2.weight"] = al2.weight
    sd["aligner.layers.2.bias"] = al2.bias

    runner, mc, sa = make_runner(JANUS_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, sd)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 48, 48)

    def torch_encode(px):
        with torch.no_grad():
            x = conv(px).flatten(2).transpose(1, 2) + pos
            for b in blocks:
                x = b(x)
            x = norm(x)
            return al2(torch.nn.functional.gelu(al0(x)))

    return lm, torch_encode, runner, sa, pixel


def test_janus_image_features_match_oracle(janus_pair):
    lm, torch_encode, runner, sa, pixel = janus_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    ref = torch_encode(pixel).float().numpy()
    assert ours.shape == ref.shape == (1, 9, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_janus_prefill_logits_match_oracle(janus_pair):
    lm, torch_encode, runner, sa, pixel = janus_pair
    img_rows = torch_encode(pixel)[0]                 # [9, H]
    prompt = [3] + [0] * 9 + [94, 201, 5]
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
    hb.mm_positions = np.arange(1, 10, dtype=np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        emb = lm.get_input_embeddings()(torch.tensor([prompt]))
        emb[0, 1:10] = img_rows
        ref = lm(inputs_embeds=emb).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_janus_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://janus", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=JANUS_CFG)
    img = np.zeros((48, 48, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8]],
        image_data=[img],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
