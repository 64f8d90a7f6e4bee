"""InternVL golden gate: InternViT tower (class token, LayerScale, optional
full-width qk RMSNorm, rms/layer norm variants, no final norm) +
pixel_shuffle + mlp1 projector vs a torch oracle replicating the reference
modules (srt/models/internvl.py)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, make_runner

IMG_TOK = 250

TEXT = dict(model_type="qwen2", hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=512,
            tie_word_embeddings=False)

VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=56, patch_size=14,
              layer_norm_eps=1e-6, norm_type="rms_norm",
              qk_normalization=True, qkv_bias=False)   # InternViT-6B style

IVL_CFG = dict(
    architectures=["InternVLChatModel"], model_type="internvl_chat",
    llm_config=TEXT, vision_config=VISION,
    select_layer=-1, downsample_ratio=0.5, ps_version="v2",
    template="internvl2_5", img_context_token_id=IMG_TOK,
)


def _rms(x, w, eps=1e-6):
    v = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(v + eps) * w).to(x.dtype)


class _TorchInternBlock(torch.nn.Module):
    def __init__(self, d, heads, inter, qk_norm, qkv_bias, rms):
        super().__init__()
        self.qkv = torch.nn.Linear(d, 3 * d, bias=qkv_bias)
        self.proj = torch.nn.Linear(d, d)
        self.fc1 = torch.nn.Linear(d, inter)
        self.fc2 = torch.nn.Linear(inter, d)
        self.norm1_w = torch.nn.Parameter(torch.randn(d) * 0.1 + 1)
        self.norm2_w = torch.nn.Parameter(torch.randn(d) * 0.1 + 1)
        self.ls1 = torch.nn.Parameter(torch.randn(d) * 0.1 + 1)
        self.ls2 = torch.nn.Parameter(torch.randn(d) * 0.1 + 1)
        self.qn = torch.nn.Parameter(torch.randn(d) * 0.1 + 1)
        self.kn = torch.nn.Parameter(torch.randn(d) * 0.1 + 1)
        self.heads, self.qk_norm, self.rms = heads, qk_norm, rms

    def _norm(self, x, w):
        assert self.rms
        return _rms(x, w)

    def forward(self, x):
        B, P, D = x.shape
        h = self._norm(x, self.norm1_w)
        qkv = self.qkv(h)
        q, k, v = qkv.chunk(3, dim=-1)
        if self.qk_norm:
            q, k = _rms(q, self.qn), _rms(k, self.kn)
        hd = D // self.heads
        q = q.reshape(B, P, self.heads, hd).transpose(1, 2)
        k = k.reshape(B, P, self.heads, hd).transpose(1, 2)
        v = v.reshape(B, P, self.heads, hd).transpose(1, 2)
        a = torch.softmax(q @ k.transpose(-1, -2) * hd ** -0.5, dim=-1)
        ctx = (a @ v).transpose(1, 2).reshape(B, P, D)
        x = x + self.proj(ctx) * self.ls1
        h2 = self._norm(x, self.norm2_w)
        return x + self.fc2(torch.nn.functional.gelu(self.fc1(h2))) * self.ls2


@pytest.fixture(scope="module")
def ivl_pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    lm = Qwen2ForCausalLM(Qwen2Config(**TEXT)).eval()
    d, heads, inter, p, img = 32, 4, 64, 14, 56
    g = img // p                                        # 4x4 grid
    conv = torch.nn.Conv2d(3, d, p, stride=p)
    cls = torch.randn(1, 1, d) * 0.02
    pos = torch.randn(1, g * g + 1, d) * 0.02
    blocks = [_TorchInternBlock(d, heads, inter, True, False, True)
              for _ in range(2)]
    m = d * 4
    ln = torch.nn.LayerNorm(m)
    w1 = torch.nn.Linear(m, 64)
    w2 = torch.nn.Linear(64, 64)

    sd = {}
    sd.update({f"language_model.{k}": v for k, v in lm.state_dict().items()})
    vt = "vision_model."
    sd[vt + "embeddings.patch_embedding.weight"] = conv.weight
    sd[vt + "embeddings.patch_embedding.bias"] = conv.bias
    sd[vt + "embeddings.class_embedding"] = cls
    sd[vt + "embeddings.position_embedding"] = pos
    for i, b in enumerate(blocks):
        pre = f"{vt}encoder.layers.{i}."
        sd[pre + "attn.qkv.weight"] = b.qkv.weight
        sd[pre + "attn.proj.weight"] = b.proj.weight
        sd[pre + "attn.proj.bias"] = b.proj.bias
        sd[pre + "attn.q_norm.weight"] = b.qn
        sd[pre + "attn.k_norm.weight"] = b.kn
        sd[pre + "norm1.weight"] = b.norm1_w
        sd[pre + "norm2.weight"] = b.norm2_w
        sd[pre + "ls1"] = b.ls1
        sd[pre + "ls2"] = b.ls2
        sd[pre + "mlp.fc1.weight"] = b.fc1.weight
        sd[pre + "mlp.fc1.bias"] = b.fc1.bias
        sd[pre + "mlp.fc2.weight"] = b.fc2.weight
        sd[pre + "mlp.fc2.bias"] = b.fc2.bias
    sd["mlp1.0.weight"] = ln.weight
    sd["mlp1.0.bias"] = ln.bias
    sd["mlp1.1.weight"] = w1.weight
    sd["mlp1.1.bias"] = w1.bias
    sd["mlp1.3.weight"] = w2.weight
    sd["mlp1.3.bias"] = w2.bias

    runner, mc, sa = make_runner(IVL_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, sd)
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 56, 56)

    def torch_encode(px):
        with torch.no_grad():
            x = conv(px).flatten(2).transpose(1, 2)
            x = torch.cat([cls.expand(x.shape[0], 1, -1), x], dim=1) + pos
            for b in blocks:
                x = b(x)
            feats = x[:, 1:]                            # [1, 16, d]
            # pixel_shuffle v2, scale 0.5 (reference internvl.py:462)
            n, P, c = feats.shape
            w = h = int(P ** 0.5)
            y = feats.reshape(n, w, h, c)
            y = y.reshape(n, w, h // 2, c * 2)
            y = y.permute(0, 2, 1, 3)
            y = y.reshape(n, h // 2, w // 2, c * 4)
            y = y.permute(0, 2, 1, 3).contiguous()
            y = y.reshape(n, (w // 2) * (h // 2), c * 4)
            return w2(torch.nn.functional.gelu(w1(ln(y))))

    return lm, torch_encode, runner, sa, pixel


def test_internvl_image_features_match_oracle(ivl_pair):
    lm, torch_encode, runner, sa, pixel = ivl_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    ref = torch_encode(pixel).float().numpy()
    assert ours.shape == ref.shape == (1, 4, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_internvl_prefill_logits_match_oracle(ivl_pair):
    lm, torch_encode, runner, sa, pixel = ivl_pair
    img_rows = torch_encode(pixel)[0]
    prompt = [3, 0, 0, 0, 0, 94, 201, 5]
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
    hb.mm_positions = np.arange(1, 5, dtype=np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        emb = lm.get_input_embeddings()(torch.tensor([prompt]))
        emb[0, 1:5] = img_rows
        ref = lm(inputs_embeds=emb).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_internvl_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://internvl", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=IVL_CFG)
    img = np.zeros((56, 56, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8]],
        image_data=[img],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
