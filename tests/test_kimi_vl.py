"""Kimi-VL golden gate: MoonViT tower (bicubic-interpolated learnable 2D
positions, interleaved 2D rope, fused biased wqkv, gelu-tanh MLP2, final
layernorm), 2x2 patch merger and QuickGELU projector vs a torch oracle
replicating the reference modules (srt/models/kimi_vl_moonvit.py,
srt/models/kimi_vl.py), into an HF DeepseekV2 LM."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, make_runner

IMG_TOK = 250

TEXT = dict(model_type="deepseek_v2", num_hidden_layers=2, hidden_size=64,
            num_attention_heads=4, num_key_value_heads=4,
            intermediate_size=96, vocab_size=256, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=512,
            tie_word_embeddings=False, q_lora_rank=None, kv_lora_rank=16,
            qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
            n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
            moe_intermediate_size=32, first_k_dense_replace=1,
            routed_scaling_factor=1.0, topk_method="greedy", n_group=1,
            topk_group=1, norm_topk_prob=False, aux_loss_alpha=0.0,
            seq_aux=False)

VISION = dict(patch_size=14, init_pos_emb_height=6, init_pos_emb_width=6,
              num_attention_heads=4, num_hidden_layers=2, hidden_size=32,
              intermediate_size=64, merge_kernel_size=[2, 2],
              serving_image_size=56)   # grid 4 != trained 6 -> interp

KIMI_CFG = dict(
    architectures=["KimiVLForConditionalGeneration"], model_type="kimi_vl",
    vision_config=VISION, text_config=TEXT,
    media_placeholder_token_id=IMG_TOK,
)


class _TorchMoonViT(torch.nn.Module):
    """MoonVitPretrainedModel + projector oracle (reference semantics)."""

    def __init__(self, vc, lm_hidden):
        super().__init__()
        D, I, p = vc["hidden_size"], vc["intermediate_size"], \
            vc["patch_size"]
        self.heads = vc["num_attention_heads"]
        self.patch = p
        self.proj = torch.nn.Conv2d(3, D, p, stride=p)
        self.pos = torch.nn.Parameter(torch.randn(
            vc["init_pos_emb_height"], vc["init_pos_emb_width"], D))
        self.blocks = torch.nn.ModuleList()
        for _ in range(vc["num_hidden_layers"]):
            self.blocks.append(torch.nn.ModuleDict(dict(
                norm0=torch.nn.LayerNorm(D), norm1=torch.nn.LayerNorm(D),
                wqkv=torch.nn.Linear(D, 3 * D),
                wo=torch.nn.Linear(D, D),
                fc0=torch.nn.Linear(D, I), fc1=torch.nn.Linear(I, D))))
        self.final_ln = torch.nn.LayerNorm(D)
        self.pre_norm = torch.nn.LayerNorm(D)
        self.linear_1 = torch.nn.Linear(4 * D, 4 * D)
        self.linear_2 = torch.nn.Linear(4 * D, lm_hidden)

    def _freqs_cis(self, g, head_dim):
        # reference Rope2DPosEmb.precomputed_freqs_cis
        pos = torch.arange(g * g).float()
        x_pos, y_pos = pos % g, pos // g
        dim_range = torch.arange(0, head_dim, 4)[: head_dim // 4].float()
        freqs = 1.0 / 10000 ** (dim_range / head_dim)
        x_cis = torch.polar(torch.ones(g * g, head_dim // 4),
                            torch.outer(x_pos, freqs))
        y_cis = torch.polar(torch.ones(g * g, head_dim // 4),
                            torch.outer(y_pos, freqs))
        return torch.cat([x_cis.unsqueeze(-1), y_cis.unsqueeze(-1)],
                         dim=-1).reshape(g * g, head_dim // 2)

    def forward(self, pixel):
        g = pixel.shape[-1] // self.patch
        h = self.proj(pixel).flatten(2).transpose(1, 2)     # [1, P, D]
        pe = torch.nn.functional.interpolate(
            self.pos.permute(2, 0, 1).unsqueeze(0), size=(g, g),
            mode="bicubic").squeeze(0).permute(1, 2, 0).reshape(g * g, -1)
        h = h + pe[None]
        N, P, D = h.shape
        Dh = D // self.heads
        fc = self._freqs_cis(g, Dh)[None, :, None]          # [1, P, 1, C/2]
        for blk in self.blocks:
            r = blk["norm0"](h)
            qkv = blk["wqkv"](r).view(N, P, 3, self.heads, Dh)
            q, k, v = torch.unbind(qkv, dim=2)
            qc = torch.view_as_complex(
                q.float().reshape(N, P, self.heads, Dh // 2, 2))
            kc = torch.view_as_complex(
                k.float().reshape(N, P, self.heads, Dh // 2, 2))
            q = torch.view_as_real(qc * fc).flatten(-2)
            k = torch.view_as_real(kc * fc).flatten(-2)
            q, k, v = (t.transpose(1, 2) for t in (q, k, v.float()))
            a = torch.softmax(q @ k.transpose(-1, -2) * Dh ** -0.5, -1)
            ctx = (a @ v).transpose(1, 2).reshape(N, P, D)
            h = h + blk["wo"](ctx)
            h = h + blk["fc1"](torch.nn.functional.gelu(
                blk["fc0"](blk["norm1"](h)), approximate="tanh"))
        h = self.final_ln(h)
        # 2x2 merger + projector (QuickGELU)
        nh = nw = g // 2
        h = h.reshape(N, nh, 2, nw, 2, D).permute(0, 1, 3, 2, 4, 5)
        h = self.pre_norm(h.reshape(N, nh * nw, 4, D))
        x = self.linear_1(h.reshape(N, nh * nw, 4 * D))
        x = x * torch.sigmoid(1.702 * x)
        return self.linear_2(x)


@pytest.fixture(scope="module")
def kimi_pair():
    import transformers
    from transformers import AutoModelForCausalLM

    cfg = transformers.DeepseekV2Config(
        **{k: v for k, v in TEXT.items() if k != "model_type"})
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    lm = AutoModelForCausalLM.from_config(cfg).eval()
    vt = _TorchMoonViT(VISION, TEXT["hidden_size"]).eval()
    for p in vt.parameters():
        if p.dim() > 1:
            torch.nn.init.normal_(p, std=0.1)

    sd = {f"language_model.{k}": v for k, v in lm.state_dict().items()}
    sd["vision_tower.patch_embed.proj.weight"] = vt.proj.weight
    sd["vision_tower.patch_embed.proj.bias"] = vt.proj.bias
    sd["vision_tower.patch_embed.pos_emb.weight"] = vt.pos
    sd["vision_tower.encoder.final_layernorm.weight"] = vt.final_ln.weight
    sd["vision_tower.encoder.final_layernorm.bias"] = vt.final_ln.bias
    for i, blk in enumerate(vt.blocks):
        for short in ("norm0", "norm1", "wqkv", "wo"):
            for pn, p in blk[short].state_dict().items():
                sd[f"vision_tower.encoder.blocks.{i}.{short}.{pn}"] = p
        for short in ("fc0", "fc1"):
            for pn, p in blk[short].state_dict().items():
                sd[f"vision_tower.encoder.blocks.{i}.mlp.{short}.{pn}"] = p
    for nm, mod in (("pre_norm", vt.pre_norm), ("linear_1", vt.linear_1),
                    ("linear_2", vt.linear_2)):
        for pn, p in mod.state_dict().items():
            sd[f"multi_modal_projector.{nm}.{pn}"] = p

    runner, mc, sa = make_runner(KIMI_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    torch.manual_seed(7)
    pixel = torch.randn(2, 3, 56, 56)
    return lm, vt, runner, sa, pixel


def test_kimi_vl_image_features_match_oracle(kimi_pair):
    lm, vt, runner, sa, pixel = kimi_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    with torch.no_grad():
        ref = torch.cat([vt(pixel[i:i + 1]) for i in range(2)]).numpy()
    assert ours.shape == ref.shape == (2, 4, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_kimi_vl_prefill_logits_match_oracle(kimi_pair):
    lm, vt, runner, sa, pixel = kimi_pair
    with torch.no_grad():
        img_rows = vt(pixel[:1])[0]                    # [4, H]
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


def test_kimi_vl_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://kimi", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=KIMI_CFG)
    img = np.zeros((64, 48, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8], [9, 10, 11]],
        image_data=[img, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + 4
