"""Phi-4-multimodal golden gate: Idefics2 tower without post layernorm,
2x2 avg-pool token compression, HD transform (sub_GN newline columns,
glb_GN separator, sub_glb order) + Linear-GELU-Linear projector into a
phi3 LM with partial rotary (reference srt/models/phi4mm.py; the torch
oracle replicates the reference modules — audio/LoRA are skipped there
too)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, load_hf_weights_into, make_runner

IMG_TOK = 250

VISION = dict(hidden_size=32, image_size=56, intermediate_size=64,
              num_attention_heads=4, num_hidden_layers=2, patch_size=14,
              layer_norm_eps=1e-6)
G2 = 2                          # pooled grid side (56/14/2)
N_TOK = 2 * G2 * (G2 + 1) + 1   # 13

P4_CFG = dict(
    architectures=["Phi4MMForCausalLM"], model_type="phi4mm",
    vocab_size=256, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    rms_norm_eps=1e-5, rope_theta=10000.0, partial_rotary_factor=0.75,
    max_position_embeddings=512, tie_word_embeddings=False, pad_token_id=0,
    vision_config=VISION, image_token_id=IMG_TOK,
)


class _TorchPhi4Tower(torch.nn.Module):
    """Idefics2 tower (no post-norm) + compression + HD + projector."""

    def __init__(self, vc, lm_hidden):
        super().__init__()
        Hv, Iv, p = vc["hidden_size"], vc["intermediate_size"], \
            vc["patch_size"]
        side = vc["image_size"] // p
        self.heads = vc["num_attention_heads"]
        self.conv = torch.nn.Conv2d(3, Hv, p, stride=p)
        self.pos = torch.nn.Embedding(side * side, Hv)
        self.layers = torch.nn.ModuleList()
        for _ in range(vc["num_hidden_layers"]):
            self.layers.append(torch.nn.ModuleDict(dict(
                ln1=torch.nn.LayerNorm(Hv, eps=1e-6),
                ln2=torch.nn.LayerNorm(Hv, eps=1e-6),
                q=torch.nn.Linear(Hv, Hv), k=torch.nn.Linear(Hv, Hv),
                v=torch.nn.Linear(Hv, Hv), o=torch.nn.Linear(Hv, Hv),
                fc1=torch.nn.Linear(Hv, Iv), fc2=torch.nn.Linear(Iv, Hv))))
        self.glb_GN = torch.nn.Parameter(torch.randn(1, 1, Hv) * 0.1)
        self.sub_GN = torch.nn.Parameter(torch.randn(1, 1, 1, Hv) * 0.1)
        self.p0 = torch.nn.Linear(Hv, lm_hidden)
        self.p2 = torch.nn.Linear(lm_hidden, lm_hidden)

    def forward(self, pixel):
        h = self.conv(pixel).flatten(2).transpose(1, 2)
        h = h + self.pos.weight[None]
        N, P, Hv = h.shape
        Dh = Hv // self.heads
        for blk in self.layers:
            r = blk["ln1"](h)
            q = blk["q"](r).view(N, P, self.heads, Dh).transpose(1, 2)
            k = blk["k"](r).view(N, P, self.heads, Dh).transpose(1, 2)
            v = blk["v"](r).view(N, P, self.heads, Dh).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) * Dh ** -0.5, -1)
            h = h + blk["o"]((a @ v).transpose(1, 2).reshape(N, P, Hv))
            h = h + blk["fc2"](torch.nn.functional.gelu(
                blk["fc1"](blk["ln2"](h)), approximate="tanh"))
        g = int(P ** 0.5)
        g2 = g // 2
        h = h.reshape(N, g2, 2, g2, 2, Hv).mean(dim=(2, 4))   # avg pool
        sub = torch.cat([h, self.sub_GN.expand(N, g2, 1, Hv)],
                        dim=2).reshape(N, -1, Hv)
        glb = self.glb_GN.expand(N, 1, Hv)
        feats = torch.cat([sub, glb, sub], dim=1)             # sub_glb
        return self.p2(torch.nn.functional.gelu(self.p0(feats)))


@pytest.fixture(scope="module")
def p4_pair():
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    lm_keys = ("vocab_size", "hidden_size", "num_hidden_layers",
               "num_attention_heads", "num_key_value_heads",
               "intermediate_size", "rms_norm_eps", "rope_theta",
               "partial_rotary_factor", "max_position_embeddings",
               "pad_token_id",
               "tie_word_embeddings")
    lm = Phi3ForCausalLM(Phi3Config(
        **{k: P4_CFG[k] for k in lm_keys})).eval()
    vt = _TorchPhi4Tower(VISION, P4_CFG["hidden_size"]).eval()
    for p in vt.parameters():
        if p.dim() > 1:
            torch.nn.init.normal_(p, std=0.1)

    sd = dict(lm.state_dict())          # plain model.* keys
    ie = "model.embed_tokens_extend.image_embed."
    sd[ie + "img_processor.embeddings.patch_embedding.weight"] = \
        vt.conv.weight
    sd[ie + "img_processor.embeddings.patch_embedding.bias"] = vt.conv.bias
    sd[ie + "img_processor.embeddings.position_embedding.weight"] = \
        vt.pos.weight
    names = dict(ln1="layer_norm1", ln2="layer_norm2",
                 q="self_attn.q_proj", k="self_attn.k_proj",
                 v="self_attn.v_proj", o="self_attn.out_proj",
                 fc1="mlp.fc1", fc2="mlp.fc2")
    for i, blk in enumerate(vt.layers):
        for short, full in names.items():
            for pn, p in blk[short].state_dict().items():
                sd[f"{ie}img_processor.encoder.layers.{i}.{full}.{pn}"] = p
    sd[ie + "glb_GN"] = vt.glb_GN
    sd[ie + "sub_GN"] = vt.sub_GN
    for nm, mod in (("0", vt.p0), ("2", vt.p2)):
        for pn, p in mod.state_dict().items():
            sd[f"{ie}img_projection.{nm}.{pn}"] = p

    runner, mc, sa = make_runner(P4_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    torch.manual_seed(7)
    pixel = torch.randn(2, 3, 56, 56)
    return lm, vt, runner, sa, pixel


def test_phi4mm_image_features_match_oracle(p4_pair):
    lm, vt, runner, sa, pixel = p4_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    with torch.no_grad():
        ref = vt(pixel).float().numpy()
    assert ours.shape == ref.shape == (2, N_TOK, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_phi4mm_prefill_logits_match_oracle(p4_pair):
    lm, vt, runner, sa, pixel = p4_pair
    with torch.no_grad():
        img_rows = vt(pixel[:1])[0]                    # [13, H]
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


def test_phi4mm_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://p4mm", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=P4_CFG)
    img = np.zeros((64, 48, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8], [9, 10, 11]],
        image_data=[img, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + N_TOK
