"""MiniCPM-V golden gate: Idefics2/NaViT SigLIP tower (bucketized position
ids, biased qkv, gelu-tanh MLP, drop_vision_last_layer, post_layernorm) +
perceiver Resampler (ln_kv(kv_proj) keys + additive 2D sincos, fused
MultiheadAttention, ln_post + raw proj) vs a torch oracle replicating the
reference modules (srt/models/minicpmv.py, srt/models/idefics2.py)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, make_runner

IMG_TOK = 250
QUERY_NUM = 4

VISION = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
              num_attention_heads=4, image_size=70, patch_size=14,
              layer_norm_eps=1e-6, serving_image_size=56)
# trained side 5, serving grid 4 -> exercises bucketized position ids

MCPM_CFG = dict(
    architectures=["MiniCPMV"], model_type="minicpmv", version=2.6,
    # flat LM fields (qwen2 for 2.6) — MiniCPM-V configs are flat
    hidden_size=256, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=256, vocab_size=256,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
    tie_word_embeddings=False,
    vision_config=VISION, query_num=QUERY_NUM,
    drop_vision_last_layer=True, image_token_id=IMG_TOK,
)


def _ref_sincos_2d(D, h, w):
    """Reference get_2d_sincos_pos_embed version (2,5) (minicpmv.py:93):
    meshgrid(w, h) -> grid[0] carries the COLUMN coordinate and feeds the
    first half of the embedding."""

    def one(dim, pos):
        omega = 1.0 / 10000 ** (
            np.arange(dim // 2, dtype=np.float64) / (dim / 2))
        out = np.einsum("p,d->pd", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=-1)

    grid = np.stack(np.meshgrid(np.arange(w, dtype=np.float32),
                                np.arange(h, dtype=np.float32)), axis=0)
    return np.concatenate([one(D // 2, grid[0]), one(D // 2, grid[1])],
                          axis=-1)                       # [h*w, D]


class _TorchTower(torch.nn.Module):
    """Idefics2VisionTransformer oracle (idefics2.py:268), one kept layer."""

    def __init__(self, vc, keep_layers):
        super().__init__()
        Hv, Iv, p = vc["hidden_size"], vc["intermediate_size"], \
            vc["patch_size"]
        side = vc["image_size"] // p
        self.heads = vc["num_attention_heads"]
        self.conv = torch.nn.Conv2d(3, Hv, p, stride=p)
        self.pos = torch.nn.Embedding(side * side, Hv)
        self.layers = torch.nn.ModuleList()
        for _ in range(vc["num_hidden_layers"]):
            blk = torch.nn.ModuleDict(dict(
                ln1=torch.nn.LayerNorm(Hv, eps=1e-6),
                ln2=torch.nn.LayerNorm(Hv, eps=1e-6),
                q=torch.nn.Linear(Hv, Hv), k=torch.nn.Linear(Hv, Hv),
                v=torch.nn.Linear(Hv, Hv), o=torch.nn.Linear(Hv, Hv),
                fc1=torch.nn.Linear(Hv, Iv), fc2=torch.nn.Linear(Iv, Hv)))
            self.layers.append(blk)
        self.post_ln = torch.nn.LayerNorm(Hv, eps=1e-6)
        self.keep = keep_layers
        self.side, self.patch = side, p

    def pos_ids(self, grid):
        bounds = torch.arange(1, self.side) / self.side
        frac = torch.arange(0, 1 - 1e-6, 1 / grid)
        b = torch.bucketize(frac, bounds, right=True)
        return (b[:, None] * self.side + b[None, :]).reshape(-1)

    def forward(self, pixel):
        grid = pixel.shape[-1] // self.patch
        h = self.conv(pixel).flatten(2).transpose(1, 2)
        h = h + self.pos(self.pos_ids(grid))[None]
        N, P, Hv = h.shape
        Dh = Hv // self.heads
        for blk in self.layers[:self.keep]:
            r = blk["ln1"](h)
            q = blk["q"](r).view(N, P, self.heads, Dh).transpose(1, 2)
            k = blk["k"](r).view(N, P, self.heads, Dh).transpose(1, 2)
            v = blk["v"](r).view(N, P, self.heads, Dh).transpose(1, 2)
            a = torch.softmax(q @ k.transpose(-1, -2) * Dh ** -0.5, -1)
            ctx = (a @ v).transpose(1, 2).reshape(N, P, Hv)
            h = h + blk["o"](ctx)
            r = blk["ln2"](h)
            h = h + blk["fc2"](torch.nn.functional.gelu(
                blk["fc1"](r), approximate="tanh"))
        return self.post_ln(h)


class _TorchResampler(torch.nn.Module):
    """Resampler2_5 oracle (minicpmv.py:309)."""

    def __init__(self, D, Hv, Q, heads):
        super().__init__()
        self.query = torch.nn.Parameter(torch.randn(Q, D) * 0.1)
        self.kv_proj = torch.nn.Linear(Hv, D, bias=False)
        self.attn = torch.nn.MultiheadAttention(D, heads, batch_first=True)
        self.ln_q = torch.nn.LayerNorm(D)
        self.ln_kv = torch.nn.LayerNorm(D)
        self.ln_post = torch.nn.LayerNorm(D)
        self.proj = torch.nn.Parameter(torch.randn(D, D) * 0.1)

    def forward(self, x, grid):
        N = x.shape[0]
        kv = self.ln_kv(self.kv_proj(x))
        q = self.ln_q(self.query)[None].expand(N, -1, -1)
        pos = torch.tensor(_ref_sincos_2d(q.shape[-1], grid, grid),
                           dtype=torch.float32)[None]
        out, _ = self.attn(q, kv + pos, kv)
        return self.ln_post(out) @ self.proj


@pytest.fixture(scope="module")
def mcpm_pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    torch.manual_seed(0)
    text_keys = ("hidden_size", "num_hidden_layers", "num_attention_heads",
                 "num_key_value_heads", "intermediate_size", "vocab_size",
                 "rms_norm_eps", "rope_theta", "max_position_embeddings",
                 "tie_word_embeddings")
    lm = Qwen2ForCausalLM(Qwen2Config(
        **{k: MCPM_CFG[k] for k in text_keys})).eval()
    tower = _TorchTower(VISION, keep_layers=1).eval()
    rs = _TorchResampler(MCPM_CFG["hidden_size"], VISION["hidden_size"],
                         QUERY_NUM, heads=2).eval()
    for p in list(tower.parameters()) + list(rs.parameters()):
        if p.dim() > 1:
            torch.nn.init.normal_(p, std=0.1)

    sd = {f"llm.{k}": v for k, v in lm.state_dict().items()}
    sd["vpm.embeddings.patch_embedding.weight"] = tower.conv.weight
    sd["vpm.embeddings.patch_embedding.bias"] = tower.conv.bias
    sd["vpm.embeddings.position_embedding.weight"] = tower.pos.weight
    sd["vpm.post_layernorm.weight"] = tower.post_ln.weight
    sd["vpm.post_layernorm.bias"] = tower.post_ln.bias
    names = dict(ln1="layer_norm1", ln2="layer_norm2",
                 q="self_attn.q_proj", k="self_attn.k_proj",
                 v="self_attn.v_proj", o="self_attn.out_proj",
                 fc1="mlp.fc1", fc2="mlp.fc2")
    for i, blk in enumerate(tower.layers):
        for short, full in names.items():
            for pn, p in blk[short].state_dict().items():
                sd[f"vpm.encoder.layers.{i}.{full}.{pn}"] = p
    sd["resampler.query"] = rs.query
    sd["resampler.kv_proj.weight"] = rs.kv_proj.weight
    sd["resampler.attn.in_proj_weight"] = rs.attn.in_proj_weight
    sd["resampler.attn.in_proj_bias"] = rs.attn.in_proj_bias
    sd["resampler.attn.out_proj.weight"] = rs.attn.out_proj.weight
    sd["resampler.attn.out_proj.bias"] = rs.attn.out_proj.bias
    for nm, mod in (("ln_q", rs.ln_q), ("ln_kv", rs.ln_kv),
                    ("ln_post", rs.ln_post)):
        sd[f"resampler.{nm}.weight"] = mod.weight
        sd[f"resampler.{nm}.bias"] = mod.bias
    sd["resampler.proj"] = rs.proj

    runner, mc, sa = make_runner(MCPM_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    torch.manual_seed(7)
    pixel = torch.randn(2, 3, 56, 56)
    return lm, tower, rs, runner, sa, pixel


def test_minicpmv_image_features_match_oracle(mcpm_pair):
    lm, tower, rs, runner, sa, pixel = mcpm_pair
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    with torch.no_grad():
        ref = rs(tower(pixel), grid=4).float().numpy()
    assert ours.shape == ref.shape == (2, QUERY_NUM, 256)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_minicpmv_prefill_logits_match_oracle(mcpm_pair):
    lm, tower, rs, runner, sa, pixel = mcpm_pair
    with torch.no_grad():
        img_rows = rs(tower(pixel[:1]), grid=4)[0]     # [Q, H]
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


def test_minicpmv_engine_generate_with_image():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://minicpmv", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=MCPM_CFG)
    img = np.zeros((64, 48, 3), np.uint8)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, 8], [9, 10, 11]],
        image_data=[img, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert len(outs[1]["output_ids"]) == 4
