"""Phi-3-small golden gate: LayerNorm blocks, GQA-interleaved fused
query_key_value (+bias), gegelu fused up_proj with clamp limit, muP
attention/embedding/width scaling and the tiktoken dummy-token logits mask
vs a torch oracle replicating the reference modules
(srt/models/phi3_small.py; no HF-core class exists)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, make_runner

V, H, L, NQ, NK, D, I = 256, 64, 2, 4, 2, 16, 48
LIMIT = 3.0
MUP_ATTN, MUP_EMB, MUP_WIDTH = 1.0, 2.0, 4.0
DUMMY = [250, 251, 255]

P3S_CFG = dict(
    architectures=["Phi3SmallForCausalLM"], model_type="phi3small",
    vocab_size=V, hidden_size=H, num_hidden_layers=L,
    num_attention_heads=NQ, num_key_value_heads=NK, intermediate_size=I,
    layer_norm_epsilon=1e-5, hidden_act="gegelu", gegelu_limit=LIMIT,
    rope_embedding_base=10000.0, rope_position_scale=1.0,
    max_position_embeddings=512, mup_use_scaling=True,
    mup_attn_multiplier=MUP_ATTN, mup_embedding_multiplier=MUP_EMB,
    mup_width_multiplier=MUP_WIDTH, dummy_token_indices=DUMMY,
    tie_word_embeddings=True,
)

PROMPT = [3, 17, 94, 201, 5, 40, 7]


def _rope_neox(x, pos, dim, base=10000.0):
    # x [T, n, dim]
    inv = 1.0 / base ** (torch.arange(0, dim, 2).float() / dim)
    ang = pos[:, None].float() * inv[None]
    cos, sin = torch.cos(ang)[:, None], torch.sin(ang)[:, None]
    x1, x2 = x[..., : dim // 2], x[..., dim // 2:]
    return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], -1)


class _TorchPhi3Small(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.embed = torch.nn.Embedding(V, H)
        self.layers = torch.nn.ModuleList()
        for _ in range(L):
            self.layers.append(torch.nn.ModuleDict(dict(
                ln1=torch.nn.LayerNorm(H, eps=1e-5),
                ln2=torch.nn.LayerNorm(H, eps=1e-5),
                qkv=torch.nn.Linear(H, (NQ + 2 * NK) * D),
                dense=torch.nn.Linear(NQ * D, H),
                up=torch.nn.Linear(H, 2 * I),
                down=torch.nn.Linear(I, H))))
        self.final_ln = torch.nn.LayerNorm(H, eps=1e-5)

    def forward(self, ids):
        h = self.embed(ids) * MUP_EMB
        T = ids.shape[0]
        pos = torch.arange(T)
        g = NQ // NK
        mask = torch.triu(torch.full((T, T), float("-inf")), diagonal=1)
        for blk in self.layers:
            r = blk["ln1"](h)
            qkv = blk["qkv"](r).view(T, NK, g + 2, D)
            q, k, v = qkv.split([g, 1, 1], dim=-2)
            q = q.reshape(T, NQ, D)
            k, v = k.reshape(T, NK, D), v.reshape(T, NK, D)
            q, k = _rope_neox(q, pos, D), _rope_neox(k, pos, D)
            k = k.repeat_interleave(g, dim=1)
            v = v.repeat_interleave(g, dim=1)
            s = torch.einsum("qnd,knd->nqk", q, k) * (MUP_ATTN / D) + mask
            ctx = torch.einsum("nqk,knd->qnd", torch.softmax(s, -1), v)
            h = h + blk["dense"](ctx.reshape(T, NQ * D))
            r2 = blk["ln2"](h)
            gu = blk["up"](r2)
            a_gelu = gu[..., 0::2].clamp(max=LIMIT)
            a_lin = gu[..., 1::2].clamp(-LIMIT, LIMIT)
            inter = a_gelu * torch.sigmoid(1.702 * a_gelu) * (a_lin + 1)
            h = h + blk["down"](inter)
        h = self.final_ln(h)
        logits = (h @ self.embed.weight.T) / MUP_WIDTH
        logits[..., torch.tensor(DUMMY)] = float("-inf")
        return logits


@pytest.fixture(scope="module")
def p3s_pair():
    torch.manual_seed(0)
    m = _TorchPhi3Small().eval()
    for p in m.parameters():
        if p.dim() > 1:
            torch.nn.init.normal_(p, std=0.05)

    sd = {"model.embed_tokens.weight": m.embed.weight}
    for i, blk in enumerate(m.layers):
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = blk["ln1"].weight
        sd[pre + "input_layernorm.bias"] = blk["ln1"].bias
        sd[pre + "post_attention_layernorm.weight"] = blk["ln2"].weight
        sd[pre + "post_attention_layernorm.bias"] = blk["ln2"].bias
        sd[pre + "self_attn.query_key_value.weight"] = blk["qkv"].weight
        sd[pre + "self_attn.query_key_value.bias"] = blk["qkv"].bias
        sd[pre + "self_attn.dense.weight"] = blk["dense"].weight
        sd[pre + "self_attn.dense.bias"] = blk["dense"].bias
        sd[pre + "mlp.up_proj.weight"] = blk["up"].weight
        sd[pre + "mlp.up_proj.bias"] = blk["up"].bias
        sd[pre + "mlp.down_proj.weight"] = blk["down"].weight
        sd[pre + "mlp.down_proj.bias"] = blk["down"].bias
    sd["model.final_layernorm.weight"] = m.final_ln.weight
    sd["model.final_layernorm.bias"] = m.final_ln.bias

    runner, mc, sa = make_runner(P3S_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    return m, runner, sa


def test_phi3small_prefill_logits_match_oracle(p3s_pair):
    m, runner, sa = p3s_pair
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    with torch.no_grad():
        ref = m(torch.tensor(PROMPT)).float().numpy()
    # dummy slots are -inf on both sides; compare finite lanes numerically
    keep = [i for i in range(V) if i not in DUMMY]
    assert np.all(np.isneginf(ours[:, DUMMY]))
    np.testing.assert_allclose(ours[:, keep], ref[:, keep],
                               rtol=2e-2, atol=2e-2)


def test_phi3small_engine_greedy_decode(p3s_pair):
    """Greedy engine drive on dummy weights; dummy tokens never sampled."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://p3s", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=1024, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=P3S_CFG)
    outs = eng.generate(
        input_ids=[PROMPT],
        sampling_params={"max_new_tokens": 8, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 8
    assert not set(outs[0]["output_ids"]) & set(DUMMY)
