"""MiniCPM-O golden gate: the Whisper audio branch (padding + chunked
attention masks, final layer_norm, linear1-ReLU-linear2 projector,
AvgPool1d(audio_pool_step)) vs a torch oracle replicating the reference
modules (srt/models/minicpmo.py MiniCPMWhisperEncoder + MultiModalProjector
+ get_audio_embedding), plus a dual-modality (image + audio) engine drive.
The vision branch is MiniCPM-V's (tested in test_minicpmv.py)."""

import numpy as np
import pytest
import torch

from tests.test_minicpmv import VISION, _TorchResampler, _TorchTower

IMG_TOK, AUD_TOK = 250, 251
QUERY_NUM = 4

AUDIO = dict(num_mel_bins=16, d_model=32, encoder_layers=2,
             encoder_attention_heads=4, encoder_ffn_dim=64,
             max_source_positions=1500, model_type="whisper")

MCPMO_CFG = dict(
    architectures=["MiniCPMO"], model_type="minicpmo", version=2.6,
    hidden_size=256, num_hidden_layers=2, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=256, vocab_size=256,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=4096,
    tie_word_embeddings=False,
    vision_config=VISION, query_num=QUERY_NUM,
    drop_vision_last_layer=True, image_token_id=IMG_TOK,
    audio_config=AUDIO, audio_token_id=AUD_TOK,
    audio_pool_step=2, audio_chunk_length=1.0,
)


class _TorchWhisperBranch(torch.nn.Module):
    """MiniCPMWhisperEncoder (+ projector + pool) oracle."""

    def __init__(self, ac, lm_hidden, pool_step):
        super().__init__()
        M, D, I = ac["num_mel_bins"], ac["d_model"], ac["encoder_ffn_dim"]
        self.heads = ac["encoder_attention_heads"]
        self.conv1 = torch.nn.Conv1d(M, D, 3, stride=1, padding=1)
        self.conv2 = torch.nn.Conv1d(D, D, 3, stride=2, padding=1)
        self.pos = torch.nn.Embedding(ac["max_source_positions"], D)
        self.layers = torch.nn.ModuleList()
        for _ in range(ac["encoder_layers"]):
            self.layers.append(torch.nn.ModuleDict(dict(
                ln1=torch.nn.LayerNorm(D), ln2=torch.nn.LayerNorm(D),
                q=torch.nn.Linear(D, D),
                k=torch.nn.Linear(D, D, bias=False),
                v=torch.nn.Linear(D, D), o=torch.nn.Linear(D, D),
                fc1=torch.nn.Linear(D, I), fc2=torch.nn.Linear(I, D))))
        self.ln_post = torch.nn.LayerNorm(D)
        self.linear1 = torch.nn.Linear(D, lm_hidden)
        self.linear2 = torch.nn.Linear(lm_hidden, lm_hidden)
        self.pool_step = pool_step

    def forward(self, mel, conv_valid, chunk_frames):
        h = torch.nn.functional.gelu(self.conv1(mel))
        h = torch.nn.functional.gelu(self.conv2(h)).permute(0, 2, 1)
        T2 = h.shape[1]
        h = h + self.pos.weight[:T2][None]
        i = torch.arange(T2)
        allow = i[None, :] < torch.tensor(conv_valid)[:, None]  # [N, T2]
        allow = allow[:, None, None, :].expand(-1, 1, T2, T2)
        if chunk_frames > 0:
            chunk_end = (i // chunk_frames + 1) * chunk_frames
            allow = allow & (i[None, :] < chunk_end[:, None])[None, None]
        bias = torch.where(allow, 0.0, float("-inf"))
        N = h.shape[0]
        D = h.shape[-1]
        Dh = D // self.heads
        for blk in self.layers:
            r = blk["ln1"](h)
            q = blk["q"](r).view(N, T2, self.heads, Dh).transpose(1, 2)
            k = blk["k"](r).view(N, T2, self.heads, Dh).transpose(1, 2)
            v = blk["v"](r).view(N, T2, self.heads, Dh).transpose(1, 2)
            s = q @ k.transpose(-1, -2) * Dh ** -0.5 + bias
            ctx = (torch.softmax(s, -1) @ v).transpose(1, 2).reshape(
                N, T2, D)
            h = h + blk["o"](ctx)
            h = h + blk["fc2"](torch.nn.functional.gelu(
                blk["fc1"](blk["ln2"](h))))
        h = self.ln_post(h)
        x = self.linear2(torch.relu(self.linear1(h)))
        x = torch.nn.functional.avg_pool1d(
            x.transpose(1, 2), self.pool_step, self.pool_step)
        return x.transpose(1, 2)


@pytest.fixture(scope="module")
def mcpmo_pair():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    from tests.utils import make_runner

    torch.manual_seed(0)
    text_keys = ("hidden_size", "num_hidden_layers", "num_attention_heads",
                 "num_key_value_heads", "intermediate_size", "vocab_size",
                 "rms_norm_eps", "rope_theta", "max_position_embeddings",
                 "tie_word_embeddings")
    lm = Qwen2ForCausalLM(Qwen2Config(
        **{k: MCPMO_CFG[k] for k in text_keys})).eval()
    tower = _TorchTower(VISION, keep_layers=1).eval()
    rs = _TorchResampler(MCPMO_CFG["hidden_size"], VISION["hidden_size"],
                         QUERY_NUM, heads=2).eval()
    apm = _TorchWhisperBranch(AUDIO, MCPMO_CFG["hidden_size"],
                              pool_step=2).eval()
    for p in list(tower.parameters()) + list(rs.parameters()) \
            + list(apm.parameters()):
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
    sd["apm.conv1.weight"] = apm.conv1.weight
    sd["apm.conv1.bias"] = apm.conv1.bias
    sd["apm.conv2.weight"] = apm.conv2.weight
    sd["apm.conv2.bias"] = apm.conv2.bias
    sd["apm.embed_positions.weight"] = apm.pos.weight
    sd["apm.layer_norm.weight"] = apm.ln_post.weight
    sd["apm.layer_norm.bias"] = apm.ln_post.bias
    wnames = dict(ln1="self_attn_layer_norm", ln2="final_layer_norm",
                  q="self_attn.q_proj", k="self_attn.k_proj",
                  v="self_attn.v_proj", o="self_attn.out_proj",
                  fc1="fc1", fc2="fc2")
    for i, blk in enumerate(apm.layers):
        for short, full in wnames.items():
            for pn, p in blk[short].state_dict().items():
                sd[f"apm.layers.{i}.{full}.{pn}"] = p
    for nm, mod in (("linear1", apm.linear1), ("linear2", apm.linear2)):
        for pn, p in mod.state_dict().items():
            sd[f"audio_projection_layer.{nm}.{pn}"] = p

    runner, mc, sa = make_runner(MCPMO_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    return lm, tower, rs, apm, runner, sa


def test_minicpmo_audio_features_match_oracle(mcpmo_pair):
    """1.2 s clip: padding mask (valid 120 mel frames -> 60 conv frames)
    and chunked attention (audio_chunk_length=1.0 -> 50-frame chunks) both
    engaged; compare the clip's 30 pooled LM rows."""
    from iaas_sglang_tpu.models.minicpmo import minicpmo_audio_tokens
    from iaas_sglang_tpu.multimodal.audio import whisper_log_mel

    lm, tower, rs, apm, runner, sa = mcpmo_pair
    rng = np.random.default_rng(3)
    wave = (rng.standard_normal(int(16000 * 1.2)) * 0.1).astype(np.float32)
    mel, valid = whisper_log_mel(wave, n_mels=16)
    assert valid == 120
    n_tok = minicpmo_audio_tokens(valid, 2)
    assert n_tok == 30

    mel_b = mel[None]                                   # [1, 16, 3000]
    ours = np.asarray(runner.model.encode_audio(
        runner.params, runner.model.patchify_audio(mel_b),
        np.asarray([valid], np.int32)), np.float32)
    with torch.no_grad():
        ref = apm(torch.tensor(mel_b), [(valid - 1) // 2 + 1],
                  chunk_frames=50).float().numpy()
    assert ours.shape == ref.shape == (1, 750, 256)
    np.testing.assert_allclose(ours[:, :n_tok], ref[:, :n_tok],
                               rtol=2e-3, atol=5e-3)


def test_minicpmo_image_features_still_match(mcpmo_pair):
    """The inherited vision branch must survive the -O weight layout."""
    lm, tower, rs, apm, runner, sa = mcpmo_pair
    torch.manual_seed(7)
    pixel = torch.randn(1, 3, 56, 56)
    ours = np.asarray(runner.encode_images(pixel.numpy()), np.float32)
    with torch.no_grad():
        ref = rs(tower(pixel), grid=4).float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_minicpmo_engine_dual_modality():
    """One prompt carrying BOTH an image and an audio clip; spans expand
    to query_num=4 and 25 rows (1 s clip) respectively."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://minicpmo", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=MCPMO_CFG)
    img = np.zeros((64, 48, 3), np.uint8)
    wave = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    outs = eng.generate(
        input_ids=[[5, IMG_TOK, 7, AUD_TOK, 8], [9, 10, 11]],
        image_data=[img, None],
        audio_data=[wave, None],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert len(outs[1]["output_ids"]) == 4
    # 3 text + 4 image rows + 25 audio rows ((100-1)//2+1=50 -> (50-2)//2+1)
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + 4 + 25
    assert outs[1]["meta_info"]["prompt_tokens"] == 3
