"""Gemma 3n audio golden gate vs HF: conformer tower
(Gemma3nAudioEncoder: cumulative group-norm subsample convs, chunked
local attention with relative position logits, light conv, half-residual
FFWs), the multimodal embedder soft/hard paths + padding semantics, the
mm input-embedding overrides (hard mm tokens, per-layer id masking), and
an end-to-end waveform engine drive (reference srt/models/gemma3n_mm.py,
gemma3n_audio.py)."""

import numpy as np
import pytest
import torch

from tests.test_gemma3n import G3N_CFG
from tests.utils import RawDriver, make_runner

AUD_TOK = 209          # soft audio placeholder
BOA_TOK = 210          # a hard audio token (>= audio vocab_offset 208)

AUDIO = dict(input_feat_size=16, hidden_size=32,
             conf_num_attention_heads=4, conf_num_hidden_layers=2,
             conf_attention_chunk_size=4, conf_attention_context_left=5,
             conf_attention_context_right=0, conf_attention_logit_cap=50.0,
             conf_conv_kernel_size=3, conf_reduction_factor=2,
             conf_residual_weight=0.5, sscp_conv_channel_size=(8, 4),
             sscp_conv_kernel_size=((3, 3), (3, 3)),
             sscp_conv_stride_size=((2, 2), (2, 2)),
             sscp_conv_group_norm_eps=1e-3, gradient_clipping=10000.0,
             rms_norm_eps=1e-6, vocab_size=16, vocab_offset=208)

VISION_EMB = dict(vocab_size=16, vocab_offset=192, hidden_size=24,
                  rms_norm_eps=1e-6)

TEXT = {k: v for k, v in G3N_CFG.items()
        if k not in ("architectures", "model_type")}
TEXT["vocab_size_per_layer_input"] = 192

G3N_MM_CFG = dict(
    architectures=["Gemma3nForConditionalGeneration"], model_type="gemma3n",
    text_config=dict(TEXT, model_type="gemma3n_text"),
    audio_config=AUDIO, vision_config=VISION_EMB,
    audio_soft_tokens_per_image=6, audio_token_id=AUD_TOK,
    image_token_id=193,
)


@pytest.fixture(scope="module")
def g3n_mm_pair():
    from transformers import Gemma3nTextConfig, Gemma3nForCausalLM
    from transformers.models.gemma3n.configuration_gemma3n import (
        Gemma3nAudioConfig, Gemma3nVisionConfig)
    from transformers.models.gemma3n.modeling_gemma3n import (
        Gemma3nAudioEncoder, Gemma3nMultimodalEmbedder)

    tcfg = Gemma3nTextConfig(**TEXT)
    tcfg._attn_implementation = "eager"
    acfg = Gemma3nAudioConfig(**AUDIO)
    torch.manual_seed(0)
    lm = Gemma3nForCausalLM(tcfg).eval()
    tower = Gemma3nAudioEncoder(acfg).eval()
    emb_a = Gemma3nMultimodalEmbedder(acfg, tcfg).eval()
    vcfg = Gemma3nVisionConfig(
        vocab_size=16, vocab_offset=192, hidden_size=24, rms_norm_eps=1e-6)
    emb_v = Gemma3nMultimodalEmbedder(vcfg, tcfg).eval()
    for m in (tower, emb_a, emb_v):
        for p in m.parameters():
            if p.dim() > 1:
                torch.nn.init.normal_(p, std=0.1)

    sd = {f"model.language_model.{k}": v
          for k, v in lm.model.state_dict().items()}
    sd.update({f"model.audio_tower.{k}": v
               for k, v in tower.state_dict().items()})
    sd.update({f"model.embed_audio.{k}": v
               for k, v in emb_a.state_dict().items()})
    sd.update({f"model.embed_vision.{k}": v
               for k, v in emb_v.state_dict().items()})

    runner, mc, sa = make_runner(G3N_MM_CFG)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx,
        {k: v.detach() for k, v in sd.items()})
    return lm, tower, emb_a, emb_v, runner, sa


def test_gemma3n_audio_rows_match_hf(g3n_mm_pair):
    """Synthetic mel with padding frames: tower + soft embedder + padding
    embedding semantics must match HF Gemma3nModel's audio merge."""
    lm, tower, emb_a, emb_v, runner, sa = g3n_mm_pair
    rng = np.random.default_rng(0)
    T, valid = 32, 20
    mel = rng.standard_normal((1, T, 16)).astype(np.float32) * 0.5

    ours = np.asarray(runner.model.encode_audio(
        runner.params, np.asarray(mel), np.asarray([valid], np.int32)),
        np.float32)

    with torch.no_grad():
        mel_mask = torch.arange(T)[None] >= valid       # True = padding
        audio_out, out_mask = tower(torch.tensor(mel), mel_mask)
        feats = emb_a(inputs_embeds=audio_out)
        pad_emb = emb_a(input_ids=torch.tensor([[AUDIO["vocab_size"] - 1
                                                 + AUDIO["vocab_offset"]]]))
        feats = torch.where(out_mask.unsqueeze(-1), pad_emb, feats)
        S = G3N_MM_CFG["audio_soft_tokens_per_image"]
        extra = pad_emb.expand(1, S - feats.shape[1], feats.shape[-1])
        ref = torch.cat([feats, extra], dim=1).float().numpy()
    assert ours.shape == ref.shape == (1, 6, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_gemma3n_mm_prefill_logits_match_hf(g3n_mm_pair):
    """Full prefill with audio rows scattered in AND a hard audio token:
    matches HF text model fed the mm-merged inputs_embeds + masked
    per-layer ids."""
    lm, tower, emb_a, emb_v, runner, sa = g3n_mm_pair
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 24, 16)).astype(np.float32) * 0.5
    rows = np.asarray(runner.model.encode_audio(
        runner.params, np.asarray(mel), np.asarray([24], np.int32)),
        np.float32)[0]                                   # [6, H]

    S = rows.shape[0]
    prompt = [3, BOA_TOK] + [0] * S + [94, 5]
    driver = RawDriver(runner, sa.page_size)
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(prompt)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(prompt, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = rows
    hb.mm_positions = np.arange(2, 2 + S, dtype=np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        ids = torch.tensor([prompt])
        emb = lm.model.embed_tokens(ids)        # scaled word embedding
        emb[0, 1] = emb_a(input_ids=torch.tensor([BOA_TOK]))[0]
        emb[0, 2 : 2 + S] = torch.tensor(rows)
        masked = torch.where(ids < TEXT["vocab_size_per_layer_input"],
                             ids, torch.zeros_like(ids))
        # soft positions use per-layer row 0 (HF zeroes their ids)
        masked[0, 2 : 2 + S] = 0
        pli = lm.model.get_per_layer_inputs(masked)
        out = lm(inputs_embeds=emb, per_layer_inputs=pli, use_cache=True)
    ref = out.logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_gemma3n_engine_generate_with_audio():
    """Waveform through the HF feature extractor and the engine; images
    are rejected with a clear error."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    cfg = dict(G3N_MM_CFG, audio_soft_tokens_per_image=380)
    eng = Engine(ServerArgs(
        model_path="dummy://g3nmm", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=cfg)
    wave = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    outs = eng.generate(
        input_ids=[[5, AUD_TOK, 7, 8]],
        audio_data=[wave],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + 380

    img = np.zeros((32, 32, 3), np.uint8)
    with pytest.raises(Exception, match="timm|not supported"):
        eng.generate(input_ids=[[5, 193, 7]], image_data=[img],
                     sampling_params={"max_new_tokens": 2})
