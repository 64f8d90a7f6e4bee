"""Qwen2-Audio golden gates: (1) numpy Whisper log-mel vs HF
WhisperFeatureExtractor, (2) audio tower + projector + LM logits vs HF
Qwen2AudioForConditionalGeneration, (3) end-to-end engine drive with a raw
waveform (reference srt/models/qwen2_audio.py)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, load_hf_weights_into, make_runner

AUDIO_TOK = 151646 % 256   # tiny vocab: use id 60

TEXT = dict(model_type="qwen2", hidden_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            intermediate_size=128, vocab_size=256, rms_norm_eps=1e-6,
            rope_theta=10000.0, max_position_embeddings=2048,
            tie_word_embeddings=False)

AUDIO = dict(num_mel_bins=32, d_model=32, encoder_layers=2,
             encoder_attention_heads=4, encoder_ffn_dim=64,
             max_source_positions=1500, model_type="qwen2_audio_encoder")

QA_CFG = dict(
    architectures=["Qwen2AudioForConditionalGeneration"],
    model_type="qwen2_audio",
    text_config=TEXT, audio_config=AUDIO, audio_token_index=AUDIO_TOK,
)


def test_whisper_log_mel_matches_hf():
    from transformers import WhisperFeatureExtractor

    from iaas_sglang_tpu.multimodal.audio import whisper_log_mel

    rng = np.random.default_rng(0)
    wave = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    fe = WhisperFeatureExtractor(feature_size=32)
    ref = fe(wave, sampling_rate=16000,
             return_tensors="np").input_features[0]     # [32, 3000]
    ours, valid = whisper_log_mel(wave, n_mels=32)
    assert ours.shape == ref.shape
    assert valid == 16000 * 2 // 160
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.fixture(scope="module")
def qa_pair():
    from transformers import (Qwen2AudioConfig,
                              Qwen2AudioForConditionalGeneration)

    cfg = Qwen2AudioConfig(audio_config=AUDIO, text_config=TEXT,
                           audio_token_index=AUDIO_TOK)
    torch.manual_seed(0)
    hf = Qwen2AudioForConditionalGeneration(cfg).eval()
    runner, mc, sa = make_runner(QA_CFG)
    load_hf_weights_into(runner, hf)
    torch.manual_seed(7)
    mel = torch.randn(1, 32, 3000)
    return hf, runner, sa, mel


def test_qwen2_audio_features_match_hf(qa_pair):
    hf, runner, sa, mel = qa_pair
    ours = np.asarray(runner.encode_images(mel.numpy()), np.float32)
    with torch.no_grad():
        enc = hf.audio_tower(mel).last_hidden_state
        ref = hf.multi_modal_projector(enc).float().numpy()
    assert ours.shape == ref.shape == (1, 750, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_qwen2_audio_prefill_logits_match_hf(qa_pair):
    hf, runner, sa, mel = qa_pair
    rows = np.asarray(runner.encode_images(mel.numpy()), np.float32)[0]
    span = 5
    prompt = [3] + [0] * span + [94, 201]
    driver = RawDriver(runner, sa.page_size)
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    T = len(prompt)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(prompt, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.mm_embeds = rows[:span]
    hb.mm_positions = np.arange(1, 1 + span, dtype=np.int32)
    ours = runner.forward_all_logits(hb)

    with torch.no_grad():
        lm = hf.language_model if hasattr(hf, "language_model") else hf.model
        emb = hf.get_input_embeddings()(torch.tensor([prompt]))
        emb[0, 1 : 1 + span] = torch.tensor(rows[:span])
        out = hf(inputs_embeds=emb)
    ref = out.logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_qwen2_audio_engine_generate():
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://qa", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=512, random_seed=0), hf_config_override=QA_CFG)
    wave = np.sin(np.linspace(0, 440 * 2 * np.pi, 16000)).astype(np.float32)
    outs = eng.generate(
        input_ids=[[5, AUDIO_TOK, 7, 8]],
        audio_data=[wave],
        sampling_params={"max_new_tokens": 4, "temperature": 0.0})
    assert len(outs[0]["output_ids"]) == 4
    # 1 s clip -> (100-1)//2+1=50 -> (50-2)//2+1=25 rows + 3 text tokens
    assert outs[0]["meta_info"]["prompt_tokens"] == 3 + 25
