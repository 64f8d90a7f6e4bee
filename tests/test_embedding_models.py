"""Embedding-model zoo: BERT bidirectional encoder + classification/reward
heads, golden vs HF and end-to-end through Engine.encode
(reference: test_generation_models.py-style golden + embedding serving)."""

import numpy as np
import pytest

from tests.utils import load_hf_weights_into, make_runner

TINY_BERT = dict(
    architectures=["BertModel"], model_type="bert",
    hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
    intermediate_size=128, vocab_size=256, max_position_embeddings=128,
    type_vocab_size=2, layer_norm_eps=1e-12, hidden_act="gelu",
    pad_token_id=0,
)

TINY_CLS = dict(
    architectures=["LlamaForSequenceClassification"], model_type="llama",
    num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=128, vocab_size=256,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
    tie_word_embeddings=True, num_labels=3,
)


def _hf_bert():
    import torch
    from transformers import BertConfig, BertModel

    torch.manual_seed(0)
    cfg = BertConfig(**{k: v for k, v in TINY_BERT.items()
                        if k != "architectures"})
    return BertModel(cfg).eval()


def test_bert_pooled_matches_hf():
    import torch

    hf = _hf_bert()
    runner, cfg, sa = make_runner(TINY_BERT)
    load_hf_weights_into(runner, hf)

    from iaas_sglang_tpu.mem_cache.allocator import (PageAllocator,
                                                      slots_for_tokens)
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5, 77, 9]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]          # pooled (cls, L2-normed)

    with torch.no_grad():
        out = hf(torch.tensor([ids]))
    ref = out.last_hidden_state[0, 0].float().numpy()   # CLS token
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_bert_engine_encode():
    """End-to-end: Engine.encode on an encoder-only model; similar inputs
    embed closer than dissimilar ones, batch mixes lengths."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://bert", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=8,  # < prompt length: exercises no_chunk
        random_seed=0), hf_config_override=TINY_BERT)
    outs = eng.encode(input_ids=[[5, 6, 7] * 4, [5, 6, 7] * 4, [9] * 5])
    e = [np.asarray(o["embedding"]) for o in outs]
    assert all(abs(np.linalg.norm(v) - 1.0) < 1e-3 for v in e)
    assert np.allclose(e[0], e[1], atol=1e-5)      # identical inputs
    # different inputs differ (dummy weights embed similarly but not equal)
    assert not np.allclose(e[0], e[2], atol=1e-5)
    eng.shutdown()


def test_classification_head_matches_hf():
    import torch
    from transformers import LlamaConfig, LlamaForSequenceClassification

    torch.manual_seed(0)
    cfg = LlamaConfig(**{k: v for k, v in TINY_CLS.items()
                         if k not in ("architectures", "num_labels")},
                      num_labels=3)
    hf = LlamaForSequenceClassification(cfg).eval()

    runner, mc, sa = make_runner(TINY_CLS)
    sd = hf.state_dict()
    # HF stores the body under model.*, the head as score.weight
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, sd)

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]          # [num_labels]

    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_http_cross_encoder_rerank(tmp_path):
    """/v1/rerank with a classification-head model scores (query, doc)
    pairs through the cross-encoder path."""
    import json

    import requests

    from iaas_sglang_tpu.utils import get_open_port
    from tests.server_utils import kill_server, make_tiny_model_dir, \
        popen_launch_server

    model_dir = make_tiny_model_dir(str(tmp_path / "tiny-rerank"))
    cfg = dict(TINY_CLS)
    cfg["vocab_size"] = 512
    cfg["num_labels"] = 1
    with open(f"{model_dir}/config.json", "w") as f:
        json.dump(cfg, f)
    port = get_open_port()
    proc = popen_launch_server(model_dir, port)
    try:
        r = requests.post(
            f"http://127.0.0.1:{port}/v1/rerank",
            json={"query": "what is jax",
                  "documents": ["jax is a library", "bananas are yellow"]},
            timeout=300)
        assert r.status_code == 200, r.text
        out = r.json()
        assert len(out) == 2
        assert {o["index"] for o in out} == {0, 1}
        assert all(isinstance(o["score"], float) for o in out)
        # sorted descending
        assert out[0]["score"] >= out[1]["score"]
    finally:
        kill_server(proc)


# --------------------------------------------------------------- CLIP

def tiny_clip_cfg():
    from transformers import CLIPConfig

    return CLIPConfig(
        text_config=dict(
            hidden_size=64, intermediate_size=128, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=256,
            max_position_embeddings=77, layer_norm_eps=1e-5,
            eos_token_id=255, hidden_act="quick_gelu"),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=28, patch_size=14),
        projection_dim=48)


def _norm(x):
    return x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-12)


def test_clip_text_embedding_matches_hf():
    import torch
    from transformers import CLIPModel

    torch.manual_seed(0)
    hf = CLIPModel(tiny_clip_cfg()).eval()
    from tests.utils import RawDriver, load_hf_weights_into, make_runner

    runner, cfg, sa = make_runner(tiny_clip_cfg().to_dict())
    assert cfg.is_encoder_only and cfg.pooling_type == "last"
    load_hf_weights_into(runner, hf)
    # ends with eos = the LARGEST vocab id, mirroring the real CLIP vocab
    # (HF legacy pooling = argmax of token ids; ours = last-token)
    ids = [5, 17, 94, 42, 255]
    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode

    driver = RawDriver(runner, sa.page_size)
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]
    with torch.no_grad():
        ref = hf.get_text_features(input_ids=torch.tensor([ids]))
    ref = _norm(ref[0].float().numpy())
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=5e-3)


def test_clip_image_embedding_matches_hf():
    import torch
    from transformers import CLIPModel

    torch.manual_seed(0)
    hf = CLIPModel(tiny_clip_cfg()).eval()
    from tests.utils import load_hf_weights_into, make_runner

    runner, cfg, sa = make_runner(tiny_clip_cfg().to_dict())
    load_hf_weights_into(runner, hf)
    torch.manual_seed(3)
    pixel = torch.randn(2, 3, 28, 28)
    ours = runner.embed_image_vec(pixel.numpy())
    with torch.no_grad():
        ref = hf.get_image_features(pixel_values=pixel)
    ref = _norm(ref.float().numpy())
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=5e-3)


def test_engine_clip_text_and_image_embeddings():
    import base64
    import io

    from PIL import Image

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    rng = np.random.default_rng(0)
    img = Image.fromarray(
        rng.integers(0, 255, (40, 52, 3), dtype=np.uint8), "RGB")
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    b64 = "data:image/png;base64," + base64.b64encode(
        buf.getvalue()).decode()

    sa = ServerArgs(model_path="dummy://clip", load_format="dummy",
                    dtype="float32", page_size=4, max_total_tokens=512,
                    device="cpu", max_running_requests=8,
                    max_prefill_tokens=128, chunked_prefill_size=32,
                    skip_tokenizer_init=True, random_seed=0)
    eng = Engine(sa, hf_config_override=tiny_clip_cfg().to_dict())
    t = eng.encode(input_ids=[[5, 17, 94, 2]])
    assert len(t) == 1 and len(t[0]["embedding"]) == 48
    assert abs(np.linalg.norm(t[0]["embedding"]) - 1.0) < 1e-4
    im = eng.encode(input_ids=[[0]], image_data=[b64])
    assert len(im[0]["embedding"]) == 48
    assert abs(np.linalg.norm(im[0]["embedding"]) - 1.0) < 1e-4
    eng.shutdown()


def test_gemma2_sequence_classification_matches_hf():
    import torch
    import transformers
    from transformers import AutoModelForSequenceClassification

    cfg = transformers.Gemma2Config(
        num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, max_position_embeddings=512, rms_norm_eps=1e-6,
        query_pre_attn_scalar=16, sliding_window=8, num_labels=3,
        attn_logit_softcapping=None, final_logit_softcapping=None,
        pad_token_id=0)
    cfg._attn_implementation = "eager"
    cfg.architectures = ["Gemma2ForSequenceClassification"]
    torch.manual_seed(0)
    hf = AutoModelForSequenceClassification.from_config(cfg).eval()

    hf_dict = cfg.to_dict()
    hf_dict["architectures"] = ["Gemma2ForSequenceClassification"]
    runner, mc, sa = make_runner(hf_dict)
    assert mc.num_labels == 3
    load_hf_weights_into(runner, hf)

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]
    import torch as _t

    with _t.no_grad():
        ref = hf(input_ids=_t.tensor([ids])).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_qwen2_reward_two_layer_head():
    """Qwen2ForRewardModel: Linear+ReLU+Linear score head over the
    last-token hidden (reference models/qwen2_rm.py)."""
    import torch
    import transformers
    from transformers import AutoModelForCausalLM

    cfg = transformers.Qwen2Config(
        num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512, rms_norm_eps=1e-6,
        tie_word_embeddings=False)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    base = AutoModelForCausalLM.from_config(cfg).eval()
    sd = dict(base.state_dict())
    torch.manual_seed(1)
    w0, b0 = torch.randn(64, 64) * 0.1, torch.randn(64) * 0.1
    w2, b2 = torch.randn(1, 64) * 0.1, torch.randn(1) * 0.1
    sd.update({"score.0.weight": w0, "score.0.bias": b0,
               "score.2.weight": w2, "score.2.bias": b2})

    hf_dict = cfg.to_dict()
    hf_dict["architectures"] = ["Qwen2ForRewardModel"]
    runner, mc, sa = make_runner(hf_dict)
    assert mc.num_labels == 1 and mc.reward_head_2layer
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, mc, runner.mesh_ctx, sd)

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]
    import torch as _t

    with _t.no_grad():
        h = base.model(input_ids=_t.tensor([ids])).last_hidden_state[0, -1]
        ref = (_t.relu(h @ w0.T + b0) @ w2.T + b2).float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


# ------------------------------------------------- cross-encoder heads


def test_bert_sequence_classification_matches_hf():
    """BertForSequenceClassification (reference models/bert.py cross-encoder
    rerankers): bert.-prefixed body keys + pooler + classifier."""
    import torch
    from transformers import BertConfig, BertForSequenceClassification

    torch.manual_seed(0)
    cfg = BertConfig(**{k: v for k, v in TINY_BERT.items()
                        if k != "architectures"}, num_labels=1)
    hf = BertForSequenceClassification(cfg).eval()

    hf_dict = dict(TINY_BERT, architectures=["BertForSequenceClassification"],
                   num_labels=1)
    runner, mc, sa = make_runner(hf_dict)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, hf.state_dict())

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5, 77, 9]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]

    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_xlmr_sequence_classification_matches_hf():
    """XLMRobertaForSequenceClassification (bge-reranker style): roberta
    classification head (dense->tanh->out_proj over CLS) + position offset."""
    import torch
    from transformers import (XLMRobertaConfig,
                              XLMRobertaForSequenceClassification)

    torch.manual_seed(0)
    geom = {k: v for k, v in TINY_BERT.items()
            if k not in ("architectures", "pad_token_id")}
    cfg = XLMRobertaConfig(**geom, num_labels=1, pad_token_id=1)
    hf = XLMRobertaForSequenceClassification(cfg).eval()

    hf_dict = dict(TINY_BERT, model_type="xlm-roberta", pad_token_id=1,
                   architectures=["XLMRobertaForSequenceClassification"],
                   num_labels=1)
    runner, mc, sa = make_runner(hf_dict)
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, hf.state_dict())

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]

    with torch.no_grad():
        ref = hf(torch.tensor([ids])).logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_contriever_mean_pooling_matches_hf():
    """Contriever = BERT body + mean pooling (reference models/bert.py)."""
    import torch

    hf = _hf_bert()
    hf_dict = dict(TINY_BERT, architectures=["Contriever"])
    runner, mc, sa = make_runner(hf_dict)
    assert mc.pooling_type == "mean"
    load_hf_weights_into(runner, hf)

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5, 77, 9]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]

    with torch.no_grad():
        out = hf(torch.tensor([ids])).last_hidden_state[0].float().numpy()
    ref = out.mean(axis=0)
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_llama_embedding_model_normalized():
    """LlamaEmbeddingModel/MistralModel (reference models/llama_embedding.py):
    causal LM body, LAST pooling, L2-normalized."""
    import torch
    from transformers import LlamaConfig, LlamaModel

    geom = dict(num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
                num_key_value_heads=2, intermediate_size=128, vocab_size=256,
                max_position_embeddings=512, rms_norm_eps=1e-6,
                rope_theta=10000.0)
    torch.manual_seed(0)
    cfg = LlamaConfig(**geom)
    cfg._attn_implementation = "eager"
    hf = LlamaModel(cfg).eval()

    hf_dict = dict(geom, architectures=["LlamaEmbeddingModel"],
                   model_type="llama", tie_word_embeddings=True)
    runner, mc, sa = make_runner(hf_dict)
    assert mc.normalize_pooled
    sd = {"model." + k: v for k, v in hf.state_dict().items()}
    from iaas_sglang_tpu.model_loader.loader import (
        load_params_from_state_dict,
    )

    runner.params = load_params_from_state_dict(
        runner.model, runner.model_config, runner.mesh_ctx, sd)

    from iaas_sglang_tpu.mem_cache.allocator import slots_for_tokens
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from tests.utils import RawDriver

    driver = RawDriver(runner, sa.page_size)
    ids = [3, 17, 94, 201, 5]
    T = len(ids)
    pages = driver.alloc.alloc(-(-T // driver.ps))
    hb = driver._mk(ForwardMode.EXTEND, np.asarray(ids, np.int32),
                    np.arange(T, dtype=np.int32),
                    slots_for_tokens(pages, 0, T, driver.ps), [pages],
                    np.array([T], np.int32), np.array([T], np.int32))
    hb.return_hidden = True
    runner.forward(hb)
    ours = np.asarray(hb.hidden_states)[0]

    with torch.no_grad():
        ref = hf(torch.tensor([ids])).last_hidden_state[0, -1].float().numpy()
    ref = ref / np.linalg.norm(ref)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)
