"""Mllama (Llama 3.2 Vision) golden gate vs HF
MllamaForConditionalGeneration: vision tower (gated tile/positional
embeddings, 2-stage encoder, intermediate-state concat), per-request
encoder KV written into the cross layers' page-space slices, gated
cross-attention with per-seq row masking, and the radix bypass for
image-conditioned text KV (reference srt/models/mllama.py)."""

import numpy as np
import pytest
import torch

from tests.utils import load_hf_weights_into, make_runner

V = 248                       # embed table = V + 8 rows; <|image|> = V
IMG_TOK = V

TEXT = dict(
    model_type="mllama_text_model", vocab_size=V, hidden_size=64,
    num_hidden_layers=6, cross_attention_layers=[1, 4],
    num_attention_heads=4, num_key_value_heads=2,
    intermediate_size=128, rms_norm_eps=1e-5, rope_theta=10000.0,
    rope_scaling=dict(rope_type="llama3", factor=8.0, low_freq_factor=1.0,
                      high_freq_factor=4.0,
                      original_max_position_embeddings=256),
    max_position_embeddings=512, pad_token_id=0,
    tie_word_embeddings=False,
)

VISION = dict(
    model_type="mllama_vision_model", hidden_size=32, attention_heads=4,
    intermediate_size=64, num_hidden_layers=3, num_global_layers=2,
    image_size=56, patch_size=14, max_num_tiles=2,
    supported_aspect_ratios=[[1, 1], [1, 2]],
    intermediate_layers_indices=[1, 2], vision_output_dim=96,
    norm_eps=1e-5,
)

MLLAMA_CFG = dict(
    architectures=["MllamaForConditionalGeneration"], model_type="mllama",
    text_config=TEXT, vision_config=VISION, image_token_index=IMG_TOK,
)

PROMPT = [5, IMG_TOK, 7, 8, 40, 2, 19]


def _prep_pixels(img: np.ndarray) -> np.ndarray:
    """Same preprocessing our MultimodalProcessor applies (square resize +
    CLIP stats) so HF sees identical pixels."""
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.multimodal.processor import MultimodalProcessor

    mc = ModelConfig.from_hf(MLLAMA_CFG, model_path="x")
    px, _ = MultimodalProcessor(mc)._prep(img)
    return px                                  # [3, 56, 56]


@pytest.fixture(scope="module")
def mllama_pair():
    from transformers import MllamaConfig, MllamaForConditionalGeneration

    cfg = MllamaConfig(
        vision_config=VISION, text_config=TEXT, image_token_index=IMG_TOK)
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = MllamaForConditionalGeneration(cfg).eval()
    runner, mc, sa = make_runner(MLLAMA_CFG)
    load_hf_weights_into(runner, hf)
    img = (np.random.RandomState(0).rand(80, 60, 3) * 255).astype(np.uint8)
    px = _prep_pixels(img)
    return hf, runner, sa, img, px


def _hf_vision_inputs(px):
    # HF expects num_tiles == max_num_tiles: pad with a zero tile and mask
    pixel = torch.stack([torch.tensor(px),
                         torch.zeros_like(torch.tensor(px))])[None, None]
    ar_ids = torch.tensor([[1]])                       # (1,1) aspect
    ar_mask = torch.tensor([[[1, 0]]], dtype=torch.long)
    return pixel, ar_ids, ar_mask


def _hf_cross_states(hf, px):
    """Oracle encoder rows with the REFERENCE's intermediate-state
    convention (input of layer i, srt/models/mllama.py:272 — matching
    meta/vLLM; HF>=4.52 switched to layer OUTPUTS, so the intermediates
    are captured via pre-hooks instead of output.hidden_states)."""
    vm = hf.model.vision_model
    caps = {}
    handles = []
    for i in (1, 2):
        handles.append(vm.transformer.layers[i].register_forward_pre_hook(
            (lambda i_: lambda m, a, k: caps.__setitem__(
                i_, (a[0] if a else k["hidden_state"])))(i),
            with_kwargs=True))
    pixel, ar_ids, ar_mask = _hf_vision_inputs(px)
    with torch.no_grad():
        out = vm(pixel, ar_ids, ar_mask).last_hidden_state  # [1,1,2,17,96]
    for h in handles:
        h.remove()
    final = out[0, 0, 0, :, :32]                      # tile-0 global out
    inter = torch.stack([caps[1][0, :17], caps[2][0, :17]], dim=-1)
    inter = inter.reshape(17, 64)
    feats = torch.cat([final, inter], dim=-1)         # [17, 96]
    with torch.no_grad():
        return hf.model.multi_modal_projector(feats)  # [17, 64]


def test_mllama_vision_features_match_hf(mllama_pair):
    hf, runner, sa, img, px = mllama_pair
    ours = np.asarray(runner.encode_images(px[None]), np.float32)
    ref = _hf_cross_states(hf, px)[None].float().numpy()
    assert ours.shape == ref.shape == (1, 17, 64)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=5e-3)


def test_mllama_greedy_rollout_matches_hf(mllama_pair):
    """Token-for-token greedy agreement: exercises the encoder-KV write,
    cross-attention reads at prefill AND decode, and gated residuals."""
    hf, runner, sa, img, px = mllama_pair
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://mllama", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=MLLAMA_CFG)
    eng.scheduler.model_runner.params = runner.params
    outs = eng.generate(
        input_ids=[PROMPT], image_data=[img],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0})
    ours = outs[0]["output_ids"]
    # the <|image|> token occupies exactly one prompt position
    assert outs[0]["meta_info"]["prompt_tokens"] == len(PROMPT)

    # HF rollout with the reference-convention cross states fed directly
    # into the text model (greedy loop over a KV cache)
    from transformers.cache_utils import DynamicCache

    cross = _hf_cross_states(hf, px)[None]            # [1, 17, 64]
    with torch.no_grad():
        cache = DynamicCache()
        lmod = hf.model.language_model
        out = lmod(input_ids=torch.tensor([PROMPT]),
                   cross_attention_states=cross,
                   use_cache=True, past_key_values=cache)
        nxt = int(hf.lm_head(out.last_hidden_state)[0, -1].argmax())
        ref = [nxt]
        for _ in range(5):
            out = lmod(input_ids=torch.tensor([[nxt]]),
                       use_cache=True, past_key_values=cache)
            nxt = int(hf.lm_head(out.last_hidden_state)[0, -1].argmax())
            ref.append(nxt)
    assert ours == ref


def test_mllama_text_only_matches_hf(mllama_pair):
    """No image: cross layers are skipped entirely (the reference's
    skip_cross_attention) — must equal HF with fully-masked rows."""
    hf, runner, sa, img, px = mllama_pair
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    prompt = [3, 17, 94, 201, 5, 40]
    eng = Engine(ServerArgs(
        model_path="dummy://mllama-t", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=MLLAMA_CFG)
    eng.scheduler.model_runner.params = runner.params
    outs = eng.generate(
        input_ids=[prompt],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0})
    with torch.no_grad():
        # HF text-only path: cross_attention_states absent -> cross layers
        # contribute nothing only when rows are masked; MllamaForCausalLM
        # skips cross layers without cache, matching our skip
        ref = hf.model.language_model(
            input_ids=torch.tensor([prompt]), use_cache=False)
        logits = hf.lm_head(ref.last_hidden_state)[0]
        # greedy rollout by feeding back argmax
        ids = list(prompt)
        for _ in range(6):
            out = hf.model.language_model(
                input_ids=torch.tensor([ids]), use_cache=False)
            nxt = int(hf.lm_head(out.last_hidden_state)[0, -1].argmax())
            ids.append(nxt)
    assert outs[0]["output_ids"] == ids[len(prompt):]


def test_mllama_mixed_batch_and_page_accounting(mllama_pair):
    """Image + text-only requests in one batch; encoder pages are freed on
    finish (allocator accounting returns to baseline)."""
    hf, runner, sa, img, px = mllama_pair
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://mllama-m", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=2048, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=MLLAMA_CFG)
    eng.scheduler.model_runner.params = runner.params
    solo = eng.generate(
        input_ids=[PROMPT], image_data=[img],
        sampling_params={"max_new_tokens": 5, "temperature": 0.0})
    mixed = eng.generate(
        input_ids=[PROMPT, [9, 10, 11, 12]], image_data=[img, None],
        sampling_params={"max_new_tokens": 5, "temperature": 0.0})
    assert mixed[0]["output_ids"] == solo[0]["output_ids"]
    assert len(mixed[1]["output_ids"]) == 5
    st = eng.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
