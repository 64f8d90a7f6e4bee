"""Gemma 3n golden gate vs HF Gemma3nForCausalLM: AltUp streams, laurel,
per-layer embeddings, KV sharing (last layers read earlier layers' pages),
activation sparsity, weightless v-norm, scale-1.0 attention, final logit
softcap (reference srt/models/gemma3n_causal.py)."""

import numpy as np
import pytest
import torch

from tests.utils import RawDriver, load_hf_weights_into, make_runner

L = 10
# released pattern: every 5th layer full attention
LAYER_TYPES = ["full_attention" if (i + 1) % 5 == 0 else "sliding_attention"
               for i in range(L)]

G3N_CFG = dict(
    architectures=["Gemma3nForCausalLM"], model_type="gemma3n_text",
    vocab_size=256, vocab_size_per_layer_input=256,
    hidden_size=64, hidden_size_per_layer_input=8,
    num_hidden_layers=L, num_attention_heads=4, num_key_value_heads=2,
    head_dim=16, intermediate_size=[128] * L,
    rms_norm_eps=1e-6, rope_theta=1000000.0, rope_local_base_freq=10000.0,
    max_position_embeddings=512, sliding_window=4,
    layer_types=LAYER_TYPES, num_kv_shared_layers=5,
    altup_num_inputs=4, altup_active_idx=0, altup_coef_clip=120.0,
    altup_correct_scale=True, laurel_rank=8,
    activation_sparsity_pattern=[0.95] * 2 + [0.0] * (L - 2),
    final_logit_softcapping=30.0, hidden_activation="gelu_pytorch_tanh",
    tie_word_embeddings=True,
)

PROMPT = [3, 17, 94, 201, 5, 40, 7, 190, 2, 55, 11, 80]


@pytest.fixture(scope="module")
def g3n_pair():
    from transformers import Gemma3nTextConfig, Gemma3nForCausalLM

    cfg = Gemma3nTextConfig(
        **{k: v for k, v in G3N_CFG.items()
           if k not in ("architectures", "model_type")})
    cfg._attn_implementation = "eager"
    torch.manual_seed(0)
    hf = Gemma3nForCausalLM(cfg).eval()
    runner, mc, sa = make_runner(G3N_CFG)
    load_hf_weights_into(runner, hf)
    return hf, runner, sa


def test_gemma3n_prefill_logits_match_hf(g3n_pair):
    hf, runner, sa = g3n_pair
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    with torch.no_grad():
        # use_cache=True so HF's shared-KV layers read the source layer's
        # freshly written cache (matching cached serving)
        out = hf(torch.tensor([PROMPT]), use_cache=True)
    ref = out.logits[0].float().numpy()
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_gemma3n_greedy_decode_matches_hf(g3n_pair):
    """Token-for-token greedy agreement over a short rollout — exercises
    the decode path's shared-KV reads and sliding windows."""
    hf, runner, sa = g3n_pair
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    eng = Engine(ServerArgs(
        model_path="dummy://g3n", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=1024, skip_tokenizer_init=True,
        random_seed=0), hf_config_override=G3N_CFG)
    eng.scheduler.model_runner.params = runner.params
    outs = eng.generate(
        input_ids=[PROMPT],
        sampling_params={"max_new_tokens": 6, "temperature": 0.0})
    ours = outs[0]["output_ids"]

    with torch.no_grad():
        ref = hf.generate(torch.tensor([PROMPT]), max_new_tokens=6,
                          do_sample=False)[0, len(PROMPT):].tolist()
    assert ours == ref
