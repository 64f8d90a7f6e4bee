"""Double sparsity (reference double_sparsity_backend.py): decode attends
only the top-k heavy tokens scored by an r-channel label cache."""

import numpy as np
import pytest

from iaas_sglang_tpu.entrypoints.engine import Engine
from iaas_sglang_tpu.server_args import ServerArgs

TINY = dict(
    architectures=["LlamaForCausalLM"], model_type="llama",
    num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=128, vocab_size=512,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=1024,
    tie_word_embeddings=True,
)

PROMPTS = [[1, 2, 3] * 7, [5, 6] * 9, [7] * 5]


def _args(**kw):
    base = dict(model_path="dummy://t", load_format="dummy", dtype="float32",
                page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
                chunked_prefill_size=32, random_seed=0)
    base.update(kw)
    return ServerArgs(**base)


def _gen(eng, sp):
    rids = [f"ds-{i}" for i in range(len(PROMPTS))]
    return [o["output_ids"] for o in eng.generate(
        input_ids=PROMPTS, sampling_params=sp, rid=rids)]


def test_exact_when_k_covers_context():
    """With heavy_token_num >= every context length the selection is the
    full set — double sparsity must match dense decode token-for-token."""
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    eng0 = Engine(_args(), hf_config_override=TINY)
    base = _gen(eng0, sp)
    eng0.shutdown()
    eng1 = Engine(_args(enable_double_sparsity=True,
                        ds_heavy_channel_num=8,
                        ds_heavy_token_num=4096),
                  hf_config_override=TINY)
    assert _gen(eng1, sp) == base
    eng1.shutdown()


def test_sparse_decode_serves():
    """Aggressively sparse (top-8 tokens): everything still finishes,
    pages balance, and long decode runs past the selection budget."""
    sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}
    eng = Engine(_args(enable_double_sparsity=True,
                       ds_heavy_channel_num=4,
                       ds_heavy_token_num=8),
                 hf_config_override=TINY)
    outs = eng.generate(input_ids=PROMPTS, sampling_params=sp)
    assert all(len(o["output_ids"]) == 24 for o in outs)
    st = eng.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
    eng.shutdown()


def test_incompatible_flags():
    with pytest.raises(ValueError):
        _args(enable_double_sparsity=True, quantization="int4")
    with pytest.raises(ValueError):
        _args(enable_double_sparsity=True, pp_size=2)
