"""Pipeline parallelism: layer-partitioned stages on separate devices
(PPModelRunner). Greedy-parity convention: pp>1 must match pp=1
token-for-token. Runs on the 8-virtual-device CPU mesh."""

import numpy as np
import pytest

from iaas_sglang_tpu.entrypoints.engine import Engine
from iaas_sglang_tpu.server_args import ServerArgs

TINY_QWEN = dict(
    architectures=["Qwen2ForCausalLM"], model_type="qwen2",
    num_hidden_layers=4, hidden_size=64, num_attention_heads=8,
    num_key_value_heads=4, intermediate_size=128, vocab_size=512,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=1024,
    tie_word_embeddings=True,
)

PROMPTS = [[1, 2, 3] * 7, [5, 6] * 9, [1, 2, 3] * 7 + [9, 8], [7] * 5]


def _args(**kw):
    base = dict(model_path="dummy://t", load_format="dummy", dtype="float32",
                page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
                chunked_prefill_size=16, random_seed=0)
    base.update(kw)
    return ServerArgs(**base)


def _gen(eng, prompts, sp):
    rids = [f"pp-{i}" for i in range(len(prompts))]
    return [o["output_ids"] for o in eng.generate(
        input_ids=prompts, sampling_params=sp, rid=rids)]


def test_pp_greedy_parity():
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    eng0 = Engine(_args(), hf_config_override=TINY_QWEN)
    base = _gen(eng0, PROMPTS, sp)
    eng0.shutdown()

    for S in (2, 4):
        eng = Engine(_args(pp_size=S), hf_config_override=TINY_QWEN)
        assert _gen(eng, PROMPTS, sp) == base, f"pp={S} diverged"
        # radix reuse under PP: per-stage KV pools share the page table
        outs = eng.generate(input_ids=PROMPTS, sampling_params=sp)
        assert [o["output_ids"] for o in outs] == base
        assert any(o["meta_info"]["cached_tokens"] > 0 for o in outs)
        st = eng.get_internal_state()
        assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
        eng.shutdown()


def test_pp_sampling_and_penalties():
    """Seeded sampling + penalties + logprobs through the PP tail."""
    sp = {"max_new_tokens": 6, "temperature": 0.8, "top_k": 20,
          "frequency_penalty": 0.3}
    eng = Engine(_args(pp_size=2), hf_config_override=TINY_QWEN)
    a = eng.generate(input_ids=PROMPTS[:2], sampling_params=sp,
                     rid=["s-0", "s-1"], return_logprob=True)
    b = eng.generate(input_ids=PROMPTS[:2], sampling_params=sp,
                     rid=["s-0", "s-1"], return_logprob=True)
    assert [o["output_ids"] for o in a] == [o["output_ids"] for o in b]
    assert len(a[0]["meta_info"]["output_token_logprobs"]) == 6
    eng.shutdown()


def test_pp_incompatible_flags():
    with pytest.raises(ValueError):
        _args(pp_size=2, dp_size=2)
    with pytest.raises(ValueError):
        _args(pp_size=2, enable_lora=True)


def test_pp_tp_composition_parity():
    """tp=2 x pp=2 (per-stage TP sub-meshes) must match pp=1 tp=1."""
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    eng0 = Engine(_args(), hf_config_override=TINY_QWEN)
    base = _gen(eng0, PROMPTS, sp)
    eng0.shutdown()
    eng = Engine(_args(pp_size=2, tp_size=2), hf_config_override=TINY_QWEN)
    assert _gen(eng, PROMPTS, sp) == base
    # per-stage weights actually shard over the stage sub-mesh
    runner = eng.scheduler.model_runner
    wq = runner.stage_params[0]["layers"]["wq"]
    assert len(wq.sharding.device_set) == 2
    devs0 = {d.id for d in runner.stage_params[0]["layers"]["wq"].sharding.device_set}
    devs1 = {d.id for d in runner.stage_params[1]["layers"]["wq"].sharding.device_set}
    assert devs0.isdisjoint(devs1)
    eng.shutdown()
