"""Dedicated ep mesh axis (VERDICT r1 item 5; reference ep_size separate
from tp_size, layers/moe/ep_moe/layer.py:148): with ep_size > tp_size the
mesh grows a third axis (dp, ep, tp) and expert stacks shard over the
("ep", "tp") super-axis — the pod shape where ep rides DCN across hosts
while attention TP stays on ICI.

Greedy parity: dedicated-ep output must match the single-device dense
dispatch token-for-token (CLAUDE.md convention).

Runs on the 8-virtual-device CPU mesh (run_tests.sh)."""

import pytest

from iaas_sglang_tpu.entrypoints.engine import Engine
from iaas_sglang_tpu.server_args import ServerArgs

TINY_MIXTRAL = dict(
    architectures=["MixtralForCausalLM"], model_type="mixtral",
    num_hidden_layers=2, hidden_size=64, num_attention_heads=8,
    num_key_value_heads=4, intermediate_size=64, vocab_size=512,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=1024,
    tie_word_embeddings=False, num_local_experts=8, num_experts_per_tok=2,
)

PROMPTS = [[1, 2, 3] * 7, [5, 6] * 9, [7] * 5]
GREEDY = {"temperature": 0.0, "max_new_tokens": 8, "ignore_eos": True}


def _args(**kw):
    base = dict(model_path="dummy://t", load_format="dummy", page_size=4,
                max_total_tokens=8192, skip_tokenizer_init=True,
                chunked_prefill_size=16, random_seed=0)
    base.update(kw)
    return ServerArgs(**base)


def _gen(eng):
    rids = [f"ep-{i}" for i in range(len(PROMPTS))]
    return [o["output_ids"]
            for o in eng.generate(input_ids=PROMPTS, rid=rids,
                                  sampling_params=[dict(GREEDY)] * 3)]


def test_dedicated_ep_axis_greedy_parity():
    ref_eng = Engine(_args(), hf_config_override=TINY_MIXTRAL)
    ref = _gen(ref_eng)

    # tp=2 x dp=2 x ep_factor=2 = 8 devices; ep_size = ep_factor*tp = 4
    eng = Engine(_args(tp_size=2, dp_size=2, ep_size=4),
                 hf_config_override=TINY_MIXTRAL)
    assert eng.scheduler.model_runner.mesh_ctx.ep_factor == 2
    assert eng.scheduler.model_runner.mesh_ctx.mesh.axis_names == (
        "dp", "ep", "tp")
    assert eng.scheduler.model_runner.model.moe_impl == "ep"
    assert eng.scheduler.model_runner.model.moe_axis == ("ep", "tp")
    got = _gen(eng)
    assert got == ref, f"dedicated-ep divergence:\nref {ref}\ngot {got}"


def test_ep_size_must_divide():
    with pytest.raises(AssertionError):
        Engine(_args(tp_size=2, ep_size=3),
               hf_config_override=TINY_MIXTRAL)
