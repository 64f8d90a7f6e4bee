"""EPLB: expert-distribution recording + rebalance algorithm
(analog of test_expert_location_updater.py-style logic tests)."""

import numpy as np

from iaas_sglang_tpu.eplb.eplb_algorithms import balancedness, rebalance_experts
from iaas_sglang_tpu.eplb.expert_distribution import ExpertDistributionRecorder


def test_recorder_counts():
    rec = ExpertDistributionRecorder(num_layers=2, num_experts=4)
    rec.start_record()
    rec.on_select_experts(0, np.array([[0, 1], [0, 2]]))
    rec.on_select_experts(1, np.array([[3, 3]]))
    counts = rec.stop_record()
    assert counts[0].tolist() == [2, 1, 1, 0]
    assert counts[1].tolist() == [0, 0, 0, 2]
    rec.on_select_experts(0, np.array([[0, 0]]))  # not recording: ignored
    assert rec.snapshot()[0, 0] == 2


def test_rebalance_skewed_load():
    # one hot expert dominating: replication must spread it
    load = np.array([[1000.0, 10.0, 10.0, 10.0]])
    meta = rebalance_experts(load, num_physical=8, num_ranks=4)
    replicas = np.bincount(meta.physical_to_logical[0], minlength=4)
    assert replicas[0] >= 4          # hot expert heavily replicated
    assert (replicas >= 1).all()     # every expert stays served
    assert balancedness(load, meta) > 0.7


def test_rebalance_uniform_load():
    load = np.ones((2, 8))
    meta = rebalance_experts(load, num_physical=16, num_ranks=4)
    assert balancedness(load, meta) > 0.95
    # each rank gets exactly per_rank slots
    for layer in range(2):
        for r in range(4):
            assert len(meta.slots_of_rank(layer, r)) == 4


def test_rebalance_beats_naive():
    rng = np.random.default_rng(0)
    load = rng.pareto(1.5, size=(4, 16)) + 0.1
    meta = rebalance_experts(load, num_physical=32, num_ranks=8)
    # naive: experts round-robin without replication
    naive = np.tile(np.arange(16, dtype=np.int32), 2)[None].repeat(4, 0)
    from iaas_sglang_tpu.eplb.eplb_algorithms import ExpertLocationMetadata

    naive_meta = ExpertLocationMetadata(
        physical_to_logical=naive,
        logical_to_physical=[[[s for s in range(32) if naive[l][s] == e]
                              for e in range(16)] for l in range(4)],
        num_ranks=8)
    assert balancedness(load, meta) > balancedness(load, naive_meta)


def test_device_side_capture_via_engine():
    """Device-side distribution tap: recording through the scheduler RPC
    accumulates real per-layer expert counts from serving batches."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.managers.io_struct import ExpertDistributionReq
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["MixtralForCausalLM"], model_type="mixtral",
              num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, intermediate_size=96, vocab_size=256,
              rms_norm_eps=1e-6, rope_theta=10000.0,
              max_position_embeddings=512, tie_word_embeddings=False,
              num_local_experts=4, num_experts_per_tok=2)
    eng = Engine(ServerArgs(
        model_path="dummy://moe", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=32, random_seed=0), hf_config_override=hf)
    eng.scheduler.expert_capture_interval = 1
    out = eng.scheduler.process_input(ExpertDistributionReq("start"))
    assert out.success
    eng.generate(input_ids=[[1, 2, 3] * 5, [7, 8] * 6],
                 sampling_params={"max_new_tokens": 8, "temperature": 0.0})
    snap = eng.scheduler.process_input(ExpertDistributionReq("dump"))
    counts = snap.counts
    assert counts.shape == (2, 4)
    assert counts.sum() > 0
    # top-2 routing: each captured token contributes 2 expert selections
    assert counts.sum() % 2 == 0
    stop = eng.scheduler.process_input(ExpertDistributionReq("stop"))
    assert stop.success and stop.counts.sum() == counts.sum()
    # feeds the rebalancer end-to-end
    from iaas_sglang_tpu.eplb.eplb_algorithms import rebalance_experts

    meta = rebalance_experts(np.maximum(stop.counts, 1).astype(np.float64),
                             num_physical=8, num_ranks=2)
    assert meta.physical_to_logical.shape == (2, 8)
    eng.shutdown()


def test_eplb_live_relocation_greedy_parity():
    """eplb_rebalance applies the rebalanced physical layout LIVE
    (replicated hot experts, routing remapped through
    expert_phys_map/scale) — outputs must be token-for-token identical
    before and after, including a composed re-application."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.managers.io_struct import ExpertDistributionReq
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["MixtralForCausalLM"], model_type="mixtral",
              num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, intermediate_size=96, vocab_size=256,
              rms_norm_eps=1e-6, rope_theta=10000.0,
              max_position_embeddings=512, tie_word_embeddings=False,
              num_local_experts=4, num_experts_per_tok=2)
    eng = Engine(ServerArgs(
        model_path="dummy://moe", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=32, random_seed=0), hf_config_override=hf)
    eng.scheduler.expert_capture_interval = 1
    ids = list(range(3, 30))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    eng.scheduler.process_input(ExpertDistributionReq("start"))
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    eng.scheduler.process_input(ExpertDistributionReq("stop"))

    ok, msg, score = eng.eplb_rebalance(num_redundant_experts=2)
    assert ok, msg
    assert 0.0 < score <= 1.0
    layers = eng.scheduler.model_runner.params["layers"]
    assert layers["we_gate"].shape[1] == 6        # 4 logical + 2 replicas
    eng.flush_cache()
    after = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert after == before

    # composed re-application back to a pure permutation layout
    eng.scheduler.process_input(ExpertDistributionReq("start"))
    eng.generate(input_ids=ids, sampling_params=sp)
    eng.scheduler.process_input(ExpertDistributionReq("stop"))
    ok2, msg2, _ = eng.eplb_rebalance(num_redundant_experts=0)
    assert ok2, msg2
    eng.flush_cache()
    again = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert again == before
    eng.shutdown()


def test_eplb_capture_and_rebalance_under_pp():
    """EPLB composes with pipeline parallelism (r5, VERDICT #7): the
    capture tap re-runs per STAGE (counts concatenate across stage layer
    slices) and live relocation rebuilds each stage's expert stacks on
    its own sub-mesh — greedy outputs identical before/after."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.managers.io_struct import ExpertDistributionReq
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["MixtralForCausalLM"], model_type="mixtral",
              num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, intermediate_size=96, vocab_size=256,
              rms_norm_eps=1e-6, rope_theta=10000.0,
              max_position_embeddings=512, tie_word_embeddings=False,
              num_local_experts=4, num_experts_per_tok=2)
    eng = Engine(ServerArgs(
        model_path="dummy://moe", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=4096, skip_tokenizer_init=True,
        chunked_prefill_size=32, random_seed=0,
        pp_size=2, tp_size=2), hf_config_override=hf)
    eng.scheduler.expert_capture_interval = 1
    ids = list(range(3, 30))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    out = eng.scheduler.process_input(ExpertDistributionReq("start"))
    assert out.success, "capture must not be gated under PP anymore"
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    stop = eng.scheduler.process_input(ExpertDistributionReq("stop"))
    assert stop.success
    counts = stop.counts
    assert counts.shape == (2, 4)          # both stages' layers present
    assert counts[0].sum() > 0 and counts[1].sum() > 0, \
        "every stage's layer slice must contribute counts"
    assert counts.sum() % 2 == 0           # top-2 routing

    # live relocation per stage + greedy parity
    eng.scheduler.process_input(ExpertDistributionReq("start"))
    eng.generate(input_ids=ids, sampling_params=sp)
    eng.scheduler.process_input(ExpertDistributionReq("stop"))
    ok, msg, score = eng.eplb_rebalance(num_redundant_experts=2)
    assert ok, msg
    layers0 = eng.scheduler.model_runner.stage_params[0]["layers"]
    assert layers0["we_gate"].shape[1] == 6    # 4 logical + 2 replicas
    eng.flush_cache()
    after = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert after == before
    eng.shutdown()
