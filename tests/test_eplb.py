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
