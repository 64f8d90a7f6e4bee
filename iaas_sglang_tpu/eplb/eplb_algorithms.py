"""Expert-parallel load balancing (analog of sglang
srt/eplb/eplb_algorithms/deepseek.py + expert_location.py:34).

Given observed per-expert load, assign `num_physical` expert slots
(logical experts may get multiple replicas) across `num_ranks` so every
rank carries roughly equal load:

1. replica counts per logical expert ~ proportional to its load
   (every expert keeps >= 1 replica),
2. physical replicas are packed onto ranks greedily, heaviest first
   (longest-processing-time scheduling).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class ExpertLocationMetadata:
    """physical slot p (of rank r) -> logical expert id, per layer."""

    physical_to_logical: np.ndarray   # i32[L, num_physical]
    logical_to_physical: List[List[List[int]]]  # [L][E] -> slot list
    num_ranks: int

    def slots_of_rank(self, layer: int, rank: int) -> np.ndarray:
        per = self.physical_to_logical.shape[1] // self.num_ranks
        return self.physical_to_logical[layer, rank * per:(rank + 1) * per]


def rebalance_experts(load: np.ndarray, num_physical: int,
                      num_ranks: int) -> ExpertLocationMetadata:
    """load: f64[L, E] observed per-expert token counts."""
    L, E = load.shape
    assert num_physical >= E and num_physical % num_ranks == 0
    per_rank = num_physical // num_ranks
    p2l = np.zeros((L, num_physical), dtype=np.int32)
    l2p: List[List[List[int]]] = []

    for layer in range(L):
        w = load[layer].astype(np.float64)
        w = w / max(w.sum(), 1e-9)
        # replica counts: 1 each + extras to the heaviest (largest remainder
        # over load-per-replica reduction, greedy)
        replicas = np.ones(E, dtype=np.int64)
        for _ in range(num_physical - E):
            eff = w / replicas
            # at most one replica of an expert per rank (keeps LPT packable)
            eff[replicas >= num_ranks] = -1.0
            replicas[int(np.argmax(eff))] += 1
        # build physical list: heaviest effective load first
        phys = []
        for e in range(E):
            share = w[e] / replicas[e]
            phys.extend([(share, e)] * int(replicas[e]))
        phys.sort(reverse=True)
        # LPT pack onto ranks
        rank_load = np.zeros(num_ranks)
        rank_slots: List[List[int]] = [[] for _ in range(num_ranks)]
        for share, e in phys:
            order = np.argsort(rank_load)
            placed = False
            for r in order:
                if len(rank_slots[r]) < per_rank:
                    rank_slots[r].append(e)
                    rank_load[r] += share
                    placed = True
                    break
            assert placed
        flat = []
        for r in range(num_ranks):
            flat.extend(rank_slots[r])
        p2l[layer] = np.asarray(flat, dtype=np.int32)
        table: List[List[int]] = [[] for _ in range(E)]
        for slot, e in enumerate(flat):
            table[e].append(slot)
        l2p.append(table)

    return ExpertLocationMetadata(
        physical_to_logical=p2l, logical_to_physical=l2p,
        num_ranks=num_ranks)


def balancedness(load: np.ndarray, meta: ExpertLocationMetadata) -> float:
    """mean(rank load) / max(rank load), averaged over layers (1.0 = perfect)."""
    L, E = load.shape
    scores = []
    for layer in range(L):
        w = load[layer].astype(np.float64)
        replicas = np.bincount(meta.physical_to_logical[layer],
                               minlength=E).astype(np.float64)
        per_rank_load = np.zeros(meta.num_ranks)
        per = meta.physical_to_logical.shape[1] // meta.num_ranks
        for slot, e in enumerate(meta.physical_to_logical[layer]):
            per_rank_load[slot // per] += w[e] / max(replicas[e], 1)
        if per_rank_load.max() > 0:
            scores.append(per_rank_load.mean() / per_rank_load.max())
    return float(np.mean(scores)) if scores else 1.0
