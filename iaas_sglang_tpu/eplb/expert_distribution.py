"""Expert-distribution recording (analog of sglang
srt/eplb/expert_distribution.py:40 — the stat gatherer feeding EPLB).

Records per-layer expert selection counts. The MoE step can cheaply emit
router top-k ids for sampled steps; the recorder accumulates host-side
histograms that the rebalancer consumes.
"""

from __future__ import annotations

import threading
from typing import Optional

import numpy as np


class ExpertDistributionRecorder:
    def __init__(self, num_layers: int, num_experts: int):
        self.num_layers = num_layers
        self.num_experts = num_experts
        self._counts = np.zeros((num_layers, num_experts), dtype=np.int64)
        self._lock = threading.Lock()
        self.recording = False

    def start_record(self) -> None:
        with self._lock:
            self._counts[:] = 0
            self.recording = True

    def stop_record(self) -> np.ndarray:
        with self._lock:
            self.recording = False
            return self._counts.copy()

    def on_select_experts(self, layer_idx: int, topk_ids: np.ndarray) -> None:
        """topk_ids: i32[tokens, K] for one layer of one step."""
        if not self.recording:
            return
        binc = np.bincount(topk_ids.reshape(-1),
                           minlength=self.num_experts)
        with self._lock:
            self._counts[layer_idx] += binc

    def add_counts(self, counts: np.ndarray) -> None:
        """Accumulate a device-captured per-layer histogram i32[L, E]
        (the device-side tap: ModelRunner.run_expert_capture)."""
        if not self.recording:
            return
        with self._lock:
            self._counts += counts.astype(np.int64)

    def snapshot(self) -> np.ndarray:
        with self._lock:
            return self._counts.copy()
