"""Multi-LoRA batched serving (analog of sglang srt/lora/lora_manager.py:45
+ the sgemm expand/shrink Triton kernels).

TPU re-design: adapters live in fixed slot-stacked arrays
    A[target]: [L, S, H_in, r_max]      B[target]: [L, S, r_max, H_out]
(S = max concurrent adapters, slot 0 reserved as the zero/no-LoRA slot).
A batch mixes adapters by per-token one-hot over slots:

    delta = ((x @ A) * onehot) @ B * (alpha / r)

which XLA turns into two small batched GEMMs — every token pays the
r_max-rank cost regardless of its adapter (S and r_max are small), in
exchange for zero gather/scatter and full jit-bucket compatibility (the
CUDA-graph-safe design goal of the reference's LoRAMemoryPool)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from iaas_sglang_tpu.utils import logger

TARGETS = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
# HF PEFT module names per target
PEFT_NAMES = {
    "wq": "q_proj", "wk": "k_proj", "wv": "v_proj", "wo": "o_proj",
    "w_gate": "gate_proj", "w_up": "up_proj", "w_down": "down_proj",
}


class LoRAManager:
    def __init__(self, model, model_config, mesh_ctx, *,
                 max_loras: int = 8, max_rank: int = 16,
                 backend: str = "onehot"):
        self.model = model
        self.config = model_config
        self.mesh_ctx = mesh_ctx
        self.max_loras = max_loras      # usable slots: 1..max_loras
        self.max_rank = max_rank
        self.backend = backend          # "onehot" | "gmm" (ops/lora.py)
        self.name_to_slot: Dict[str, int] = {}
        self.slot_scaling = np.zeros(max_loras + 1, dtype=np.float32)

        import jax

        L = model_config.num_layers
        specs = {s.rsplit(".", 1)[-1] if "." in s else s: None
                 for s in ()}  # placeholder
        shapes = {}
        wspecs = model.weight_specs()
        for t in TARGETS:
            key = f"layers.{t}"
            if key not in wspecs:
                continue
            h_in, h_out = wspecs[key].shape
            shapes[t] = (h_in, h_out)
        self.shapes = shapes
        self._host_A = {
            t: np.zeros((L, max_loras + 1, h_in, max_rank), np.float32)
            for t, (h_in, h_out) in shapes.items()
        }
        self._host_B = {
            t: np.zeros((L, max_loras + 1, max_rank, h_out), np.float32)
            for t, (h_in, h_out) in shapes.items()
        }
        self._device = None   # lazily pushed pytree

    # ------------------------------------------------------------- loading

    def load_adapter(self, name: str, state_dict, *, rank: int,
                     alpha: float) -> int:
        """state_dict: PEFT-style keys
        `base_model.model.model.layers.{l}.self_attn.q_proj.lora_A.weight`
        (torch [r, H_in]) / `...lora_B.weight` (torch [H_out, r])."""
        assert rank <= self.max_rank, f"rank {rank} > max {self.max_rank}"
        if name in self.name_to_slot:
            return self.name_to_slot[name]
        used = set(self.name_to_slot.values())
        free = [s for s in range(1, self.max_loras + 1) if s not in used]
        if not free:
            raise RuntimeError("no free LoRA slots; unload an adapter first")
        slot = free[0]

        def find(l, peft_name, ab):
            for k, v in state_dict.items():
                if (f"layers.{l}." in k and f"{peft_name}.lora_{ab}" in k):
                    return v
            return None

        L = self.config.num_layers
        loaded = 0
        for t in self.shapes:
            pn = PEFT_NAMES[t]
            for l in range(L):
                a = find(l, pn, "A")
                b = find(l, pn, "B")
                if a is None or b is None:
                    continue
                a = np.asarray(a, dtype=np.float32)   # [r, H_in]
                b = np.asarray(b, dtype=np.float32)   # [H_out, r]
                self._host_A[t][l, slot, :, :rank] = a.T
                self._host_B[t][l, slot, :rank, :] = b.T
                loaded += 1
        self.slot_scaling[slot] = alpha / rank
        self.name_to_slot[name] = slot
        self._device = None  # re-push on next use
        logger.info("loaded LoRA %r into slot %d (%d matrices)",
                    name, slot, loaded)
        return slot

    def unload_adapter(self, name: str) -> None:
        slot = self.name_to_slot.pop(name, None)
        if slot is None:
            return
        for t in self.shapes:
            self._host_A[t][:, slot] = 0
            self._host_B[t][:, slot] = 0
        self.slot_scaling[slot] = 0.0
        self._device = None

    # -------------------------------------------------------------- device

    def device_params(self):
        """Pytree consumed by the model forward: per-target A/B stacks in
        bf16 plus per-slot scaling."""
        if self._device is None:
            import jax
            import jax.numpy as jnp

            rep = self.mesh_ctx.replicated
            self._device = {
                "A": {t: jax.device_put(
                    self._host_A[t].astype(np.float32), rep)
                    for t in self.shapes},
                "B": {t: jax.device_put(
                    self._host_B[t].astype(np.float32), rep)
                    for t in self.shapes},
                "scaling": jax.device_put(
                    self.slot_scaling.copy(), rep),
            }
            if self.backend == "gmm":
                # structural (leafless) marker: selects the grouped-matmul
                # delta path at trace time without a non-array jit leaf
                self._device["gmm"] = ()
        return self._device

    def slot_of(self, name: Optional[str]) -> int:
        if not name:
            return 0
        return self.name_to_slot.get(name, 0)
