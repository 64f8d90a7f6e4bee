"""Device mesh construction and sharding helpers.

TPU replacement for the reference's distributed stack
(srt/distributed/parallel_state.py:1126,1181 init_distributed_environment /
initialize_model_parallel). Instead of one NCCL process per GPU, a single
controller owns all local devices and parallelism is expressed as a logical
`jax.sharding.Mesh` with axes:

    dp  -- data parallel (replica) axis
    tp  -- tensor parallel axis (rides ICI; collectives are compiled psum /
           all_gather inserted by GSPMD, replacing custom_all_reduce.cu,
           MSCCL++ and PyNccl entirely — see SURVEY §2.3)

Expert parallelism reuses the tp axis ("ep over tp") in this design; a
dedicated ep axis can be spliced in for pod-scale MoE later.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass
class MeshContext:
    mesh: Mesh
    tp_size: int
    dp_size: int

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def make_mesh(tp_size: int = 1, dp_size: int = 1, devices=None) -> MeshContext:
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices (tp={tp_size} x dp={dp_size}), "
            f"have {len(devices)}"
        )
    dev = np.asarray(devices[:n]).reshape(dp_size, tp_size)
    mesh = Mesh(dev, axis_names=("dp", "tp"))
    return MeshContext(mesh=mesh, tp_size=tp_size, dp_size=dp_size)
