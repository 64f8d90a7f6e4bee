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

    ep  -- dedicated expert-parallel axis (optional, pod-scale MoE): with
           ep_factor > 1 the mesh is (dp, ep, tp) and expert stacks shard
           over the ("ep", "tp") super-axis — ep rides DCN across hosts
           while tp stays on ICI. With ep_factor == 1 (default) expert
           parallelism reuses the tp axis ("ep over tp").
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
    ep_factor: int = 1

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def moe_axis(self):
        """Mesh axis (name or tuple) expert stacks shard over — the
        reference's ep_size group (layers/moe/ep_moe/layer.py:148)."""
        return ("ep", "tp") if self.ep_factor > 1 else "tp"

    @property
    def ep_size(self) -> int:
        return self.ep_factor * self.tp_size


def make_mesh(tp_size: int = 1, dp_size: int = 1, ep_factor: int = 1,
              devices=None) -> MeshContext:
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size * ep_factor
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices (tp={tp_size} x dp={dp_size} x "
            f"ep={ep_factor}), have {len(devices)}"
        )
    if ep_factor > 1:
        dev = np.asarray(devices[:n]).reshape(dp_size, ep_factor, tp_size)
        mesh = Mesh(dev, axis_names=("dp", "ep", "tp"))
    else:
        dev = np.asarray(devices[:n]).reshape(dp_size, tp_size)
        mesh = Mesh(dev, axis_names=("dp", "tp"))
    return MeshContext(mesh=mesh, tp_size=tp_size, dp_size=dp_size,
                       ep_factor=ep_factor)
