"""iaas-sglang-tpu: a TPU-native LLM serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of SGLang
(reference: /root/reference, sglang v0.4.9): continuous batching with a
radix prefix cache over a paged KV pool, compiled fixed-shape step
functions instead of CUDA graphs, Pallas ragged paged attention, and
SPMD parallelism over a `jax.sharding.Mesh` instead of NCCL process
groups.

Public API (mirrors sglang's `python/sglang/__init__.py`):
    Engine       -- offline/embedded inference engine
    ServerArgs   -- the single config object (CLI == Engine kwargs == HTTP)
    SamplingParams
"""

from iaas_sglang_tpu.version import __version__

__all__ = ["__version__", "Engine", "ServerArgs", "SamplingParams"]


def __getattr__(name):
    # Lazy imports keep `import iaas_sglang_tpu` fast and avoid pulling
    # jax into tools that only need the protocol types.
    if name == "Engine":
        from iaas_sglang_tpu.entrypoints.engine import Engine

        return Engine
    if name == "ServerArgs":
        from iaas_sglang_tpu.server_args import ServerArgs

        return ServerArgs
    if name == "SamplingParams":
        from iaas_sglang_tpu.sampling.sampling_params import SamplingParams

        return SamplingParams
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
