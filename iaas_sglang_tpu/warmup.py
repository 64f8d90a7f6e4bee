"""Named warmup registry (analog of reference srt/warmup.py:16).

`--warmups name1,name2` runs the registered coroutines against the
TokenizerManager right after the server comes up, before traffic.
The built-in `compile_buckets` warmup walks the decode batch-size and
prefill token buckets so every jit program is compiled (and lands in the
persistent compilation cache) before the first real request — the TPU
analog of the reference's kernel-warming `voice_chat` warmup.
"""

from __future__ import annotations

import logging
from typing import Callable, List

import numpy as np

logger = logging.getLogger(__name__)

_warmup_registry: dict[str, Callable] = {}


def warmup(name: str) -> Callable:
    def decorator(fn: Callable) -> Callable:
        _warmup_registry[name] = fn
        return fn

    return decorator


async def execute_warmups(warmup_names: List[str], tokenizer_manager
                          ) -> None:
    for name in warmup_names:
        fn = _warmup_registry.get(name)
        if fn is None:
            logger.warning("could not find custom warmup %r", name)
            continue
        logger.info("running warmup %s", name)
        await fn(tokenizer_manager)


@warmup("compile_buckets")
async def compile_buckets(tokenizer_manager) -> None:
    """Issue one request per (prefill-token, decode-batch) bucket so the
    compiled-program cache is fully populated before serving."""
    from iaas_sglang_tpu.managers.io_struct import GenerateReqInput

    sa = tokenizer_manager.server_args
    rng = np.random.default_rng(0)
    vocab = 1024
    lens = sorted({min(sa.chunked_prefill_size or 512, n)
                   for n in (16, 64, 256, sa.chunked_prefill_size or 512)})
    for n in lens:
        gri = GenerateReqInput(
            input_ids=rng.integers(1, vocab, size=int(n)).tolist(),
            sampling_params={"max_new_tokens": 2, "temperature": 0.0,
                             "ignore_eos": True},
        )
        async for _ in tokenizer_manager.generate_request(gri):
            pass
