"""Single static-batch latency/throughput without a server
(analog of sglang python/sglang/bench_one_batch.py).

    python -m iaas_sglang_tpu.bench_one_batch --model-path ... \
        --batch-size 16 --input-len 512 --output-len 64 [--load-format dummy]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    from iaas_sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(ap)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--input-len", type=int, default=256)
    ap.add_argument("--output-len", type=int, default=32)
    args = ap.parse_args()
    bs, in_len, out_len = args.batch_size, args.input_len, args.output_len

    sa = ServerArgs.from_cli_args(args)
    sa.skip_tokenizer_init = True
    if sa.max_total_tokens is None:
        sa.max_total_tokens = 2 * bs * (in_len + out_len)
    sa.max_running_requests = max(sa.max_running_requests, bs)
    sa.max_prefill_tokens = max(sa.max_prefill_tokens, bs * in_len)
    sa.chunked_prefill_size = max(sa.chunked_prefill_size, bs * in_len)

    from iaas_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(sa)
    rng = np.random.default_rng(0)
    vocab = eng.model_config.vocab_size
    prompts = [rng.integers(4, vocab - 4, size=in_len).tolist()
               for _ in range(bs)]
    sp = {"max_new_tokens": out_len, "temperature": 0.0, "ignore_eos": True}

    # warmup with the full batch shape so every bucket is compiled
    eng.generate(input_ids=prompts, sampling_params={**sp, "max_new_tokens": 4})
    eng.flush_cache()

    # prefill-only measurement
    t0 = time.perf_counter()
    eng.generate(input_ids=prompts, sampling_params={**sp, "max_new_tokens": 1})
    prefill_s = time.perf_counter() - t0
    eng.flush_cache()

    # full run
    t0 = time.perf_counter()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    total_s = time.perf_counter() - t0
    out_tokens = sum(len(o["output_ids"]) for o in outs)
    decode_s = max(total_s - prefill_s, 1e-9)

    print(json.dumps({
        "batch_size": bs,
        "input_len": in_len,
        "output_len": out_len,
        "prefill_latency_s": round(prefill_s, 4),
        "prefill_throughput_tok_s": round(bs * in_len / prefill_s, 1),
        "decode_throughput_tok_s": round((out_tokens - bs) / decode_s, 1),
        "e2e_throughput_tok_s": round(out_tokens / total_s, 1),
        "e2e_latency_s": round(total_s, 4),
    }))


if __name__ == "__main__":
    main()
