"""Offline engine throughput benchmark
(analog of sglang python/sglang/bench_offline_throughput.py): drives
Engine.generate with a batch of random-length prompts and reports
request/input/output throughput.

    python -m iaas_sglang_tpu.bench_offline_throughput --model-path ... \
        --num-prompts 64 --input-len 512 --output-len 128 [--load-format dummy]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    from iaas_sglang_tpu.server_args import ServerArgs

    ServerArgs.add_cli_args(ap)
    ap.add_argument("--num-prompts", type=int, default=64)
    ap.add_argument("--input-len", type=int, default=256)
    ap.add_argument("--output-len", type=int, default=64)
    ap.add_argument("--random-range-ratio", type=float, default=0.5,
                    help="prompt lengths uniform in [ratio*len, len]")
    args = ap.parse_args()

    sa = ServerArgs.from_cli_args(args)
    sa.skip_tokenizer_init = True
    if sa.max_total_tokens is None:
        sa.max_total_tokens = 2 * args.num_prompts * (
            args.input_len + args.output_len)

    from iaas_sglang_tpu.entrypoints.engine import Engine

    eng = Engine(sa)
    rng = np.random.default_rng(0)
    vocab = eng.model_config.vocab_size
    lo = max(int(args.input_len * args.random_range_ratio), 4)
    prompts = [
        rng.integers(4, vocab - 4,
                     size=rng.integers(lo, args.input_len + 1)).tolist()
        for _ in range(args.num_prompts)
    ]
    sp = {"max_new_tokens": args.output_len, "temperature": 0.0,
          "ignore_eos": True}

    # warmup
    eng.generate(input_ids=prompts[:2],
                 sampling_params={**sp, "max_new_tokens": 4})
    eng.flush_cache()

    t0 = time.perf_counter()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    dur = time.perf_counter() - t0
    tin = sum(len(p) for p in prompts)
    tout = sum(len(o["output_ids"]) for o in outs)
    print(json.dumps({
        "num_prompts": args.num_prompts,
        "duration_s": round(dur, 2),
        "request_throughput_rps": round(args.num_prompts / dur, 2),
        "input_throughput_tok_s": round(tin / dur, 1),
        "output_throughput_tok_s": round(tout / dur, 1),
        "total_throughput_tok_s": round((tin + tout) / dur, 1),
    }))


if __name__ == "__main__":
    main()
