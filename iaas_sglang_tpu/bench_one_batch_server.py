"""Single static-batch latency through a RUNNING server's HTTP interface
(analog of sglang python/sglang/bench_one_batch_server.py — measures
TTFT/decode latency including the tokenize/HTTP/detokenize path, unlike
bench_one_batch which drives the Engine in-process).

    # against an already-running server
    python -m iaas_sglang_tpu.bench_one_batch_server \
        --base-url http://127.0.0.1:30000 \
        --batch-size 1 16 --input-len 1024 --output-len 8

    # or launch one (accepts all launch_server flags)
    python -m iaas_sglang_tpu.bench_one_batch_server --model-path ... \
        --batch-size 16 --input-len 512 --output-len 32

Prints one JSON line per (batch_size, input_len, output_len) combination:
latency, TTFT, input/output throughput.
"""

from __future__ import annotations

import argparse
import itertools
import json
import time

import numpy as np
import requests


def run_one(base_url: str, bs: int, in_len: int, out_len: int,
            vocab_size: int = 10000, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    prompts = rng.integers(3, vocab_size, size=(bs, in_len)).tolist()

    # TTFT via a 1-token run (the reference derives it from streaming;
    # a dedicated short run avoids SSE parsing noise)
    t0 = time.perf_counter()
    r = requests.post(f"{base_url}/generate", json={
        "input_ids": prompts,
        "sampling_params": {"max_new_tokens": 1, "temperature": 0.0,
                            "ignore_eos": True},
    }, timeout=3600)
    r.raise_for_status()
    ttft = time.perf_counter() - t0

    t0 = time.perf_counter()
    r = requests.post(f"{base_url}/generate", json={
        "input_ids": prompts,
        "sampling_params": {"max_new_tokens": out_len, "temperature": 0.0,
                            "ignore_eos": True},
    }, timeout=3600)
    r.raise_for_status()
    latency = time.perf_counter() - t0
    outs = r.json()
    n_out = sum(len(o["output_ids"]) for o in
                (outs if isinstance(outs, list) else [outs]))

    decode_time = max(latency - ttft, 1e-9)
    return {
        "batch_size": bs,
        "input_len": in_len,
        "output_len": out_len,
        "ttft_s": round(ttft, 4),
        "latency_s": round(latency, 4),
        "input_throughput_tok_s": round(bs * in_len / ttft, 2),
        "output_throughput_tok_s": round(
            (n_out - bs) / decode_time if out_len > 1 else 0.0, 2),
        "overall_throughput_tok_s": round(
            (bs * in_len + n_out) / latency, 2),
    }


def main() -> None:
    from iaas_sglang_tpu.server_args import ServerArgs

    ap = argparse.ArgumentParser()
    ServerArgs.add_cli_args(ap)
    ap.add_argument("--base-url", default="",
                    help="target a running server instead of launching one")
    ap.add_argument("--batch-size", type=int, nargs="+", default=[1])
    ap.add_argument("--input-len", type=int, nargs="+", default=[1024])
    ap.add_argument("--output-len", type=int, nargs="+", default=[16])
    ap.add_argument("--skip-warmup", action="store_true")
    ap.add_argument("--result-filename", default="")
    args = ap.parse_args()

    proc = None
    if args.base_url:
        base_url = args.base_url
    else:
        import multiprocessing

        from iaas_sglang_tpu.entrypoints.http_server import launch_server

        sa = ServerArgs.from_cli_args(args)
        base_url = f"http://{sa.host}:{sa.port}"
        proc = multiprocessing.Process(target=launch_server, args=(sa,))
        proc.start()
        deadline = time.time() + 600
        while time.time() < deadline:
            try:
                if requests.get(f"{base_url}/health", timeout=2).ok:
                    break
            except requests.RequestException:
                time.sleep(1)
        else:
            raise TimeoutError("server never became healthy")

    try:
        if not args.skip_warmup:
            run_one(base_url, 1, 8, 4)
        results = []
        for bs, il, ol in itertools.product(
                args.batch_size, args.input_len, args.output_len):
            res = run_one(base_url, bs, il, ol)
            print(json.dumps(res), flush=True)
            results.append(res)
        if args.result_filename:
            with open(args.result_filename, "a") as f:
                for res in results:
                    f.write(json.dumps(res) + "\n")
    finally:
        if proc is not None:
            proc.terminate()
            proc.join(timeout=20)


if __name__ == "__main__":
    main()
