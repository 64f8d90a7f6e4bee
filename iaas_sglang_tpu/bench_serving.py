"""Online serving load generator
(analog of sglang python/sglang/bench_serving.py:703 BenchmarkMetrics).

Drives a running server's /generate endpoint with a Poisson arrival
process and reports output tok/s, total tok/s, TTFT mean/median/p99,
ITL, per-request e2e latency and concurrency.

    python -m iaas_sglang_tpu.bench_serving --base-url http://host:port \
        --num-prompts 200 --request-rate 8 --input-len 512 --output-len 128
"""

from __future__ import annotations

import argparse
import asyncio
import json
import random
import time
from dataclasses import dataclass, field
from typing import List, Optional

import aiohttp
import numpy as np


@dataclass
class RequestResult:
    success: bool = False
    prompt_len: int = 0
    output_len: int = 0
    ttft: float = 0.0
    itls: List[float] = field(default_factory=list)
    latency: float = 0.0
    error: str = ""


@dataclass
class BenchmarkMetrics:
    completed: int
    total_input: int
    total_output: int
    request_throughput: float
    input_throughput: float
    output_throughput: float
    mean_ttft_ms: float
    median_ttft_ms: float
    p99_ttft_ms: float
    mean_itl_ms: float
    median_itl_ms: float
    p99_itl_ms: float
    mean_e2e_latency_ms: float
    median_e2e_latency_ms: float
    max_concurrency: float


async def _one_request(session: aiohttp.ClientSession, base_url: str,
                       input_ids: List[int], output_len: int) -> RequestResult:
    res = RequestResult(prompt_len=len(input_ids))
    payload = {
        "input_ids": input_ids,
        "stream": True,
        "sampling_params": {
            "max_new_tokens": output_len,
            "temperature": 0.0,
            "ignore_eos": True,
        },
    }
    st = time.perf_counter()
    last = st
    try:
        async with session.post(f"{base_url}/generate", json=payload) as resp:
            resp.raise_for_status()
            async for line in resp.content:
                if not line.startswith(b"data:"):
                    continue
                body = line[5:].strip()
                if body == b"[DONE]":
                    break
                now = time.perf_counter()
                if res.ttft == 0.0:
                    res.ttft = now - st
                else:
                    res.itls.append(now - last)
                last = now
                chunk = json.loads(body)
                res.output_len = chunk["meta_info"]["completion_tokens"]
        res.latency = time.perf_counter() - st
        res.success = True
    except Exception as e:  # noqa: BLE001 — record, don't crash the sweep
        res.error = repr(e)
    return res


async def run_benchmark(base_url: str, num_prompts: int, request_rate: float,
                        input_len: int, output_len: int,
                        vocab_size: int = 32000) -> BenchmarkMetrics:
    rng = random.Random(0)
    prompts = [
        [rng.randrange(4, vocab_size - 4) for _ in range(input_len)]
        for _ in range(num_prompts)
    ]
    conn = aiohttp.TCPConnector(limit=0)
    timeout = aiohttp.ClientTimeout(total=6 * 3600)
    results: List[RequestResult] = []
    t0 = time.perf_counter()
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as sess:
        tasks = []
        for ids in prompts:
            tasks.append(asyncio.create_task(
                _one_request(sess, base_url, ids, output_len)))
            if request_rate != float("inf"):
                await asyncio.sleep(rng.expovariate(request_rate))
        results = list(await asyncio.gather(*tasks))
    dur = time.perf_counter() - t0

    ok = [r for r in results if r.success]
    if not ok:
        raise RuntimeError(f"no request succeeded: {results[0].error}")
    ttfts = np.array([r.ttft for r in ok])
    itls = np.array([x for r in ok for x in r.itls] or [0.0])
    lats = np.array([r.latency for r in ok])
    total_in = sum(r.prompt_len for r in ok)
    total_out = sum(r.output_len for r in ok)
    return BenchmarkMetrics(
        completed=len(ok),
        total_input=total_in,
        total_output=total_out,
        request_throughput=len(ok) / dur,
        input_throughput=total_in / dur,
        output_throughput=total_out / dur,
        mean_ttft_ms=float(ttfts.mean() * 1e3),
        median_ttft_ms=float(np.median(ttfts) * 1e3),
        p99_ttft_ms=float(np.percentile(ttfts, 99) * 1e3),
        mean_itl_ms=float(itls.mean() * 1e3),
        median_itl_ms=float(np.median(itls) * 1e3),
        p99_itl_ms=float(np.percentile(itls, 99) * 1e3),
        mean_e2e_latency_ms=float(lats.mean() * 1e3),
        median_e2e_latency_ms=float(np.median(lats) * 1e3),
        max_concurrency=float(sum(r.latency for r in ok) / dur),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-prompts", type=int, default=100)
    ap.add_argument("--request-rate", type=float, default=float("inf"))
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--vocab-size", type=int, default=32000)
    args = ap.parse_args()
    m = asyncio.run(run_benchmark(
        args.base_url, args.num_prompts, args.request_rate,
        args.input_len, args.output_len, args.vocab_size))
    print(json.dumps(m.__dict__, indent=2))


if __name__ == "__main__":
    main()
