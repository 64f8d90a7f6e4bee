"""Online serving load generator
(analog of sglang python/sglang/bench_serving.py:703 BenchmarkMetrics).

Drives a running server's /generate endpoint with a Poisson arrival
process and reports output tok/s, total tok/s, TTFT mean/median/p99,
ITL, per-request e2e latency and concurrency.

Datasets (reference bench_serving.py:640 dataset_name):
  random                  random token ids at fixed input/output lens
  sharegpt                local ShareGPT-format JSON (--dataset-path;
                          this image has no egress, so no auto-download);
                          text prompts, output lens from the gpt turns
  generated-shared-prefix num_groups system prompts shared across
                          prompts-per-group questions — the RadixAttention
                          prefix-cache workload (the reference's headline
                          cache-hit benchmark)

    python -m iaas_sglang_tpu.bench_serving --base-url http://host:port \
        --num-prompts 200 --request-rate 8 --input-len 512 --output-len 128
    python -m iaas_sglang_tpu.bench_serving --dataset generated-shared-prefix \
        --gsp-num-groups 8 --gsp-prompts-per-group 16
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
                       prompt, output_len: int,
                       prompt_len: int = 0) -> RequestResult:
    res = RequestResult(
        prompt_len=prompt_len or (len(prompt) if isinstance(prompt, list)
                                  else 0))
    payload = {
        ("input_ids" if isinstance(prompt, list) else "text"): prompt,
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


def sample_random_requests(num_prompts: int, input_len: int,
                           output_len: int, vocab_size: int,
                           seed: int = 0):
    """[(input_ids, output_len)] of random tokens
    (reference sample_random_requests, bench_serving.py:1013)."""
    rng = random.Random(seed)
    return [
        ([rng.randrange(4, vocab_size - 4) for _ in range(input_len)],
         output_len)
        for _ in range(num_prompts)
    ]


def sample_sharegpt_requests(dataset_path: str, num_prompts: int,
                             fixed_output_len: Optional[int] = None,
                             seed: int = 0):
    """[(text_prompt, output_len)] from a local ShareGPT-format JSON
    (reference sample_sharegpt_requests, bench_serving.py:927; no
    auto-download — this environment has no egress). Output length is
    the gpt turn's whitespace token count x ~1.3 unless fixed."""
    with open(dataset_path) as f:
        data = json.load(f)
    rng = random.Random(seed)
    convs = [d["conversations"] for d in data
             if len(d.get("conversations", [])) >= 2]
    rng.shuffle(convs)
    out = []
    for conv in convs:
        if len(out) >= num_prompts:
            break
        prompt = conv[0]["value"]
        completion = conv[1]["value"]
        if not prompt or not completion:
            continue
        olen = (fixed_output_len if fixed_output_len
                else max(4, int(len(completion.split()) * 1.3)))
        out.append((prompt, olen))
    if len(out) < num_prompts:
        # cycle when the file is smaller than the request count
        i = 0
        while len(out) < num_prompts and out:
            out.append(out[i % len(out)])
            i += 1
    return out


def sample_generated_shared_prefix_requests(
        num_groups: int, prompts_per_group: int, system_prompt_len: int,
        question_len: int, output_len: int, vocab_size: int = 32000,
        seed: int = 0):
    """[(input_ids, output_len)]: num_groups shared system prefixes, each
    followed by prompts_per_group distinct questions, shuffled — the
    RadixAttention cache-hit workload (reference
    sample_generated_shared_prefix_requests, bench_serving.py:1136)."""
    rng = random.Random(seed)

    def toks(n):
        return [rng.randrange(4, vocab_size - 4) for _ in range(n)]

    sys_prompts = [toks(system_prompt_len) for _ in range(num_groups)]
    reqs = []
    for g in range(num_groups):
        for _ in range(prompts_per_group):
            reqs.append((sys_prompts[g] + toks(question_len), output_len))
    rng.shuffle(reqs)
    return reqs


async def run_benchmark(base_url: str, num_prompts: int, request_rate: float,
                        input_len: int, output_len: int,
                        vocab_size: int = 32000,
                        requests=None) -> BenchmarkMetrics:
    rng = random.Random(0)
    if requests is None:
        requests = sample_random_requests(
            num_prompts, input_len, output_len, vocab_size)
    conn = aiohttp.TCPConnector(limit=0)
    timeout = aiohttp.ClientTimeout(total=6 * 3600)
    results: List[RequestResult] = []
    t0 = time.perf_counter()
    async with aiohttp.ClientSession(connector=conn, timeout=timeout) as sess:
        tasks = []
        for prompt, olen in requests:
            tasks.append(asyncio.create_task(
                _one_request(sess, base_url, prompt, olen)))
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
    ap.add_argument("--dataset", default="random",
                    choices=["random", "sharegpt",
                             "generated-shared-prefix"])
    ap.add_argument("--dataset-path", default="",
                    help="local ShareGPT-format JSON (no auto-download)")
    ap.add_argument("--sharegpt-output-len", type=int, default=None)
    ap.add_argument("--gsp-num-groups", type=int, default=8)
    ap.add_argument("--gsp-prompts-per-group", type=int, default=16)
    ap.add_argument("--gsp-system-prompt-len", type=int, default=512)
    ap.add_argument("--gsp-question-len", type=int, default=64)
    args = ap.parse_args()
    if args.dataset == "sharegpt":
        assert args.dataset_path, "--dataset-path required for sharegpt"
        reqs = sample_sharegpt_requests(
            args.dataset_path, args.num_prompts, args.sharegpt_output_len)
    elif args.dataset == "generated-shared-prefix":
        reqs = sample_generated_shared_prefix_requests(
            args.gsp_num_groups, args.gsp_prompts_per_group,
            args.gsp_system_prompt_len, args.gsp_question_len,
            args.output_len, args.vocab_size)
    else:
        reqs = None
    m = asyncio.run(run_benchmark(
        args.base_url, args.num_prompts, args.request_rate,
        args.input_len, args.output_len, args.vocab_size, requests=reqs))
    print(json.dumps(m.__dict__, indent=2))


if __name__ == "__main__":
    main()
