"""Online serving benchmark on the real TPU (VERDICT r3 missing #1).

Launches the HTTP server with the BASELINE north-star config (full-depth
Llama-3-8B INT4, dummy weights, one v5e chip) and drives it with
bench_serving's Poisson open-loop client at several request rates —
the reference's primary protocol (bench_serving.py:703-788, blog_v0_2).

Buckets are pinned to the offline bench's two compiled shapes
(decode B=32 / extend T=512) so the run reuses the same cached
executables; smaller batches pad (honestly reflected in throughput).

Usage: python scripts/bench_serving_tpu.py [rates...] (default 2 6 inf)
Prints one JSON line per rate.
"""

import json
import os
import subprocess
import sys
import time
from pathlib import Path

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

REPO = Path(__file__).resolve().parent.parent

HF = dict(
    architectures=["LlamaForCausalLM"], model_type="llama",
    num_hidden_layers=32, hidden_size=4096,
    num_attention_heads=32, num_key_value_heads=8,
    intermediate_size=14336, vocab_size=128256,
    rms_norm_eps=1e-5, rope_theta=500000.0,
    max_position_embeddings=8192, tie_word_embeddings=False,
)

B, IN_LEN, OUT_LEN = 32, 128, 64
PORT = 31811


def launch_server(model_dir: str) -> subprocess.Popen:
    env = dict(os.environ)
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
    args = [
        sys.executable, "-m", "iaas_sglang_tpu.launch_server",
        "--model-path", model_dir, "--load-format", "dummy",
        "--quantization", "int4", "--dtype", "bfloat16",
        "--page-size", "16", "--skip-tokenizer-init",
        "--max-total-tokens", str(int(1.5 * B * (IN_LEN + OUT_LEN))),
        "--mem-fraction-static", "0.85",
        "--max-running-requests", str(B),
        "--max-prefill-tokens", str(B * IN_LEN),
        "--chunked-prefill-size", "512",
        "--decode-steps-per-dispatch", "32",
        "--decode-bs-buckets", str(B),
        "--prefill-token-buckets", "512",
        "--random-seed", "0",
        "--host", "127.0.0.1", "--port", str(PORT),
    ]
    extra = os.environ.get("IAAS_SERVE_EXTRA", "")
    if extra:
        args += extra.split()
    return subprocess.Popen(args, cwd=str(REPO), env=env)


def wait_health(proc, timeout=3600):
    import requests

    t0 = time.time()
    while time.time() - t0 < timeout:
        if proc.poll() is not None:
            raise RuntimeError(f"server died rc={proc.returncode}")
        try:
            r = requests.get(f"http://127.0.0.1:{PORT}/health", timeout=2)
            if r.status_code == 200:
                return
        except Exception:
            pass
        time.sleep(2.0)
    raise TimeoutError("server never became healthy")


def main():
    import asyncio

    sys.path.insert(0, str(REPO))
    from iaas_sglang_tpu.bench_serving import (
        run_benchmark, sample_random_requests)

    rates = [float(a) if a != "inf" else float("inf")
             for a in (sys.argv[1:] or ["2", "6", "inf"])]
    model_dir = "/tmp/bench_llama8b_cfg"
    os.makedirs(model_dir, exist_ok=True)
    with open(os.path.join(model_dir, "config.json"), "w") as f:
        json.dump(HF, f)

    proc = launch_server(model_dir)
    try:
        wait_health(proc)
        base = f"http://127.0.0.1:{PORT}"
        # warmup: compile/load the two bucket programs before timing
        reqs = sample_random_requests(8, IN_LEN, 4, HF["vocab_size"])
        asyncio.run(run_benchmark(base, 8, float("inf"),
                                  IN_LEN, 4, requests=reqs))
        import requests as rq
        for rate in rates:
            n = 64 if rate != float("inf") else 96
            reqs = sample_random_requests(
                n, IN_LEN, OUT_LEN, HF["vocab_size"])
            pre = rq.get(f"{base}/get_server_info", timeout=10).json()[
                "internal_states"][0]
            m = asyncio.run(run_benchmark(
                base, n, rate, IN_LEN, OUT_LEN, requests=reqs))
            post = rq.get(f"{base}/get_server_info", timeout=10).json()[
                "internal_states"][0]
            print(json.dumps({
                "metric": "online_serving_llama3_8b_int4",
                "dataset": f"random {IN_LEN}in/{OUT_LEN}out x{n}",
                "request_rate_qps": rate if rate != float("inf") else "inf",
                **{k: round(v, 2) if isinstance(v, float) else v
                   for k, v in m.__dict__.items()},
                # chain engagement DURING this rate's run (VERDICT r3 #3)
                "mchain_steps": post.get("mchain_steps", 0)
                - pre.get("mchain_steps", 0),
                "pchain_steps": post.get("pchain_steps", 0)
                - pre.get("pchain_steps", 0),
            }), flush=True)
    finally:
        proc.send_signal(2)
        try:
            proc.wait(timeout=30)
        except subprocess.TimeoutExpired:
            proc.kill()


if __name__ == "__main__":
    main()
