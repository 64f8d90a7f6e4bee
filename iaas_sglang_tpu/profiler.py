"""Remote profiler CLI (analog of reference python/sglang/profiler.py):
triggers /start_profile, optionally fires load, then /stop_profile on a
running server. The scheduler runs jax.profiler under the hood; traces
land in --output-dir (view with tensorboard or xprof).

    python -m iaas_sglang_tpu.profiler --url http://localhost:30000 \
        --num-requests 8 --output-dir /tmp/trace
"""

from __future__ import annotations

import argparse
import json
import urllib.request


def _post(url: str, path: str, body: dict) -> dict:
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--url", default="http://127.0.0.1:30000")
    p.add_argument("--output-dir", default="/tmp/iaas_sglang_tpu_trace")
    p.add_argument("--num-requests", type=int, default=4,
                   help="generate requests fired while profiling")
    p.add_argument("--input-len", type=int, default=128)
    p.add_argument("--output-len", type=int, default=32)
    args = p.parse_args()

    out = _post(args.url, "/start_profile", {"output_dir": args.output_dir})
    print("start_profile:", out)
    for i in range(args.num_requests):
        _post(args.url, "/generate", {
            "input_ids": list(range(1, args.input_len + 1)),
            "sampling_params": {"max_new_tokens": args.output_len,
                                "temperature": 0.0, "ignore_eos": True},
        })
    out = _post(args.url, "/stop_profile", {})
    print("stop_profile:", out)
    print(f"trace written under {args.output_dir}")


if __name__ == "__main__":
    main()
