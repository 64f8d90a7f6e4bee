"""Mini PD load balancer (analog of sglang disaggregation/mini_lb.py:51):
pairs a prefill server with a decode server per request — prefill runs
the prompt and hands KV off over the transfer socket; the LB then awaits
the decode server's completion of that rid.

    python -m iaas_sglang_tpu.disaggregation.mini_lb \
        --port 30100 \
        --prefill http://p:30000 --prefill-ingest tcp://p... (unused) \
        --decode http://d:30001 --decode-ingest tcp://d:31001
"""

from __future__ import annotations

import argparse
import itertools
import uuid

import aiohttp
from aiohttp import web


class MiniLB:
    def __init__(self, prefill_urls, decode_urls, decode_ingest_urls):
        self.prefill_urls = prefill_urls
        self.decode_urls = decode_urls
        self.decode_ingest_urls = decode_ingest_urls
        self._rr = itertools.count()

    async def handle_generate(self, request: web.Request) -> web.Response:
        body = await request.json()
        i = next(self._rr)
        prefill = self.prefill_urls[i % len(self.prefill_urls)]
        di = i % len(self.decode_urls)
        decode, ingest = self.decode_urls[di], self.decode_ingest_urls[di]
        rid = body.get("rid") or uuid.uuid4().hex
        body["rid"] = rid
        body["disagg_decode_url"] = ingest
        async with aiohttp.ClientSession() as sess:
            async with sess.post(f"{prefill}/generate", json=body) as r:
                pre = await r.json()
                if r.status != 200:
                    return web.json_response(pre, status=r.status)
            fin = (pre.get("meta_info") or {}).get("finish_reason") or {}
            if fin.get("type") != "disagg_handoff":
                # finished entirely at prefill (e.g. 1-token generations)
                return web.json_response(pre)
            async with sess.get(f"{decode}/disagg_wait/{rid}") as r2:
                out = await r2.json()
                return web.json_response(out, status=r2.status)

    async def handle_health(self, request: web.Request) -> web.Response:
        return web.Response(text="ok")


def build_lb_app(prefill_urls, decode_urls, decode_ingest_urls) -> web.Application:
    lb = MiniLB(prefill_urls, decode_urls, decode_ingest_urls)
    app = web.Application()
    app.router.add_post("/generate", lb.handle_generate)
    app.router.add_get("/health", lb.handle_health)
    return app


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=30100)
    ap.add_argument("--prefill", action="append", required=True)
    ap.add_argument("--decode", action="append", required=True)
    ap.add_argument("--decode-ingest", action="append", required=True)
    args = ap.parse_args()
    app = build_lb_app(args.prefill, args.decode, args.decode_ingest)
    web.run_app(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
