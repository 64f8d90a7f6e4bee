"""Prometheus metrics (analog of sglang srt/metrics/collector.py:150
SchedulerMetricsCollector + :300 TokenizerMetricsCollector).

Scheduler-side gauges are updated in the scheduler process and shipped to
the main process piggybacked on the output stream (the reference uses
prometheus multiprocess mode; a ZMQ piggyback avoids the shared-dir
setup); request histograms are recorded in the tokenizer manager.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional


@dataclasses.dataclass
class SchedulerStats:
    """Snapshot emitted by the scheduler (gauges)."""

    num_running_reqs: int = 0
    num_waiting_reqs: int = 0
    token_usage: float = 0.0
    cache_hit_rate: float = 0.0
    gen_throughput: float = 0.0
    num_retracted_reqs: int = 0
    num_used_pages: int = 0
    num_total_pages: int = 0
    # speculative decoding: mean accepted tokens per draft step
    # (reference collector.py:208 spec_accept_length)
    spec_accept_length: float = 0.0
    # grammar-constrained requests currently scheduled (the reference's
    # grammar-queue gauge; compiles here are synchronous at admission)
    num_grammar_reqs: int = 0
    # PD disaggregation: streamed transfers awaiting chunks (decode side)
    num_disagg_pending_reqs: int = 0


class SchedulerMetricsCollector:
    def __init__(self, labels: Optional[Dict[str, str]] = None):
        from prometheus_client import Gauge

        self.labels = labels or {}
        labelnames = list(self.labels)
        mk = lambda name, doc: Gauge(
            name, doc, labelnames=labelnames, multiprocess_mode="mostrecent"
        ) if labelnames else Gauge(name, doc)
        self.num_running_reqs = mk(
            "sglang_tpu:num_running_reqs", "number of running requests")
        self.num_waiting_reqs = mk(
            "sglang_tpu:num_waiting_reqs", "number of queued requests")
        self.token_usage = mk(
            "sglang_tpu:token_usage", "KV pool token usage fraction")
        self.cache_hit_rate = mk(
            "sglang_tpu:cache_hit_rate", "radix prefix cache hit rate")
        self.gen_throughput = mk(
            "sglang_tpu:gen_throughput", "decode tokens/s")
        self.num_retracted_reqs = mk(
            "sglang_tpu:num_retracted_reqs", "retracted request count")
        self.spec_accept_length = mk(
            "sglang_tpu:spec_accept_length",
            "mean accepted tokens per speculative draft step")
        self.num_grammar_reqs = mk(
            "sglang_tpu:num_grammar_reqs",
            "grammar-constrained requests currently scheduled")
        self.num_disagg_pending_reqs = mk(
            "sglang_tpu:num_disagg_pending_reqs",
            "PD streamed transfers awaiting KV chunks")

    def log_stats(self, stats: SchedulerStats) -> None:
        for f in ("num_running_reqs", "num_waiting_reqs", "token_usage",
                  "cache_hit_rate", "gen_throughput", "num_retracted_reqs",
                  "spec_accept_length", "num_grammar_reqs",
                  "num_disagg_pending_reqs"):
            g = getattr(self, f)
            v = getattr(stats, f)
            (g.labels(**self.labels) if self.labels else g).set(v)


class TokenizerMetricsCollector:
    def __init__(self, labels: Optional[Dict[str, str]] = None,
                 ttft_buckets=None, itl_buckets=None, e2e_buckets=None):
        """Histogram bucket edges are configurable (reference
        server_args.py:105-112 --bucket-time-to-first-token etc.)."""
        from prometheus_client import Counter, Histogram

        self.labels = labels or {}
        ln = list(self.labels)

        def counter(name, doc):
            return Counter(name, doc, labelnames=ln) if ln else Counter(name, doc)

        def hist(name, doc, buckets):
            return (Histogram(name, doc, labelnames=ln, buckets=buckets)
                    if ln else Histogram(name, doc, buckets=buckets))

        self.prompt_tokens_total = counter(
            "sglang_tpu:prompt_tokens_total", "total prefill tokens")
        self.generation_tokens_total = counter(
            "sglang_tpu:generation_tokens_total", "total generated tokens")
        self.num_requests_total = counter(
            "sglang_tpu:num_requests_total", "total finished requests")
        self.histogram_time_to_first_token = hist(
            "sglang_tpu:time_to_first_token_seconds", "TTFT",
            ttft_buckets or [0.05, 0.1, 0.25, 0.5, 1, 2, 5, 10, 20, 60])
        self.histogram_inter_token_latency = hist(
            "sglang_tpu:inter_token_latency_seconds", "ITL",
            itl_buckets or [0.002, 0.005, 0.01, 0.02, 0.05, 0.1, 0.25, 1])
        self.histogram_e2e_request_latency = hist(
            "sglang_tpu:e2e_request_latency_seconds", "end-to-end latency",
            e2e_buckets or [0.1, 0.25, 0.5, 1, 2, 5, 10, 30, 60, 120])

    def _obs(self, metric, value):
        (metric.labels(**self.labels) if self.labels else metric).observe(value)

    def _inc(self, metric, value):
        (metric.labels(**self.labels) if self.labels else metric).inc(value)

    def observe_one_finished_request(self, prompt_tokens: int,
                                     generation_tokens: int,
                                     e2e_latency: float) -> None:
        self._inc(self.prompt_tokens_total, prompt_tokens)
        self._inc(self.generation_tokens_total, generation_tokens)
        self._inc(self.num_requests_total, 1)
        self._obs(self.histogram_e2e_request_latency, e2e_latency)

    def observe_time_to_first_token(self, v: float) -> None:
        self._obs(self.histogram_time_to_first_token, v)

    def observe_inter_token_latency(self, v: float) -> None:
        self._obs(self.histogram_inter_token_latency, v)
