"""Round benchmark: end-to-end decode throughput through the Engine
(the analog of sglang's bench_one_batch / bench_offline_throughput).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N}

vs_baseline is the fraction of the HBM-bandwidth decode roofline achieved
(BASELINE.json north-star: >= 0.90 of roofline tokens/s/chip).

Model: FULL-depth Llama-3-8B architecture with INT4 weight-only
quantization (the BASELINE.json north-star config: "Llama-3-8B INT4 AWQ
weight-only decode, single host, paged KV-cache"). The nibble-packed
Pallas dequant-GEMM (ops/quant_matmul.py) reads true 4-bit weight bytes;
lm_head stays bf16 (AWQ convention). KV donation does not alias through
the remote-execution relay, so the pool is budgeted twice.
Weights are dummy-random (model_loader.loader DummyModelLoader analog),
which exercises the identical compute path.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import json
import time

import numpy as np


def main():
    import sys

    import jax

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    # default = the BASELINE north-star INT4 config (what the driver
    # records); `python bench.py fp8_block` measures config 3 (FP8 W8,
    # recoded to int8 on v5e) for manual publication
    quant = sys.argv[1] if len(sys.argv) > 1 else "int4"

    NUM_LAYERS = 32
    HIDDEN = 4096
    N_HEADS = 32
    N_KV = 8
    HEAD_DIM = 128
    INTER = 14336
    VOCAB = 128256

    hf = dict(
        architectures=["LlamaForCausalLM"], model_type="llama",
        num_hidden_layers=NUM_LAYERS, hidden_size=HIDDEN,
        num_attention_heads=N_HEADS, num_key_value_heads=N_KV,
        intermediate_size=INTER, vocab_size=VOCAB,
        rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=8192, tie_word_embeddings=False,
    )

    B = 32
    IN_LEN = 128
    OUT_LEN = 128

    kv_dtype = os.environ.get("IAAS_BENCH_KV_DTYPE", "auto")
    sa = ServerArgs(
        model_path=f"bench://llama3-8b-{quant}", load_format="dummy",
        dtype="bfloat16", page_size=16, quantization=quant,
        kv_cache_dtype=kv_dtype,
        # the run needs B*(IN+OUT) + warmup tokens of KV; keep the pool
        # small to leave activation headroom next to ~4.8 GB of weights
        max_total_tokens=int(1.5 * B * (IN_LEN + OUT_LEN)),
        mem_fraction_static=0.85,
        max_running_requests=B,
        max_prefill_tokens=B * IN_LEN,
        # T=512 extend: the remote compiler handles it in ~10 min, while a
        # T=2048 ragged-attention program runs past 85 min (empirical)
        chunked_prefill_size=512,
        # 32 chained decode iterations per dispatch: the remote-execution
        # relay costs ~24 ms per dispatch+fetch round-trip, which would cap
        # B=32 single-step decode at ~1300 tok/s regardless of compute
        # (and still ~8% overhead at 16 steps once the step itself is fast)
        decode_steps_per_dispatch=int(
            os.environ.get("IAAS_BENCH_STEPS", "32")),
        skip_tokenizer_init=True, random_seed=0,
    )
    eng = Engine(sa, hf_config_override=hf)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(1, VOCAB - 1, size=IN_LEN).tolist() for _ in range(B)
    ]
    sp = {"max_new_tokens": OUT_LEN, "temperature": 0.0, "ignore_eos": True}

    # warmup with the FULL batch so exactly the two programs of the main
    # run (extend T=2048/B=16, decode B=32) get compiled — every extra
    # bucket costs ~30 min of remote compile on this relay
    short = {"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True}
    eng.generate(input_ids=prompts, sampling_params=short)
    eng.flush_cache()

    # full run, driven step-by-step so each request's first-token arrival
    # is timestamped. Phase split (the reference's bench_one_batch reports
    # prefill and decode separately): the prefill phase ends when the LAST
    # request gets its first token; decode throughput counts only tokens
    # generated after that instant — exact, no short-run subtraction (which
    # over-credits trimmed chain steps).
    from iaas_sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from iaas_sglang_tpu.sampling.sampling_params import SamplingParams

    eng._outputs.clear()
    rids, reqs = [], []
    t0 = time.monotonic()
    for i, ids in enumerate(prompts):
        rid = f"bench-{i}"
        # first-token times must come from the scheduler's Req objects:
        # with stream=False the engine output store is only written at
        # finish, which would collapse every TTFT onto the last step
        reqs.append(eng.scheduler.process_input(TokenizedGenerateReqInput(
            rid=rid, input_text=None, input_ids=ids,
            sampling_params=SamplingParams.from_dict(sp), stream=False)))
        rids.append(rid)
    ttft = {}
    decode_t0 = decode_base = None
    while any(eng._outputs.get(r, {}).get("finished") is None for r in rids):
        if not eng.scheduler.step() and not eng.scheduler.has_work():
            raise RuntimeError("scheduler stalled")
        for r in reqs:
            # exact per-request emit timestamps (scheduler stamps the
            # instant the first output token is appended — r4 #9; no
            # longer a step-loop-granularity upper bound)
            ts = getattr(r, "first_token_ts", None)
            if r.rid not in ttft and ts is not None:
                ttft[r.rid] = ts - t0
        if decode_t0 is None and len(ttft) == B:
            decode_t0 = t0 + max(ttft.values())
            decode_base = sum(len(r.output_ids) for r in reqs)
    eng.scheduler.drain()
    dt_full = time.monotonic() - t0
    outs = [eng._finalize(r) for r in rids]
    decode_toks = sum(len(o["output_ids"]) for o in outs) - decode_base
    assert decode_toks > 0, "phase split failed (no pure-decode tokens)"
    toks_per_s = decode_toks / max(dt_full - (decode_t0 - t0), 1e-9)
    ttfts = sorted(ttft.values())
    p50_ttft = ttfts[len(ttfts) // 2]
    # all B prefills are done once the last request has its first token
    prefill_span = max(ttfts)
    prefill_tok_s = B * IN_LEN / prefill_span

    # HBM-bandwidth decode roofline for this config on one v5e chip:
    # each decode step reads all weights once + the batch's KV once.
    # INT4: quantized projections read nibbles + f32 group scales (G=128);
    # lm_head reads bf16; embedding is a row gather (negligible).
    BW = 819e9  # v5e HBM GB/s
    quant_params = NUM_LAYERS * (
        HIDDEN * N_HEADS * HEAD_DIM * 2              # wq, wo
        + HIDDEN * N_KV * HEAD_DIM * 2               # wk, wv
        + 3 * HIDDEN * INTER                         # gate/up/down
    )
    wbytes = quant_params // 2 if quant.startswith("int4") \
        else quant_params                            # 8-bit: 1 byte/weight
    if quant == "w8a8_int8":
        # per-CHANNEL scales: one f32 per output column per projection
        scale_bytes = NUM_LAYERS * 4 * (
            N_HEADS * HEAD_DIM + 2 * N_KV * HEAD_DIM   # wq, wk, wv
            + HIDDEN                                    # wo
            + 2 * INTER + HIDDEN)                       # gate, up, down
    else:
        scale_bytes = quant_params // 128 * 4        # group-128 scales
    param_bytes = (
        wbytes
        + scale_bytes
        + VOCAB * HIDDEN * 2                         # lm_head bf16
        + NUM_LAYERS * 2 * HIDDEN * 2                # norms bf16
    )
    avg_ctx = IN_LEN + OUT_LEN / 2
    kv_bytes_per_step = B * avg_ctx * NUM_LAYERS * 2 * N_KV * HEAD_DIM * 2
    step_time_roofline = (param_bytes + kv_bytes_per_step) / BW
    roofline_toks = B / step_time_roofline

    print(json.dumps({
        "metric": f"decode_throughput_llama3_8b_32L_{quant}_bs32" + (
            f"_kv{kv_dtype}" if kv_dtype != "auto" else ""),
        "value": round(toks_per_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / roofline_toks, 4),
        "prefill_tok_s": round(prefill_tok_s, 1),
        "p50_ttft_ms": round(p50_ttft * 1000, 1),
        "max_ttft_ms": round(prefill_span * 1000, 1),
    }))


if __name__ == "__main__":
    main()
