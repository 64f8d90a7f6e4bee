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
    import jax

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

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

    sa = ServerArgs(
        model_path="bench://llama3-8b-int4", load_format="dummy",
        dtype="bfloat16", page_size=16, quantization="int4",
        # the run needs B*(IN+OUT) + warmup tokens of KV; keep the pool
        # small to leave activation headroom next to ~4.8 GB of weights
        max_total_tokens=int(1.5 * B * (IN_LEN + OUT_LEN)),
        mem_fraction_static=0.85,
        max_running_requests=B,
        max_prefill_tokens=B * IN_LEN,
        # T=512 extend: the remote compiler handles it in ~10 min, while a
        # T=2048 ragged-attention program runs past 85 min (empirical)
        chunked_prefill_size=512,
        # 16 chained decode iterations per dispatch: the remote-execution
        # relay costs ~24 ms per dispatch+fetch round-trip, which would cap
        # B=32 single-step decode at ~1300 tok/s regardless of compute
        decode_steps_per_dispatch=16,
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

    # decode-only timing (the metric; the reference's bench_one_batch
    # reports prefill and decode separately): subtract a prefill-dominated
    # short run from the full run
    t0 = time.perf_counter()
    eng.generate(input_ids=prompts, sampling_params=short)
    dt_short = time.perf_counter() - t0
    eng.flush_cache()
    t0 = time.perf_counter()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    dt_full = time.perf_counter() - t0
    total_out = sum(len(o["output_ids"]) for o in outs)
    decode_toks = total_out - 2 * B
    toks_per_s = decode_toks / max(dt_full - dt_short, 1e-9)

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
    param_bytes = (
        quant_params // 2                            # packed nibbles
        + quant_params // 128 * 4                    # group scales
        + VOCAB * HIDDEN * 2                         # lm_head bf16
        + NUM_LAYERS * 2 * HIDDEN * 2                # norms bf16
    )
    avg_ctx = IN_LEN + OUT_LEN / 2
    kv_bytes_per_step = B * avg_ctx * NUM_LAYERS * 2 * N_KV * HEAD_DIM * 2
    step_time_roofline = (param_bytes + kv_bytes_per_step) / BW
    roofline_toks = B / step_time_roofline

    print(json.dumps({
        "metric": "decode_throughput_llama3_8b_32L_int4_bs32",
        "value": round(toks_per_s, 1),
        "unit": "tok/s",
        "vs_baseline": round(toks_per_s / roofline_toks, 4),
    }))


if __name__ == "__main__":
    main()
