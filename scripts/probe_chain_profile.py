"""Op-level profile of the multi-step decode chain, driving ModelRunner
directly (no Engine, no extend program — the T=512 extend compile takes
10-17 min through the relay while chain programs compile in seconds).

Measures: (1) slope per-step cost (t(N=32)-t(N=8))/24 with the relay RTT
cancelled; (2) an xprof trace of chain dispatches, parsed in-process with
jax.profiler.ProfileData — top ops by self time localize the ~0.5
ms/layer/step residual that kernel microbenches don't predict.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time
from collections import defaultdict

import numpy as np


L = 8
HF = dict(
    architectures=["LlamaForCausalLM"], model_type="llama",
    num_hidden_layers=L, hidden_size=4096,
    num_attention_heads=32, num_key_value_heads=8,
    intermediate_size=14336, vocab_size=128256,
    rms_norm_eps=1e-5, rope_theta=500000.0,
    max_position_embeddings=8192, tie_word_embeddings=False,
)
B, CTX = 32, 192


def make_hb(runner, sa, n_steps):
    from iaas_sglang_tpu.mem_cache.allocator import PageAllocator
    from iaas_sglang_tpu.model_executor.forward_batch import ForwardMode
    from iaas_sglang_tpu.model_executor.model_runner import HostBatch

    ps = sa.page_size
    alloc = PageAllocator(runner.num_usable_pages, ps)
    page_tables = []
    out_slots = np.zeros(B, np.int32)
    for b in range(B):
        pages = alloc.alloc(-(-(CTX + n_steps + 1) // ps))
        page_tables.append(pages)
        out_slots[b] = pages[CTX // ps] * ps + CTX % ps
    return HostBatch(
        mode=ForwardMode.DECODE,
        input_ids=np.full(B, 7, np.int32),
        positions=np.full(B, CTX, np.int32),
        out_slots=out_slots,
        page_tables=page_tables,
        seq_lens=np.full(B, CTX + 1, np.int32),
        q_lens=np.ones(B, np.int32),
        temperatures=np.zeros(B, np.float32),
        top_ks=np.full(B, -1, np.int32),
        top_ps=np.ones(B, np.float32),
        min_ps=np.zeros(B, np.float32),
        seeds=np.zeros(B, np.uint32),
        steps=np.zeros(B, np.int32),
        multi_steps=n_steps,
    )


def time_chain(runner, sa, n_steps, iters=6):
    hb = make_hb(runner, sa, n_steps)
    runner.forward(hb)          # compile + warm
    runner.fetch_tokens(hb)
    t0 = time.perf_counter()
    for _ in range(iters):
        hb = make_hb(runner, sa, n_steps)
        runner.forward(hb)
        runner.fetch_tokens(hb)
    dt = (time.perf_counter() - t0) / iters
    print(f"chain N={n_steps}: {dt*1000:.1f} ms/dispatch", flush=True)
    return dt


def main():
    import jax

    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.model_executor.model_runner import ModelRunner
    from iaas_sglang_tpu.server_args import ServerArgs

    import sys

    quant = "fp8_block" if "--fp8" in sys.argv else "int4"
    cfg = ModelConfig.from_hf(HF, model_path=f"probe://chain-{quant}")
    sa = ServerArgs(
        model_path=f"probe://chain-{quant}", load_format="dummy",
        dtype="bfloat16", page_size=16, quantization=quant,
        max_total_tokens=B * 256 + 256, mem_fraction_static=0.85,
        max_running_requests=B, max_prefill_tokens=B * 128,
        skip_tokenizer_init=True, random_seed=0,
        enable_quant_fusion="--fuse" in sys.argv,
        quantize_lm_head="--qhead" in sys.argv,
    )
    print("flags:", sys.argv[1:], flush=True)
    runner = ModelRunner(sa, cfg)

    t8 = time_chain(runner, sa, 8)
    t32 = time_chain(runner, sa, 32)
    per = (t32 - t8) / 24
    print(f"slope per-step: {per*1000:.2f} ms at B={B} L={L} ctx={CTX}")

    # ---- op-level trace of two N=32 dispatches
    trace_dir = "/tmp/xprof_chain"
    hb = make_hb(runner, sa, 32)
    runner.forward(hb); runner.fetch_tokens(hb)
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            hb = make_hb(runner, sa, 32)
            runner.forward(hb)
            runner.fetch_tokens(hb)

    # parse: aggregate device-plane event durations by op name
    from jax.profiler import ProfileData

    import glob
    xs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    print("xplane files:", xs, flush=True)
    if not xs:
        return
    pd = ProfileData.from_file(xs[-1])
    for plane in pd.planes:
        agg = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns
                agg[ev.name] += d
                total += d
        if not agg:
            continue
        print(f"\n== plane: {plane.name} (total {total/1e6:.1f} ms) ==")
        for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
            print(f"  {d/1e6:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
