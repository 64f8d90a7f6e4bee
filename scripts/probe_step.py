"""In-situ decode-step probe: drives the real Engine (8-layer llama-8B
geometry, INT4) and times every scheduler.step() dispatch, separating
prefill chunks from decode chains. Localizes engine-vs-microbench gaps:
expected per-decode-step from kernel microbenches at 8 layers is
~ 8/32*(5.1 GEMM + 2.2 attn) + 1.3 lm_head ~= 3.1 ms.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time

import numpy as np


def main():
    import sys

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs
    from iaas_sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from iaas_sglang_tpu.sampling.sampling_params import SamplingParams

    L = 32 if "--full" in sys.argv else 8
    hf = dict(
        architectures=["LlamaForCausalLM"], model_type="llama",
        num_hidden_layers=L, hidden_size=4096,
        num_attention_heads=32, num_key_value_heads=8,
        intermediate_size=14336, vocab_size=128256,
        rms_norm_eps=1e-5, rope_theta=500000.0,
        max_position_embeddings=8192, tie_word_embeddings=False,
    )
    B, IN_LEN, OUT_LEN = 32, 128, (128 if "--out128" in sys.argv else 96)
    sa = ServerArgs(
        model_path="probe://llama8L-int4", load_format="dummy",
        dtype="bfloat16", page_size=16, quantization="int4",
        max_total_tokens=int(1.5 * B * (IN_LEN + OUT_LEN)),
        mem_fraction_static=0.85, max_running_requests=B,
        max_prefill_tokens=B * IN_LEN, chunked_prefill_size=512,
        decode_steps_per_dispatch=32,
        disable_overlap_schedule="--no-overlap" in sys.argv,
        skip_tokenizer_init=True, random_seed=0,
    )
    print("argv:", sys.argv[1:], "L:", L, flush=True)
    eng = Engine(sa, hf_config_override=hf)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(1, 128255, size=IN_LEN).tolist()
               for _ in range(B)]
    sp = {"max_new_tokens": OUT_LEN, "temperature": 0.0, "ignore_eos": True}
    short = {"max_new_tokens": 2, "temperature": 0.0, "ignore_eos": True}
    eng.generate(input_ids=prompts, sampling_params=short)  # warm compiles
    eng.flush_cache()
    eng._outputs.clear()

    rids = []
    for i, ids in enumerate(prompts):
        rid = f"p{i}"
        eng.scheduler.process_input(TokenizedGenerateReqInput(
            rid=rid, input_text=None, input_ids=ids,
            sampling_params=SamplingParams.from_dict(sp), stream=False))
        rids.append(rid)
    times = []
    while any(eng._outputs.get(r, {}).get("finished") is None for r in rids):
        t0 = time.perf_counter()
        prog = eng.scheduler.step()
        dt = time.perf_counter() - t0
        if prog:
            times.append(dt)
    eng.scheduler.drain()
    for r in rids:
        eng._finalize(r)
    print("dispatch times (ms):",
          [round(t * 1000, 1) for t in times])
    chains = [t for t in times if t > 0.05]  # chains dwarf bookkeeping steps
    if len(chains) > 2:
        # drop the first (cold) chain chronologically; steady chains / 32
        steady = sorted(chains[1:])
        per = np.mean(steady[-3:]) / 32
        print(f"steady chain: {np.mean(steady[-3:])*1000:.1f} ms "
              f"-> {per*1000:.2f} ms/step at B={B}, L={L}")


if __name__ == "__main__":
    main()
