"""Quantization fidelity: INT4 (nibble-packed Pallas dequant-GEMM) vs BF16
of the SAME dummy-loaded weights, on the real TPU.

The BASELINE gate is "GSM8K within 0.5 pt of BF16 at the same bit-width" —
this sandbox has no real checkpoints and no GSM8K dataset (zero egress),
so this script publishes the measurable proxy instead: greedy-token
agreement and mean |top-1 logprob delta| between the INT4 and BF16 builds
of an identical 12-layer Llama-8B-geometry model (full 8B BF16 does not
fit 15.75 GB HBM). When real weights are present, run
`python -m iaas_sglang_tpu.test_utils.simple_eval gsm8k --data ... --base-url ...`
against a served INT4 + BF16 pair instead (reference:
test/srt/test_nightly_gsm8k_eval.py).

Prints one JSON line with agreement stats.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import json

import numpy as np


HF = dict(
    architectures=["LlamaForCausalLM"], model_type="llama",
    num_hidden_layers=12, hidden_size=4096,
    num_attention_heads=32, num_key_value_heads=8,
    intermediate_size=14336, vocab_size=128256,
    rms_norm_eps=1e-5, rope_theta=500000.0,
    max_position_embeddings=8192, tie_word_embeddings=False,
)
B, IN_LEN, OUT_LEN = 8, 64, 64


def run(quant):
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path=f"bench://llama3-12L-{quant or 'bf16'}",
        load_format="dummy", dtype="bfloat16", page_size=16,
        quantization=quant,
        max_total_tokens=int(1.5 * B * (IN_LEN + OUT_LEN)),
        mem_fraction_static=0.85, max_running_requests=B,
        max_prefill_tokens=B * IN_LEN, chunked_prefill_size=512,
        decode_steps_per_dispatch=1,  # logprobs force per-step anyway
        skip_tokenizer_init=True, random_seed=0,
    )
    eng = Engine(sa, hf_config_override=HF)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 128255, size=IN_LEN).tolist()
               for _ in range(B)]
    outs = eng.generate(
        input_ids=prompts,
        sampling_params={"max_new_tokens": OUT_LEN, "temperature": 0.0,
                         "ignore_eos": True},
        return_logprob=True,
    )
    toks = [o["output_ids"] for o in outs]
    # output_token_logprobs: flat list of chosen-token logprob floats
    lps = [list(o["meta_info"].get("output_token_logprobs", []))
           for o in outs]
    eng.shutdown()
    del eng
    import gc
    import jax
    gc.collect()
    jax.clear_caches()
    return toks, lps


def compare(name, ref, test):
    t_bf, lp_bf = ref
    t_q, lp_q = test
    agree = total = 0
    first_div = []
    for a, b in zip(t_bf, t_q):
        n = min(len(a), len(b))
        div = next((i for i in range(n) if a[i] != b[i]), n)
        first_div.append(div)
        # token agreement counted up to first divergence: after one
        # different token the sequences legitimately fork
        agree += div
        total += n
    dlp = []
    for s, (a, b) in enumerate(zip(lp_bf, lp_q)):
        # chosen-token logprob drift is only comparable while the two
        # sequences are still token-identical
        for i in range(min(len(a), len(b), first_div[s])):
            dlp.append(abs(a[i] - b[i]))
    print(json.dumps({
        "metric": f"{name}_vs_bf16_greedy_agreement_llama3_12L",
        "agreement": round(agree / max(total, 1), 4),
        "mean_first_divergence_step": round(float(np.mean(first_div)), 1),
        "out_len": OUT_LEN, "batch": B,
        "mean_abs_dlogprob": round(float(np.mean(dlp)), 4) if dlp else None,
    }), flush=True)


def main():
    ref = run(None)
    compare("int4", ref, run("int4"))
    compare("fp8_block", ref, run("fp8_block"))


if __name__ == "__main__":
    main()
