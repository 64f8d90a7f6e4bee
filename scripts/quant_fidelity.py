"""Quantization fidelity proxy: INT4 / FP8-blockwise vs BF16 of the SAME
dummy-loaded weights, on the real TPU.

The BASELINE gate is "GSM8K within 0.5 pt of BF16 at the same bit-width" —
this sandbox has no real checkpoints and no GSM8K dataset (zero egress),
so this publishes the measurable proxy instead. NOTE ON METHOD: free-run
greedy agreement is uninformative with random weights (near-uniform
logits make the top-1 margin smaller than ANY quantization noise, so
sequences fork at step ~0 by construction). Instead both models are
TEACHER-FORCED through the same sequence (prompt + the BF16 model's own
greedy continuation) and compared per position:

  * argmax agreement   — fraction of positions where the quantized
                         model's top-1 equals BF16's top-1
  * top5 overlap       — mean |top5_bf16 ∩ top5_quant| / 5
  * mean |Δ logprob|   — of BF16's chosen token under both models
  * margin percentile  — the logit margin BF16's argmax wins by, vs the
                         typical |Δ logit| the quantization introduces

When real weights are present, run
`python -m iaas_sglang_tpu.test_utils.simple_eval gsm8k --data ...`
against served INT4 + BF16 pairs instead (reference:
test/srt/test_nightly_gsm8k_eval.py).

Prints one JSON line per quantization flavor.
"""

import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
B, IN_LEN, OUT_LEN = 4, 64, 64


def make_runner(quant):
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.model_executor.model_runner import ModelRunner
    from iaas_sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path=f"fid://llama3-12L-{quant or 'bf16'}",
        load_format="dummy", dtype="bfloat16", page_size=16,
        quantization=quant, max_total_tokens=2048,
        mem_fraction_static=0.85, max_running_requests=B,
        max_prefill_tokens=256, skip_tokenizer_init=True, random_seed=0,
    )
    cfg = ModelConfig.from_hf(HF, model_path=sa.model_path)
    return ModelRunner(sa, cfg), sa


def teacher_logits(runner, sa, seqs):
    """All-position logits for each sequence [T, V] (one extend each)."""
    from tests.utils import RawDriver

    drv = RawDriver(runner, sa.page_size)
    outs = []
    for s in seqs:
        lg = np.asarray(drv.prefill_logits(list(s)), np.float32)
        outs.append(lg)
        drv.alloc.free(drv._last_pages)
    return outs


def main():
    rng = np.random.default_rng(7)
    prompts = [rng.integers(1, 128255, size=IN_LEN).tolist()
               for _ in range(B)]

    import gc

    import jax

    from tests.utils import RawDriver

    runner, sa = make_runner(None)
    drv = RawDriver(runner, sa.page_size)
    seqs = [p + drv.generate_greedy(p, OUT_LEN) for p in prompts]
    ref_logits = teacher_logits(runner, sa, seqs)
    # positions that predict the continuation: IN_LEN-1 .. len-2
    sl = slice(IN_LEN - 1, -1)
    ref_out = [lg[sl] for lg in ref_logits]
    ref_top1 = [lg.argmax(-1) for lg in ref_out]
    # the margin the BF16 argmax wins by (how much noise a flip needs)
    margins = np.concatenate([
        np.sort(lg, axis=-1)[:, -1] - np.sort(lg, axis=-1)[:, -2]
        for lg in ref_out])
    del runner, drv
    gc.collect()
    jax.clear_caches()

    for quant in ("int4", "int8", "fp8_block"):
        runner, sa = make_runner(quant)
        q_logits = teacher_logits(runner, sa, seqs)
        q_out = [lg[sl] for lg in q_logits]
        agree = np.concatenate([
            (q.argmax(-1) == t) for q, t in zip(q_out, ref_top1)])
        top5_ov = []
        dlp = []
        dlog = []
        for q, r, t in zip(q_out, ref_out, ref_top1):
            q5 = np.argsort(q, axis=-1)[:, -5:]
            r5 = np.argsort(r, axis=-1)[:, -5:]
            for a, b in zip(q5, r5):
                top5_ov.append(len(set(a) & set(b)) / 5.0)
            # chosen-token logprob drift (teacher token = bf16 argmax)
            qlse = q - (np.log(np.exp(
                q - q.max(-1, keepdims=True)).sum(-1, keepdims=True))
                + q.max(-1, keepdims=True))
            rlse = r - (np.log(np.exp(
                r - r.max(-1, keepdims=True)).sum(-1, keepdims=True))
                + r.max(-1, keepdims=True))
            idx = np.arange(len(t))
            dlp.extend(np.abs(qlse[idx, t] - rlse[idx, t]))
            dlog.extend(np.abs(q - r).mean(-1))
        # margin-conditioned agreement (r4, VERDICT #7): random weights
        # give near-zero top-1 margins, so RAW agreement is uninformative
        # — but agreement AS A FUNCTION of the BF16 margin lets a reader
        # map the proxy onto a real checkpoint: flips need noise > margin,
        # real instruction-tuned models sit at multi-logit margins, so the
        # margin where agreement saturates bounds the plausible delta-acc.
        qcat = np.concatenate([q.argmax(-1) for q in q_out])
        tcat = np.concatenate(ref_top1)
        order = np.argsort(margins)
        deciles = {}
        nq = 10
        for d in range(nq):
            seg = order[d * len(order) // nq:(d + 1) * len(order) // nq]
            deciles[f"p{d*10}-{d*10+10}"] = [
                round(float(np.median(margins[seg])), 3),
                round(float((qcat[seg] == tcat[seg]).mean()), 4)]
        # smallest margin above which agreement >= 99%
        agree_sorted = (qcat[order] == tcat[order]).astype(np.float64)
        csum = np.cumsum(agree_sorted[::-1])[::-1]
        cnt = np.arange(len(csum), 0, -1)
        tail_acc = csum / cnt
        ix = np.argmax(tail_acc >= 0.99) if (tail_acc >= 0.99).any() \
            else len(order) - 1
        m99 = float(margins[order][ix])
        print(json.dumps({
            "metric": f"{quant}_vs_bf16_teacher_forced_llama3_12L",
            "argmax_agreement": round(float(agree.mean()), 4),
            "top5_overlap": round(float(np.mean(top5_ov)), 4),
            "mean_abs_dlogprob_chosen": round(float(np.mean(dlp)), 4),
            "mean_abs_dlogit": round(float(np.mean(dlog)), 4),
            "bf16_top1_margin_p50": round(float(np.median(margins)), 4),
            "agreement_by_margin_decile": deciles,
            "margin_at_99pct_agreement": round(m99, 3),
            "note": ("random dummy weights -> near-uniform logits; "
                     "agreement conditioned on the BF16 top-1 margin is "
                     "the informative signal: positions whose margin "
                     "exceeds margin_at_99pct_agreement keep their "
                     "argmax under this quantization. Real checkpoints "
                     "sit at multi-logit margins."),
            "positions": int(agree.size), "batch": B,
        }), flush=True)
        if quant == "int4":
            w4a8_fidelity(runner)
        del runner
        gc.collect()
        jax.clear_caches()


def w4a8_fidelity(runner):
    """Integer-dot W4A8 decode path vs the W4A16 f32-dequant chain on the
    SAME loaded AWQ-format weights (r4: the INT4 decode default moved to
    int8 activation quant + int8 MXU dots — this bounds the activation-
    quantization error the switch adds)."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.quant_matmul import (
        int4_matmul_dma_stacked, q_matmul_dma_stacked_a8,
        quantize_act_int8)

    layers = runner.params["layers"]
    # fused qkv/gate-up is default-on: the gate projection lives in
    # w_gateup_fused there, w_gate when fusion is off
    qw = layers["w_gate"] if "w_gate" in layers else layers["w_gateup_fused"]
    rng = np.random.default_rng(3)
    T = 32
    K = qw.q.shape[1] * 2
    group = K // qw.scale.shape[1]
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32) * 0.5,
                    jnp.bfloat16)
    li = 0
    ref = np.asarray(int4_matmul_dma_stacked(
        x, qw.q, qw.scale, qw.zero_scale, li, group=group), np.float32)
    xq, xs, rs = quantize_act_int8(x, group)
    got = np.asarray(q_matmul_dma_stacked_a8(
        xq, xs, rs, qw.q, qw.scale, qw.zero_scale, li, group=group),
        np.float32)
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-9)
    print(json.dumps({
        "metric": "w4a8_vs_w4a16_same_weights_gate_proj",
        "mean_rel_err": round(float(rel.mean()), 5),
        "p99_rel_err": round(float(np.percentile(rel, 99)), 5),
        "note": ("per-token int8 activation quantization error of the "
                 "integer-dot decode GEMM vs the f32 dequant chain on "
                 "identical weights; W8A8-class error (reference serves "
                 "w8a8_int8/qserve W4A8 with the same scheme)"),
    }), flush=True)


if __name__ == "__main__":
    main()
