"""Quantization: group-wise INT4/INT8 weight-only and FP8 — op-level
correctness vs the dequantized reference, plus end-to-end generation
accuracy against the BF16 model (analog of sgl-kernel/tests/test_*gemm
and the FP8-vs-BF16 accuracy gates in BASELINE.md)."""

import numpy as np
import pytest

from tests.utils import build_hf_model, load_hf_weights_into, make_runner, RawDriver

QTINY = dict(
    architectures=["LlamaForCausalLM"],
    model_type="llama",
    num_hidden_layers=2,
    hidden_size=128,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=256,
    vocab_size=512,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    max_position_embeddings=512,
    tie_word_embeddings=False,
)

PROMPT = [3, 17, 94, 201, 5, 77, 150, 42, 9, 133, 61, 250, 301]


@pytest.mark.parametrize("method", ["int4", "int8", "fp8"])
def test_qmatmul_matches_dequant(method):
    import jax.numpy as jnp

    from iaas_sglang_tpu.quantization.qlinear import (
        QuantizedWeight,
        dequantize,
        qmatmul,
        quantize_weight,
    )

    rng = np.random.default_rng(0)
    w = rng.standard_normal((256, 192)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((8, 256)).astype(np.float32))
    import jax
    import ml_dtypes

    from iaas_sglang_tpu.parallel.mesh import make_mesh

    # int4 numpy arrays must be placed with an explicit NamedSharding —
    # uncommitted device_put of int4 hits a jax reshard recursion on the
    # multi-device CPU backend (the loader always uses explicit shardings)
    mesh_ctx = make_mesh(1, 1)
    q_np, s_np, dt = quantize_weight(w, method)
    # int4 is nibble-packed into an int8 container [in/2, out]
    qw = QuantizedWeight(
        q=jax.device_put(q_np, mesh_ctx.replicated),
        scale=jnp.asarray(s_np), packed=(method == "int4"))
    ref = x @ dequantize(qw, jnp.float32)
    out = qmatmul(x, qw, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)
    # quantization error vs the original fp weight stays bounded
    err = np.abs(np.asarray(dequantize(qw, jnp.float32)) - w).max()
    bound = {"int4": 0.05 / 7, "int8": 0.05 / 127, "fp8": 0.05 / 16}[method]
    assert err < max(bound * 20, 5e-3)


@pytest.mark.parametrize("method", ["int8", "fp8", "int4"])
def test_quantized_generation(method):
    hf_model = build_hf_model(QTINY)
    r_bf, _, sa_bf = make_runner(QTINY)
    load_hf_weights_into(r_bf, hf_model)
    base = RawDriver(r_bf, sa_bf.page_size).generate_greedy(PROMPT, 8)

    r_q, _, sa_q = make_runner(QTINY, quantization=method)
    # quantize the same HF weights through the loader path
    from iaas_sglang_tpu.model_loader.loader import (
        _assemble,
        _torch_to_numpy,
        put_params,
    )

    specs = r_q.model.weight_specs()
    sd = hf_model.state_dict()
    host = _assemble(specs, r_q.model_config,
                     lambda key: _torch_to_numpy(sd[key].detach().cpu()))
    r_q.params = put_params(host, specs, r_q.mesh_ctx, quantization=method)
    out = RawDriver(r_q, sa_q.page_size).generate_greedy(PROMPT, 8)
    # int8/fp8 keep greedy decoding close to bf16 on a tiny model: first
    # tokens should agree
    if method in ("int8", "fp8"):
        assert out[:2] == base[:2], (out, base)
    assert len(out) == 8


def test_awq_checkpoint_ingestion(tmp_path):
    """Synthesize an AutoAWQ-format checkpoint (qweight/qzeros/scales with
    the [0,2,4,6,1,3,5,7] nibble interleave), load it through the real
    loader path, and check logits against the same weights dequantized."""
    import json

    import jax.numpy as jnp
    import torch
    from safetensors.torch import save_file

    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.model_executor.model_runner import ModelRunner
    from iaas_sglang_tpu.quantization.awq import pack_awq_int32
    from iaas_sglang_tpu.server_args import ServerArgs
    from tests.utils import RawDriver, load_hf_weights_into

    hf_model = build_hf_model(QTINY)
    sd = {k: v.detach().clone() for k, v in hf_model.state_dict().items()}

    QUANT_SUFFIXES = ("q_proj", "k_proj", "v_proj", "o_proj",
                      "gate_proj", "up_proj", "down_proj")

    def awq_quantize(w):  # w [in, out] f32 -> (qweight, qzeros, scales, wd)
        K, N = w.shape
        G = min(128, K)
        wg = w.reshape(K // G, G, N)
        wmin = wg.min(axis=1)
        wmax = wg.max(axis=1)
        scale = np.maximum((wmax - wmin) / 15.0, 1e-8)       # [K/G, N]
        zero = np.clip(np.rint(-wmin / scale), 0, 15)         # [K/G, N]
        q_u = np.clip(np.rint(wg / scale[:, None, :]) + zero[:, None, :],
                      0, 15).astype(np.uint8).reshape(K, N)
        wd = ((q_u.astype(np.float32).reshape(K // G, G, N)
               - zero[:, None, :]) * scale[:, None, :]).reshape(K, N)
        return (pack_awq_int32(q_u), pack_awq_int32(zero.astype(np.uint8)),
                scale.astype(np.float32), wd)

    dequant_sd = {k: v.detach().clone() for k, v in sd.items()}
    new_sd = {}
    for key, t in sd.items():
        if any(key.endswith(f"{sfx}.weight") for sfx in QUANT_SUFFIXES):
            w = t.float().numpy().T.copy()                    # [in, out]
            qw, qz, sc, wd = awq_quantize(w)
            prefix = key[: -len(".weight")]
            new_sd[prefix + ".qweight"] = torch.from_numpy(qw)
            new_sd[prefix + ".qzeros"] = torch.from_numpy(qz)
            new_sd[prefix + ".scales"] = torch.from_numpy(sc).half()
            dequant_sd[key] = torch.from_numpy(wd.T.copy())
        else:
            new_sd[key] = t
    save_file(new_sd, str(tmp_path / "model.safetensors"))
    cfg_json = dict(QTINY)
    cfg_json.pop("architectures")
    cfg_json["architectures"] = QTINY["architectures"]
    cfg_json["quantization_config"] = {
        "quant_method": "awq", "bits": 4, "group_size": 128}
    (tmp_path / "config.json").write_text(json.dumps(cfg_json))

    cfg = ModelConfig.from_path(str(tmp_path), dtype="float32")
    sa = ServerArgs(model_path=str(tmp_path), load_format="auto",
                    dtype="float32", page_size=4, max_total_tokens=4096,
                    device="cpu", max_running_requests=16,
                    max_prefill_tokens=256, tp_size=1, random_seed=0)
    runner = ModelRunner(sa, cfg)
    ours = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)

    # reference: same framework, weights dequantized on the host
    hf_model.load_state_dict(dequant_sd)
    runner2, cfg2, sa2 = make_runner(QTINY, dtype="float32")
    load_hf_weights_into(runner2, hf_model)
    ref = RawDriver(runner2, sa2.page_size).prefill_logits(PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_gptq_checkpoint_ingestion(tmp_path):
    """Synthesize an AutoGPTQ-format checkpoint (row-packed qweight,
    column-packed qzeros with the zeros-minus-one convention), load through
    the real loader, compare vs host-dequantized weights."""
    import json

    import torch
    from safetensors.torch import save_file

    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.model_executor.model_runner import ModelRunner
    from iaas_sglang_tpu.server_args import ServerArgs
    from tests.utils import RawDriver, load_hf_weights_into

    hf_model = build_hf_model(QTINY)
    sd = {k: v.detach().clone() for k, v in hf_model.state_dict().items()}
    QUANT_SUFFIXES = ("q_proj", "k_proj", "v_proj", "o_proj",
                      "gate_proj", "up_proj", "down_proj")

    def pack_rows(q_u):  # uint8 [K, N] -> int32 [K/8, N]
        K, N = q_u.shape
        q3 = q_u.reshape(K // 8, 8, N).astype(np.uint32)
        out = np.zeros((K // 8, N), np.uint32)
        for i in range(8):
            out |= q3[:, i] << (4 * i)
        return out.astype(np.int32)

    def pack_cols(z_u):  # uint8 [R, C] -> int32 [R, C/8]
        R, C = z_u.shape
        z3 = z_u.reshape(R, C // 8, 8).astype(np.uint32)
        out = np.zeros((R, C // 8), np.uint32)
        for i in range(8):
            out |= z3[:, :, i] << (4 * i)
        return out.astype(np.int32)

    def gptq_quantize(w):  # w [in, out]
        K, N = w.shape
        G = min(128, K)
        wg = w.reshape(K // G, G, N)
        wmin, wmax = wg.min(axis=1), wg.max(axis=1)
        scale = np.maximum((wmax - wmin) / 15.0, 1e-8)
        zero = np.clip(np.rint(-wmin / scale), 1, 15)  # stored z-1 >= 0
        q_u = np.clip(np.rint(wg / scale[:, None, :]) + zero[:, None, :],
                      0, 15).astype(np.uint8).reshape(K, N)
        wd = ((q_u.astype(np.float32).reshape(K // G, G, N)
               - zero[:, None, :]) * scale[:, None, :]).reshape(K, N)
        return (pack_rows(q_u), pack_cols((zero - 1).astype(np.uint8)),
                scale.astype(np.float32), wd)

    dequant_sd = {k: v.detach().clone() for k, v in sd.items()}
    new_sd = {}
    for key, t in sd.items():
        if any(key.endswith(f"{sfx}.weight") for sfx in QUANT_SUFFIXES):
            w = t.float().numpy().T.copy()
            qw, qz, sc, wd = gptq_quantize(w)
            prefix = key[: -len(".weight")]
            new_sd[prefix + ".qweight"] = torch.from_numpy(qw)
            new_sd[prefix + ".qzeros"] = torch.from_numpy(qz)
            new_sd[prefix + ".scales"] = torch.from_numpy(sc).half()
            dequant_sd[key] = torch.from_numpy(wd.T.copy())
        else:
            new_sd[key] = t
    save_file(new_sd, str(tmp_path / "model.safetensors"))
    cfg_json = dict(QTINY)
    cfg_json["quantization_config"] = {
        "quant_method": "gptq", "bits": 4, "group_size": 128,
        "desc_act": False}
    (tmp_path / "config.json").write_text(json.dumps(cfg_json))

    cfg = ModelConfig.from_path(str(tmp_path), dtype="float32")
    sa = ServerArgs(model_path=str(tmp_path), load_format="auto",
                    dtype="float32", page_size=4, max_total_tokens=4096,
                    device="cpu", max_running_requests=16,
                    max_prefill_tokens=256, tp_size=1, random_seed=0)
    runner = ModelRunner(sa, cfg)
    ours = RawDriver(runner, sa.page_size).prefill_logits(PROMPT)

    hf_model.load_state_dict(dequant_sd)
    runner2, cfg2, sa2 = make_runner(QTINY, dtype="float32")
    load_hf_weights_into(runner2, hf_model)
    ref = RawDriver(runner2, sa2.page_size).prefill_logits(PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=3e-3, atol=3e-3)


def test_quant_fusion_greedy_parity():
    """Fused qkv/gate-up QuantizedWeights (single-shard decode fast path)
    must decode token-for-token like the unfused params."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs
    from tests.utils import TINY_LLAMA

    def make(disable):
        return Engine(ServerArgs(
            model_path="test://tiny", load_format="dummy", dtype="float32",
            quantization="int4", page_size=4, max_total_tokens=1024,
            skip_tokenizer_init=True, random_seed=0,
            enable_quant_fusion=not disable), hf_config_override=TINY_LLAMA)

    ids = list(range(3, 40))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    fused = make(False)
    assert "wqkv_fused" in fused.scheduler.model_runner.params["layers"]
    a = fused.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    unfused = make(True)
    assert "wq" in unfused.scheduler.model_runner.params["layers"]
    b = unfused.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert a == b


def test_fp8_kv_cache_engine():
    """kv_cache_dtype=fp8_e4m3: pool is e4m3, generation is deterministic
    and close to the bf16-KV run (reference fp8.py:1151 KV dtype)."""
    import jax.numpy as jnp

    from tests.test_scheduler import make_engine

    eng8 = make_engine(kv_cache_dtype="fp8_e4m3")
    assert eng8.scheduler.model_runner.kv_pages.dtype == jnp.float8_e4m3fn
    ids = list(range(3, 40))
    sp = {"max_new_tokens": 12, "temperature": 0.0}
    a = eng8.generate(input_ids=ids, sampling_params=dict(sp))["output_ids"]
    b = eng8.generate(input_ids=list(range(50, 90)),
                      sampling_params=dict(sp))["output_ids"]
    a2 = eng8.generate(input_ids=ids, sampling_params=dict(sp))["output_ids"]
    assert a == a2 and len(a) == 12 and len(b) == 12   # deterministic
    eng8.scheduler.check_memory_leak()

    # greedy tokens should largely agree with the full-precision pool on a
    # tiny model (quantization may flip the odd pick near-ties)
    eng = make_engine()
    c = eng.generate(input_ids=ids, sampling_params=dict(sp))["output_ids"]
    agree = sum(x == y for x, y in zip(a, c))
    assert agree >= 8, (a, c)


def test_fp8_kv_cache_bad_dtype_rejected():
    import pytest as _pytest

    from tests.test_scheduler import make_engine

    with _pytest.raises(ValueError):
        make_engine(kv_cache_dtype="int3")


def test_quantize_lm_head_generation():
    """--quantize-lm-head: the head becomes an INT4 QuantizedWeight and
    greedy generation still tracks the bf16-head run closely."""
    from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

    r_a, _, sa_a = make_runner(QTINY, quantization="int4")
    base = RawDriver(r_a, sa_a.page_size).generate_greedy(PROMPT, 8)
    assert not isinstance(r_a.params.get("lm_head"), QuantizedWeight)

    r_q, _, sa_q = make_runner(QTINY, quantization="int4",
                               quantize_lm_head=True)
    assert isinstance(r_q.params.get("lm_head"), QuantizedWeight)
    out = RawDriver(r_q, sa_q.page_size).generate_greedy(PROMPT, 8)
    assert len(out) == 8 and len(base) == 8


def test_fp8_recode_int8_semantics():
    """v5e fp8 serving recodes fp8 payloads to int8 group scales at load
    (no native fp8 compute). The recoded weights must dequantize to the
    same values within int8 rounding, and generation must keep working
    through the (CPU) fallback path."""
    import jax.numpy as jnp

    import iaas_sglang_tpu.quantization.qlinear as ql
    from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

    r, _, sa = make_runner(QTINY, quantization="fp8_block")
    lp = r.params["layers"]
    some = next(v for v in lp.values()
                if isinstance(v, QuantizedWeight))
    assert some.q.dtype == jnp.float8_e4m3fn and some.block

    def deq(qw):
        s = qw.scale
        if qw.block:
            s = np.repeat(np.asarray(s), 128, axis=-1)[..., :qw.q.shape[-1]]
        K = qw.q.shape[-2]
        gi = np.asarray(s).shape[-2]
        return (np.asarray(qw.q, np.float32)
                * np.repeat(np.asarray(s), K // gi, axis=-2))

    before = {k: deq(v) for k, v in lp.items()
              if isinstance(v, QuantizedWeight)}

    old = ql._INT4_IMPL
    try:
        ql._INT4_IMPL = "pallas"     # recode is gated to the pallas impl
        r._maybe_expand_block_scales()
    finally:
        ql._INT4_IMPL = old
    lp2 = r.params["layers"]
    for k, ref in before.items():
        qw = lp2[k]
        assert qw.q.dtype == jnp.int8 and not qw.block, k
        got = deq(qw)
        denom = np.abs(ref).max() + 1e-9
        assert np.abs(got - ref).max() / denom < 0.01, k

    out = RawDriver(r, sa.page_size).generate_greedy(PROMPT, 6)
    assert len(out) == 6


def test_w8a8_int8_config_smoke():
    """--quantization w8a8_int8 (reference w8a8_int8.py scheme): per-
    channel int8 weights; engine generates correctly (the int8 MXU dot
    path itself is TPU-only and kernel-tested in test_kernels)."""
    from tests.test_scheduler import make_engine

    eng = make_engine(quantization="w8a8_int8", dtype="float32")
    out = eng.generate(input_ids=list(range(10)), sampling_params={
        "max_new_tokens": 6, "temperature": 0.0})
    assert len(out["output_ids"]) == 6
    # per-channel weight quantization stays close to the bf16 model
    ref = make_engine().generate(input_ids=list(range(10)),
                                 sampling_params={"max_new_tokens": 6,
                                                  "temperature": 0.0})
    assert len(ref["output_ids"]) == 6
    eng.scheduler.check_memory_leak()
