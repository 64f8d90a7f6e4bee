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
