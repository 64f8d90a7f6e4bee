"""Fused whole-layer decode megakernel (ops/fused_layer.py) vs a jnp
reference composing the exact per-layer math of models/llama_family.py
layer_body (rms_norm -> fused qkv dequant-GEMM -> rope -> KV write ->
paged attention incl. the current token -> o -> +resid -> rms_norm ->
gate/up -> silu*up -> down -> +resid), run in TPU interpret mode."""

import numpy as np
import pytest

L, B, H, D, Nq, Nk, I = 2, 8, 256, 128, 2, 1, 512
NqD, NkD = Nq * D, Nk * D
PS, MP, PPL = 8, 6, 20         # page size, max pages/seq, pages per layer
EPS = 1e-5


def _quant_proj(rng, K, N, mode):
    """Random weight -> (packed/int8 stack arrays, bf16 dequant ref)."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.quantization.qlinear import _np_group_quantize
    from iaas_sglang_tpu.ops.quant_matmul import pack_int4

    w = (rng.standard_normal((L, K, N)) * 0.05).astype(np.float32)
    qs, ss, refs = [], [], []
    for l in range(L):
        bits = 4 if mode.startswith("w4") else 8
        q, s = _np_group_quantize(w[l], bits)
        deq = (q.astype(np.float32).reshape(s.shape[0], -1, N)
               * s[:, None, :]).reshape(K, N)
        refs.append(deq)
        ss.append(s.astype(np.float32))
        qs.append(pack_int4(q.astype(np.int8)) if bits == 4
                  else q.astype(np.int8))
    return (jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(ss)),
            jnp.asarray(np.stack(refs), jnp.bfloat16))


def _ref_matmul(x, wref, mode, packed=None, scale=None):
    """Reference projection matching the kernel's numerics: w4a16/w8a16
    = bf16 x @ dequantized bf16 w (f32 acc); w4a8 = int8 activation
    quant + int dots on the EXACT packed nibbles, scaled per group."""
    import jax
    import jax.numpy as jnp

    if mode not in ("w4a8", "w8a8"):
        y = jax.lax.dot_general(
            x, wref, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)
    from iaas_sglang_tpu.ops.quant_matmul import (
        quantize_act_int8, unpack_int4_ref)

    K = x.shape[1]
    xq, xs, _ = quantize_act_int8(x, 128)
    nG = K // 128
    q = (packed.astype(jnp.int32) if mode == "w8a8"
         else unpack_int4_ref(packed)).reshape(nG, 128, -1)
    xg = xq.reshape(-1, nG, 128).transpose(1, 0, 2).astype(jnp.int8)
    part = jax.lax.dot_general(
        xg, q.astype(jnp.int8), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    y = jnp.sum(part.astype(jnp.float32) * scale[:, None, :], axis=0) * xs
    return y.astype(jnp.bfloat16)


@pytest.mark.parametrize("mode,int8kv", [
    ("w4a16", False), ("w8a16", False), ("w4a8", False), ("w8a8", False),
    ("w4a16", True)])
def test_fused_decode_layers_interpret(mode, int8kv):
    import jax
    import jax.numpy as jnp

    from iaas_sglang_tpu.layers.norms import rms_norm
    from iaas_sglang_tpu.layers.rotary import apply_rope
    from iaas_sglang_tpu.ops.attention import (
        _jnp_paged_attention, write_kv_pages)
    from iaas_sglang_tpu.ops.fused_layer import fused_decode_layers

    rng = np.random.default_rng(7)
    # kv_lens INCLUDE the current token; 0 = padding row
    kv_lens_l = [5, 17, 1, 0, 9, 33, 2, 16]
    NP = L * PPL
    kvf = jnp.asarray(rng.standard_normal((2, NP, PS, NkD)) * 0.3,
                      jnp.bfloat16)
    if int8kv:
        # int8 pool with inline per-token po2 scales, built by the
        # write path itself
        from iaas_sglang_tpu.ops.attention import write_kv_pages as _w
        kv = jnp.zeros((2, NP, PS, NkD + 128), jnp.int8)
        kv = _w(kv, jnp.arange(NP * PS),
                kvf[0].reshape(NP * PS, Nk, D),
                kvf[1].reshape(NP * PS, Nk, D))
    else:
        kv = kvf
    # DISJOINT page lists: sequences must never share pages or the
    # reference's current-token writes corrupt each other's history
    pages = np.zeros((B, MP), np.int32)
    nxt = 0
    for b in range(B):
        n = -(-kv_lens_l[b] // PS)
        assert nxt + n < PPL
        pages[b, :n] = np.arange(nxt, nxt + n)
        nxt += n
    kv_lens = jnp.asarray(kv_lens_l, jnp.int32)
    page_indices = jnp.asarray(pages)

    hidden0 = jnp.asarray(rng.standard_normal((B, H)) * 0.5, jnp.bfloat16)
    n1 = jnp.asarray(rng.random((L, H)) + 0.5, jnp.bfloat16)
    n2 = jnp.asarray(rng.random((L, H)) + 0.5, jnp.bfloat16)
    positions = kv_lens - 1          # current token position (0 for pads)
    positions = jnp.maximum(positions, 0)
    inv_freq = jnp.asarray(
        1.0 / (10000.0 ** (np.arange(0, D, 2) / D)), jnp.float32)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)

    qkv_q, qkv_s, qkv_ref = _quant_proj(rng, H, NqD + 2 * NkD, mode)
    o_q, o_s, o_ref = _quant_proj(rng, NqD, H, mode)
    gu_q, gu_s, gu_ref = _quant_proj(rng, H, 2 * I, mode)
    dn_q, dn_s, dn_ref = _quant_proj(rng, I, H, mode)
    sm_scale = D ** -0.5

    # ---------------- reference: per-layer jnp composition
    def ref_forward():
        hidden = hidden0
        pool = kv
        cu = jnp.arange(B + 1, dtype=jnp.int32)
        out_slots = []
        for s in range(B):
            if kv_lens_l[s] == 0:
                # padding rows write to the garbage page (scheduler
                # invariant) — never into another sequence's history
                out_slots.append((PPL - 1) * PS)
                continue
            pos = kv_lens_l[s] - 1
            out_slots.append(int(pages[s, pos // PS]) * PS + pos % PS)
        out_slots = jnp.asarray(out_slots, jnp.int32)
        k_all, v_all = [], []
        for l in range(L):
            h = rms_norm(hidden, n1[l], EPS)
            qkv = _ref_matmul(h, qkv_ref[l], mode, qkv_q[l], qkv_s[l])
            q = qkv[:, :NqD].reshape(B, Nq, D)
            k = qkv[:, NqD:NqD + NkD].reshape(B, Nk, D)
            v = qkv[:, NqD + NkD:].reshape(B, Nk, D)
            q, k = apply_rope(q, k, positions, inv_freq)
            k_all.append(k.reshape(B, NkD))
            v_all.append(v.reshape(B, NkD))
            pool = write_kv_pages(pool, out_slots + l * PPL * PS, k, v)
            attn = _jnp_paged_attention(
                q, pool, kv_lens, page_indices + l * PPL, cu,
                jnp.int32(B), sm_scale=sm_scale)
            attn_out = _ref_matmul(
                attn.reshape(B, NqD).astype(jnp.bfloat16), o_ref[l], mode,
                o_q[l], o_s[l])
            hidden = hidden + attn_out
            h2 = rms_norm(hidden, n2[l], EPS)
            gu = _ref_matmul(h2, gu_ref[l], mode, gu_q[l], gu_s[l])
            gate, up = gu[:, :I], gu[:, I:]
            inter = (jax.nn.silu(gate.astype(jnp.float32))
                     * up.astype(jnp.float32)).astype(jnp.bfloat16)
            mlp = _ref_matmul(inter, dn_ref[l], mode, dn_q[l], dn_s[l])
            hidden = hidden + mlp
        return hidden, jnp.stack(k_all), jnp.stack(v_all)

    ref_h, ref_k, ref_v = ref_forward()
    # reference pool AFTER the step (the kernel writes in place)
    ref_pool = kv
    out_slots = []
    for s2 in range(B):
        if kv_lens_l[s2] == 0:
            out_slots.append((PPL - 1) * PS)
        else:
            pos = kv_lens_l[s2] - 1
            out_slots.append(int(pages[s2, pos // PS]) * PS + pos % PS)
    out_slots = jnp.asarray(out_slots, jnp.int32)
    for l in range(L):
        ref_pool = write_kv_pages(
            ref_pool, out_slots + l * PPL * PS,
            ref_k[l].reshape(B, Nk, D), ref_v[l].reshape(B, Nk, D))

    out_h, out_k, out_v, out_pool = fused_decode_layers(
        hidden0, cos, sin, kv_lens, out_slots, page_indices, kv, n1, n2,
        qkv_q, qkv_s, o_q, o_s, gu_q, gu_s, dn_q, dn_s,
        num_q_heads=Nq, num_kv_heads=Nk, head_dim=D,
        mode=mode, sm_scale=sm_scale, eps=EPS, pages_per_layer=PPL,
        chunk_pages=2, nkv=3, nw=6, interpret=True)
    # in-kernel pool write-back: real rows must match the reference's
    # write path; pad rows share the garbage slot (don't compare)
    op = np.asarray(out_pool, np.float32)
    rp = np.asarray(ref_pool, np.float32)
    for s2 in range(B):
        if kv_lens_l[s2] == 0:
            continue
        sl = int(out_slots[s2])
        for l in range(L):
            pg, ro = (sl // PS) + l * PPL, sl % PS
            # int8 pools: a 1-ulp bf16 difference in k/v flips the
            # quantized int by one — allow +-1 on the int grid
            np.testing.assert_allclose(
                op[:, pg, ro], rp[:, pg, ro], rtol=5e-2,
                atol=1.01 if int8kv else 5e-2)

    real = np.asarray(kv_lens) > 0
    # w4a8: the kernel quantizes activations from the SAME bf16 values
    # but in a different op order — a rounding tie can move one int step
    # (observed 2/1792 elements at 0.034); everything else is exact
    tol = 5e-2 if (mode in ("w4a8", "w8a8") or int8kv) else 3e-2
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32)[:, real],
        np.asarray(ref_k, np.float32)[:, real], rtol=tol, atol=tol)
    np.testing.assert_allclose(
        np.asarray(out_v, np.float32)[:, real],
        np.asarray(ref_v, np.float32)[:, real], rtol=tol, atol=tol)
    np.testing.assert_allclose(
        np.asarray(out_h, np.float32)[real],
        np.asarray(ref_h, np.float32)[real],
        rtol=8e-2 if int8kv else 5e-2, atol=8e-2 if int8kv else 5e-2)


def test_fused_engine_greedy_parity():
    """Integration: the fused megakernel path (IAAS_FUSED_LAYER=interp on
    CPU) wired through the engine — layer offsets, slot scatter, chain
    donation — must reproduce the scan path's greedy continuation,
    including under multi-step chained decode."""
    import os

    import pytest

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["LlamaForCausalLM"], model_type="llama",
              num_hidden_layers=2, hidden_size=128, num_attention_heads=1,
              num_key_value_heads=1, intermediate_size=256, vocab_size=512,
              rms_norm_eps=1e-5, rope_theta=10000.0,
              max_position_embeddings=1024, tie_word_embeddings=True)

    def make(**kw):
        # CPU XLA cannot execute bf16xbf16=f32 dots (DotThunk): engines
        # run f32; the fused kernel stages bf16 internally, so parity is
        # "same greedy tokens", not bit-exact hidden states
        sa = ServerArgs(
            model_path="dummy://fused", load_format="dummy",
            dtype="float32", page_size=4, max_total_tokens=2048,
            skip_tokenizer_init=True, chunked_prefill_size=32,
            random_seed=1, quantization="int4", kv_layout="split", **kw)
        return Engine(sa, hf_config_override=hf)

    prompts = [list(range(10, 26)), [5, 6] * 9, [40] * 7]
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}

    os.environ["IAAS_FUSED_LAYER"] = "0"
    try:
        eng_b = make()
        base = [o["output_ids"] for o in
                eng_b.generate(input_ids=prompts, sampling_params=sp)]
    finally:
        os.environ.pop("IAAS_FUSED_LAYER", None)

    os.environ["IAAS_FUSED_LAYER"] = "interp"
    os.environ["IAAS_W4A8"] = "0"   # scan path on CPU is weight-dequant
    try:
        eng_f = make()
        got = [o["output_ids"] for o in
               eng_f.generate(input_ids=prompts, sampling_params=sp)]
        # same quantized weights, same math chain (bf16 staging): greedy
        # continuations must agree
        assert got == base, (got, base)
        o1 = eng_f.generate(input_ids=prompts[0], sampling_params=sp)
        assert o1["output_ids"] == base[0]
        eng_f.scheduler.check_memory_leak()

        # multi-step chained decode through the fused kernel
        eng_m = make(decode_steps_per_dispatch=4)
        gotm = [o["output_ids"] for o in
                eng_m.generate(input_ids=prompts, sampling_params=sp)]
        assert gotm == base, (gotm, base)
        eng_m.scheduler.check_memory_leak()
    finally:
        os.environ.pop("IAAS_FUSED_LAYER", None)
        os.environ.pop("IAAS_W4A8", None)


def test_fused_head_argmax_interpret():
    """Head fusion: final norm + lm_head GEMM + argmax inside the kernel
    must reproduce the XLA tail exactly (greedy tokens)."""
    import jax
    import jax.numpy as jnp

    from iaas_sglang_tpu.layers.norms import rms_norm
    from iaas_sglang_tpu.ops.fused_layer import fused_decode_layers

    rng = np.random.default_rng(13)
    V = 640                       # 5 x 128: exercises the block loop
    kv_lens_l = [5, 17, 1, 0, 9, 33, 2, 16]
    NP = L * PPL
    kv = jnp.asarray(rng.standard_normal((2, NP, PS, NkD)) * 0.3,
                     jnp.bfloat16)
    pages = np.zeros((B, MP), np.int32)
    nxt = 0
    for b in range(B):
        n = -(-kv_lens_l[b] // PS)
        pages[b, :n] = np.arange(nxt, nxt + n)
        nxt += n
    kv_lens = jnp.asarray(kv_lens_l, jnp.int32)
    page_indices = jnp.asarray(pages)
    out_slots = jnp.asarray(
        [(PPL - 1) * PS if kl == 0 else
         int(pages[i, (kl - 1) // PS]) * PS + (kl - 1) % PS
         for i, kl in enumerate(kv_lens_l)], jnp.int32)
    hidden0 = jnp.asarray(rng.standard_normal((B, H)) * 0.5, jnp.bfloat16)
    n1 = jnp.asarray(rng.random((L, H)) + 0.5, jnp.bfloat16)
    n2 = jnp.asarray(rng.random((L, H)) + 0.5, jnp.bfloat16)
    nf = jnp.asarray(rng.random((H,)) + 0.5, jnp.bfloat16)
    head = jnp.asarray(rng.standard_normal((H, V)) * 0.05, jnp.bfloat16)
    positions = jnp.maximum(kv_lens - 1, 0)
    inv_freq = jnp.asarray(
        1.0 / (10000.0 ** (np.arange(0, D, 2) / D)), jnp.float32)
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    mode = "w4a16"
    qkv_q, qkv_s, _ = _quant_proj(rng, H, NqD + 2 * NkD, mode)
    o_q, o_s, _ = _quant_proj(rng, NqD, H, mode)
    gu_q, gu_s, _ = _quant_proj(rng, H, 2 * I, mode)
    dn_q, dn_s, _ = _quant_proj(rng, I, H, mode)

    base = fused_decode_layers(
        hidden0, cos, sin, kv_lens, out_slots, page_indices, kv, n1, n2,
        qkv_q, qkv_s, o_q, o_s, gu_q, gu_s, dn_q, dn_s,
        num_q_heads=Nq, num_kv_heads=Nk, head_dim=D,
        mode=mode, sm_scale=D ** -0.5, eps=EPS, pages_per_layer=PPL,
        chunk_pages=2, nkv=3, nw=6, interpret=True)
    withh = fused_decode_layers(
        hidden0, cos, sin, kv_lens, out_slots, page_indices, kv, n1, n2,
        qkv_q, qkv_s, o_q, o_s, gu_q, gu_s, dn_q, dn_s,
        num_q_heads=Nq, num_kv_heads=Nk, head_dim=D,
        mode=mode, sm_scale=D ** -0.5, eps=EPS, pages_per_layer=PPL,
        chunk_pages=2, nkv=3, nw=6, interpret=True,
        head_w=head, final_norm=nf)
    # hidden out unchanged by the head phase
    np.testing.assert_array_equal(
        np.asarray(base[0], np.float32), np.asarray(withh[0], np.float32))
    # XLA reference tail on the kernel's own hidden
    hn = rms_norm(base[0], nf, EPS)
    logits = jax.lax.dot_general(
        hn, head, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    ref_tok = np.asarray(jnp.argmax(logits, axis=-1), np.int32)
    got = np.asarray(withh[4][:, 0], np.int32)
    real = np.asarray(kv_lens) > 0
    np.testing.assert_array_equal(got[real], ref_tok[real])


def test_fused_greedy_head_engine_parity():
    """The full fused chain incl. in-kernel lm_head/argmax (untied head)
    must match the scan engine's greedy continuation end to end."""
    import os

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["LlamaForCausalLM"], model_type="llama",
              num_hidden_layers=2, hidden_size=128, num_attention_heads=1,
              num_key_value_heads=1, intermediate_size=256, vocab_size=512,
              rms_norm_eps=1e-5, rope_theta=10000.0,
              max_position_embeddings=1024, tie_word_embeddings=False)

    def make(**kw):
        sa = ServerArgs(
            model_path="dummy://fusedhead", load_format="dummy",
            dtype="float32", page_size=4, max_total_tokens=2048,
            skip_tokenizer_init=True, chunked_prefill_size=32,
            random_seed=1, quantization="int4", kv_layout="split",
            decode_steps_per_dispatch=4, **kw)
        return Engine(sa, hf_config_override=hf)

    prompts = [list(range(10, 26)), [5, 6] * 9, [40] * 7]
    sp = {"max_new_tokens": 9, "temperature": 0.0, "ignore_eos": True}

    os.environ["IAAS_FUSED_LAYER"] = "0"
    try:
        base = [o["output_ids"] for o in
                make().generate(input_ids=prompts, sampling_params=sp)]
    finally:
        os.environ.pop("IAAS_FUSED_LAYER", None)

    os.environ["IAAS_FUSED_LAYER"] = "interp"
    os.environ["IAAS_W4A8"] = "0"
    try:
        eng = make(disable_jit_cache_warmup=True)
        m = eng.scheduler.model_runner.model
        calls = []
        orig = m.fused_greedy_decode

        def spy(*a, **k):
            out = orig(*a, **k)
            if out is not None:
                calls.append(1)
            return out

        m.fused_greedy_decode = spy
        got = [o["output_ids"] for o in
               eng.generate(input_ids=prompts, sampling_params=sp)]
        assert calls, "in-kernel head path must engage"
        # the test engine runs f32 while the kernel stages bf16, so a
        # near-tie argmax can legitimately flip one token (observed at
        # step 4 of one sequence); the same-precision kernel-level
        # argmax test is exact. Require convergent prefixes + bounded
        # divergence here.
        for a, b in zip(got, base):
            agree = sum(x == y for x, y in zip(a, b))
            assert a[:3] == b[:3] and agree >= len(b) - 2, (a, b)
        o1 = eng.generate(input_ids=prompts[0], sampling_params=sp)
        o2 = eng.generate(input_ids=prompts[0], sampling_params=sp)
        assert o1["output_ids"] == o2["output_ids"]
        eng.scheduler.check_memory_leak()
    finally:
        os.environ.pop("IAAS_FUSED_LAYER", None)
        os.environ.pop("IAAS_W4A8", None)


def test_fused_engine_penalties_fallback_parity():
    """Penalty batches under the fused path: the in-kernel head gates
    off (logits needed outside) but the headless fused layers still
    serve the chain — token-for-token vs the scan engine."""
    import os

    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["LlamaForCausalLM"], model_type="llama",
              num_hidden_layers=2, hidden_size=128, num_attention_heads=1,
              num_key_value_heads=1, intermediate_size=256, vocab_size=512,
              rms_norm_eps=1e-5, rope_theta=10000.0,
              max_position_embeddings=1024, tie_word_embeddings=False)

    def make():
        sa = ServerArgs(
            model_path="dummy://fusedpen", load_format="dummy",
            dtype="float32", page_size=4, max_total_tokens=2048,
            skip_tokenizer_init=True, chunked_prefill_size=32,
            random_seed=1, quantization="int4", kv_layout="split",
            decode_steps_per_dispatch=4)
        return Engine(sa, hf_config_override=hf)

    prompts = [list(range(10, 26)), [5, 6] * 9]
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True,
          "frequency_penalty": 0.6, "repetition_penalty": 1.2}

    os.environ["IAAS_FUSED_LAYER"] = "0"
    try:
        base = [o["output_ids"] for o in
                make().generate(input_ids=prompts, sampling_params=sp)]
    finally:
        os.environ.pop("IAAS_FUSED_LAYER", None)
    os.environ["IAAS_FUSED_LAYER"] = "interp"
    os.environ["IAAS_W4A8"] = "0"
    try:
        got = [o["output_ids"] for o in
               make().generate(input_ids=prompts, sampling_params=sp)]
        assert got == base, (got, base)
    finally:
        os.environ.pop("IAAS_FUSED_LAYER", None)
        os.environ.pop("IAAS_W4A8", None)
