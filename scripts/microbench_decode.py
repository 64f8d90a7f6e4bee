"""Decode-step component microbenchmark on the real TPU.

Times, via N-scaled lax.scan with a host value fetch (CLAUDE.md timing
rules), the big contributors to one bs=32 Llama-3-8B INT4 decode step:
  * the INT4 dequant GEMM stack of one layer (q/k/v/o + gate/up/down)
  * the paged decode attention kernel over 32 layers
  * the bf16 lm_head matmul
  * the full decode layer scan as the model runs it
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=3):
    # AOT-compile: runtime jit dispatch through the relay stalls on big
    # programs (CLAUDE.md) — every timed program goes through
    # lower().compile() like the model runner does.
    exe = fn.lower(*args).compile()
    out = exe(*args)
    _ = float(jnp.sum(out).astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = exe(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))  # host fetch
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: {dt*1000:.2f} ms", flush=True)
    return dt


def main():
    from iaas_sglang_tpu.quantization.qlinear import (QuantizedWeight,
                                                      quantize_weight,
                                                      set_int4_impl,
                                                      qmatmul)

    set_int4_impl("pallas")
    rng = np.random.default_rng(0)
    B, H, NqD, NkD, I, V, L = 32, 4096, 4096, 1024, 14336, 128256, 32

    def qw(k, n):
        q, s, dt = quantize_weight(
            rng.standard_normal((k, n), dtype=np.float32) * 0.02, "int4")
        return QuantizedWeight(q=jnp.asarray(q), scale=jnp.asarray(s),
                               packed=True)

    # stacked per-layer weights, scanned like the model
    def qw_stack(k, n):
        q, s, _ = quantize_weight(
            rng.standard_normal((k, n), dtype=np.float32) * 0.02, "int4")
        return QuantizedWeight(
            q=jnp.asarray(np.broadcast_to(q, (L,) + q.shape).copy()),
            scale=jnp.asarray(np.broadcast_to(s, (L,) + s.shape).copy()),
            packed=True)

    x = jnp.asarray(rng.standard_normal((B, H), dtype=np.float32),
                    jnp.bfloat16)

    wq, wk, wv = qw_stack(H, NqD), qw_stack(H, NkD), qw_stack(H, NkD)
    wo = qw_stack(NqD, H)
    wg, wu = qw_stack(H, I), qw_stack(H, I)
    wd = qw_stack(I, H)

    @jax.jit
    def layer_gemms(x, wq, wk, wv, wo, wg, wu, wd):
        def body(h, lp):
            wq, wk, wv, wo, wg, wu, wd = lp
            q = qmatmul(h, wq)
            k = qmatmul(h, wk)
            v = qmatmul(h, wv)
            a = qmatmul(q, wo)
            g = qmatmul(h, wg)
            u = qmatmul(h, wu)
            m = qmatmul(jax.nn.silu(g) * u, wd)
            keep = (jnp.sum(k) + jnp.sum(v)).astype(h.dtype) * 0
            return h + a + m + keep, None

        h, _ = jax.lax.scan(body, x, (wq, wk, wv, wo, wg, wu, wd))
        return h

    t_gemm = timeit("32-layer INT4 GEMM stack (no attn)", layer_gemms,
                    x, wq, wk, wv, wo, wg, wu, wd)

    # attention: paged decode over 32 layers
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    ps, ctx = 16, 192
    pages_per_layer = 768
    MP = 16  # 256 tokens max in table
    NP = 32 * (pages_per_layer + 1)
    kv = jnp.asarray(
        rng.standard_normal((NP, ps, 16, 128), dtype=np.float32) * 0.1,
        jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, 32, 128), dtype=np.float32),
                    jnp.bfloat16)
    pt = np.zeros((B, MP), np.int32)
    for b in range(B):
        pt[b] = (np.arange(MP) + b * MP) % pages_per_layer
    kv_lens = jnp.full((B,), ctx, jnp.int32)
    pt = jnp.asarray(pt)

    @jax.jit
    def attn32(q, kv):  # pt/kv_lens are small closures
        def body(h, l):
            o = paged_decode_attention(
                h, kv, kv_lens, pt + l * (pages_per_layer + 1),
                sm_scale=0.088)
            return o, None

        h, _ = jax.lax.scan(body, q, jnp.arange(32, dtype=jnp.int32))
        return h

    t_attn = timeit("32-layer paged decode attention", attn32, q, kv)

    lm = jnp.asarray(rng.standard_normal((H, V), dtype=np.float32) * 0.01,
                     jnp.bfloat16)

    @jax.jit
    def lm_head(x, lm):
        return (x @ lm).astype(jnp.float32)

    t_lm = timeit("lm_head bf16 [32,4096]x[4096,128256]", lm_head, x, lm)

    print(f"\nsum of parts: {(t_gemm + t_attn + t_lm)*1000:.2f} ms "
          f"(measured e2e step ~29 ms at bench bs=32)")
    BW = 819e9
    gemm_bytes = L * ((H*NqD + 2*H*NkD + NqD*H + 3*H*I) // 2)
    print(f"INT4 stack roofline: {gemm_bytes/BW*1000:.2f} ms -> "
          f"achieved {gemm_bytes/t_gemm/1e9:.0f} GB/s")
    attn_bytes = B * ctx * L * 2 * 8 * 128 * 2
    print(f"attn roofline: {attn_bytes/BW*1000:.2f} ms -> "
          f"achieved {attn_bytes/t_attn/1e9:.0f} GB/s")
    lm_bytes = H * V * 2
    print(f"lm_head roofline: {lm_bytes/BW*1000:.2f} ms -> "
          f"achieved {lm_bytes/t_lm/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
