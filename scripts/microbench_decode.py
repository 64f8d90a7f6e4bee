"""Decode-step component microbenchmark on the real TPU.

Honest timing through the remote relay (CLAUDE.md): every component is
repeated N times by an OUTER lax.scan inside ONE jitted program (carry
feeds the next repeat so nothing is CSE'd away, matching how decode
re-reads all weights each step), with a single scalar fetch at the end.
Per-repeat time = (t(N2) - t(N1)) / (N2 - N1), which cancels the ~24 ms
dispatch+fetch round-trip.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_slope(name, make_fn, n1=4, n2=20, iters=3):
    """make_fn(n) -> (jitted fn, args). Returns per-repeat seconds."""
    ts = {}
    for n in (n1, n2):
        fn, args = make_fn(n)
        exe = fn.lower(*args).compile()
        out = exe(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = exe(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        ts[n] = (time.perf_counter() - t0) / iters
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    print(f"{name}: {per*1000:.3f} ms/repeat "
          f"(t{n1}={ts[n1]*1000:.1f} t{n2}={ts[n2]*1000:.1f})", flush=True)
    return per


def main():
    from iaas_sglang_tpu.quantization.qlinear import (QuantizedWeight,
                                                      quantize_weight,
                                                      set_int4_impl,
                                                      qmatmul)

    set_int4_impl("pallas")
    rng = np.random.default_rng(0)
    B, H, NqD, NkD, I, V, L = 32, 4096, 4096, 1024, 14336, 128256, 32

    def qw_stack(k, n):
        q, s, _ = quantize_weight(
            rng.standard_normal((k, n), dtype=np.float32) * 0.02, "int4")
        return QuantizedWeight(
            q=jnp.asarray(np.broadcast_to(q, (L,) + q.shape).copy()),
            scale=jnp.asarray(np.broadcast_to(s, (L,) + s.shape).copy()),
            packed=True)

    x = jnp.asarray(rng.standard_normal((B, H), dtype=np.float32),
                    jnp.bfloat16)
    weights = (qw_stack(H, NqD), qw_stack(H, NkD), qw_stack(H, NkD),
               qw_stack(NqD, H), qw_stack(H, I), qw_stack(H, I),
               qw_stack(I, H))

    def make_gemm(n):
        @jax.jit
        def run(x, *ws):
            def step(h, _):
                def body(h, lp):
                    wq, wk, wv, wo, wg, wu, wd = lp
                    q = qmatmul(h, wq)
                    k = qmatmul(h, wk)
                    v = qmatmul(h, wv)
                    a = qmatmul(q, wo)
                    g = qmatmul(h, wg)
                    u = qmatmul(h, wu)
                    m = qmatmul(jax.nn.silu(g) * u, wd)
                    keep = (jnp.sum(k) + jnp.sum(v)).astype(h.dtype) * 1e-9
                    return h + 1e-3 * (a + m) + keep, None

                h, _ = jax.lax.scan(body, h, ws)
                return h * 1e-3, None

            h, _ = jax.lax.scan(step, x, jnp.arange(n))
            return h

        return run, (x,) + weights

    t_gemm = timed_slope("32L INT4 GEMM stack", make_gemm)

    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    ps, ctx = 16, 192
    pages_per_layer = 768
    MP = 16
    NP = 32 * (pages_per_layer + 1)
    kv = jnp.asarray(
        rng.standard_normal((NP, ps, 16, 128), dtype=np.float32) * 0.1,
        jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((B, 32, 128), dtype=np.float32),
                     jnp.bfloat16)
    pt_np = np.zeros((B, MP), np.int32)
    for b in range(B):
        pt_np[b] = (np.arange(MP) + b * MP) % pages_per_layer
    kv_lens = jnp.full((B,), ctx, jnp.int32)
    pt = jnp.asarray(pt_np)

    def make_attn(n):
        @jax.jit
        def run(q, kv):
            def step(h, _):
                def body(h, l):
                    o = paged_decode_attention(
                        h, kv, kv_lens, pt + l * (pages_per_layer + 1),
                        sm_scale=0.088)
                    return o, None

                h, _ = jax.lax.scan(body, h,
                                    jnp.arange(32, dtype=jnp.int32))
                return h, None

            h, _ = jax.lax.scan(step, q, jnp.arange(n))
            return h

        return run, (q0, kv)

    t_attn = timed_slope("32L paged decode attention", make_attn)

    lm = jnp.asarray(rng.standard_normal((H, V), dtype=np.float32) * 0.01,
                     jnp.bfloat16)

    def make_lm(n):
        @jax.jit
        def run(x, lm):
            def step(h, _):
                y = (h @ lm).astype(jnp.float32)
                return h + y[:, :H].astype(h.dtype) * 1e-9, None

            h, _ = jax.lax.scan(step, x, jnp.arange(n))
            return h

        return run, (x, lm)

    t_lm = timed_slope("lm_head bf16 [32,4096]x[4096,128256]", make_lm)

    BW = 819e9
    gemm_bytes = L * ((H*NqD + 2*H*NkD + NqD*H + 3*H*I) // 2)
    attn_bytes = B * ctx * L * 2 * 8 * 128 * 2
    lm_bytes = H * V * 2
    print(f"\nsum of parts: {(t_gemm + t_attn + t_lm)*1000:.2f} ms/step")
    print(f"INT4 stack roofline {gemm_bytes/BW*1000:.2f} ms -> "
          f"{gemm_bytes/t_gemm/1e9:.0f} GB/s")
    print(f"attn roofline {attn_bytes/BW*1000:.2f} ms -> "
          f"{attn_bytes/t_attn/1e9:.0f} GB/s")
    print(f"lm_head roofline {lm_bytes/BW*1000:.2f} ms -> "
          f"{lm_bytes/t_lm/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
