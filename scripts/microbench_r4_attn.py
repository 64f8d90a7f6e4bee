"""Round-4 decode-attention compute-variant A/B on the real TPU.

VERDICT r3 weak #1: decode attention runs 367 of 819 GB/s at ctx=192 —
the packed [Nq, 2NkD] dot pays 2x for interleaved V lanes and Nk-fold
head redundancy. Variants (slope-timed 32-layer stacks, llama-8B
geometry B=32):

  packed    current production kernel
  split     u32-bitcast K/V deinterleave -> half-width [Nq, NkD] dots
  split_t   + transposed scores ([CT, Nq]: tokens on MXU rows)

at ctx 192 (bench shape) and ctx 1024 (DMA-bound regime — the variants
must not regress it).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention


def timed_slope(name, make_fn, n1=4, n2=20, iters=3):
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
    print(f"{name}: {per*1000:.3f} ms/repeat", flush=True)
    return per


def run_case(B, ctx, compute, rng, cp=16):
    ps = 16
    pages_per_layer = 768
    MP = max(16, -(-ctx // ps))
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

    def make(n):
        @jax.jit
        def run(q, kv):
            def step(h, _):
                def body(h, l):
                    o = paged_decode_attention(
                        h, kv, kv_lens, pt + l * (pages_per_layer + 1),
                        sm_scale=0.088, chunk_pages=cp, compute=compute)
                    return o, None

                h, _ = jax.lax.scan(body, h, jnp.arange(32, dtype=jnp.int32))
                return h, None

            h, _ = jax.lax.scan(step, q, jnp.arange(n))
            return h

        return run, (q0, kv)

    t = timed_slope(f"B={B} ctx={ctx} {compute}", make)
    useful = B * ctx * 32 * 2 * 8 * 128 * 2
    print(f"   -> {useful/t/1e9:.0f} GB/s effective "
          f"(roofline {useful/819e9*1000:.2f} ms)", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    cases = sys.argv[1:] or ["packed", "split", "split_t"]
    # correctness spot-check on device for each variant before timing
    for compute in cases:
        if compute == "packed":
            continue
        ps, MP, NPg = 16, 8, 64
        kv = jnp.asarray(
            rng.standard_normal((NPg, ps, 16, 128), dtype=np.float32) * 0.3,
            jnp.bfloat16)
        B = 4
        q = jnp.asarray(rng.standard_normal((B, 32, 128), dtype=np.float32),
                        jnp.bfloat16)
        kv_lens = jnp.asarray([7, 40, 96, 17], jnp.int32)
        pages = np.arange(B * MP, dtype=np.int32).reshape(B, MP) % NPg
        pt = jnp.asarray(pages)
        ref = paged_decode_attention(q, kv, kv_lens, pt, sm_scale=0.088,
                                     chunk_pages=2, compute="packed")
        out = paged_decode_attention(q, kv, kv_lens, pt, sm_scale=0.088,
                                     chunk_pages=2, compute=compute)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"{compute}: device parity max|d|={err:.4f}", flush=True)
        assert err < 0.05, (compute, err)

    for compute in cases:
        for ctx in (192, 1024):
            run_case(32, ctx, compute, rng)


if __name__ == "__main__":
    main()
