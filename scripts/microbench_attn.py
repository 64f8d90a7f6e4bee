"""Decode-attention kernel A/B on the real TPU (slope timing, CLAUDE.md).

Sweeps chunk_pages / num_bufs for the pipelined head-packed kernel at the
bench shape (llama-8B geometry, bs=32, ctx=192) plus a longer-context
point, reporting ms/step for the 32-layer stack and effective GB/s.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

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
    print(f"{name}: {per*1000:.3f} ms/repeat "
          f"(t{n1}={ts[n1]*1000:.1f} t{n2}={ts[n2]*1000:.1f})", flush=True)
    return per


def run_case(B, ctx, cp, nb, rng):
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
                        sm_scale=0.088, chunk_pages=cp, num_bufs=nb)
                    return o, None

                h, _ = jax.lax.scan(body, h, jnp.arange(32, dtype=jnp.int32))
                return h, None

            h, _ = jax.lax.scan(step, q, jnp.arange(n))
            return h

        return run, (q0, kv)

    t = timed_slope(f"B={B} ctx={ctx} CP={cp} NBUF={nb}", make)
    useful = B * ctx * 32 * 2 * 8 * 128 * 2
    print(f"   -> {useful/t/1e9:.0f} GB/s effective "
          f"(roofline {useful/819e9*1000:.2f} ms)", flush=True)
    return t


def main():
    import sys

    rng = np.random.default_rng(0)
    cases = [(32, 192, 16, 2), (32, 192, 8, 4), (32, 1024, 16, 2)]
    if len(sys.argv) > 1:  # "B,ctx,cp,nb;..." override
        cases = [tuple(int(x) for x in c.split(","))
                 for c in sys.argv[1].split(";")]
    for B, ctx, cp, nb in cases:
        run_case(B, ctx, cp, nb, rng)


if __name__ == "__main__":
    main()
