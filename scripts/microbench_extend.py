"""Extend (prefill) attention A/B on the real TPU: our ragged extend
kernel vs jax's built-in ragged_paged_attention, slope-timed (CLAUDE.md)
over a 32-layer stack at the chunked-prefill bench shape.

Decides the default extend backend (VERDICT r1 weak #7).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import time

import numpy as np
import jax
import jax.numpy as jnp


def timed_slope(name, make_fn, n1=2, n2=8, iters=3):
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
    rng = np.random.default_rng(0)
    ps = 16
    pages_per_layer = 768
    NP = 32 * (pages_per_layer + 1)
    # chunked-prefill shape: 8 seqs x 64 new tokens (T=512), each already
    # holding 192 tokens of KV (mixed-chunk steady state)
    B, QL, CTX = 8, 64, 256
    T = B * QL
    MP = CTX // ps
    kv = jnp.asarray(
        rng.standard_normal((NP, ps, 16, 128), dtype=np.float32) * 0.1,
        jnp.bfloat16)
    q0 = jnp.asarray(rng.standard_normal((T, 32, 128), dtype=np.float32),
                     jnp.bfloat16)
    pt_np = np.zeros((B, MP), np.int32)
    for b in range(B):
        pt_np[b] = (np.arange(MP) + b * MP) % pages_per_layer
    kv_lens = jnp.full((B,), CTX, jnp.int32)
    pt = jnp.asarray(pt_np)
    cu = jnp.asarray(np.arange(B + 1) * QL, jnp.int32)
    ns = jnp.int32(B)

    def make(which):
        def mk(n):
            @jax.jit
            def run(q, kv):
                def step(h, _):
                    def body(h, l):
                        pages = pt + l * (pages_per_layer + 1)
                        if which == "own":
                            from iaas_sglang_tpu.ops.extend_attention import (
                                ragged_extend_attention,
                            )

                            o = ragged_extend_attention(
                                h, kv, kv_lens, pages, cu, ns,
                                sm_scale=0.088)
                        else:
                            from jax.experimental.pallas.ops.tpu.\
                                ragged_paged_attention import (
                                ragged_paged_attention as jax_rpa,
                            )

                            o = jax_rpa(
                                h, kv, kv_lens, pages, cu, ns.reshape(1),
                                sm_scale=0.088)
                        return o, None

                    h, _ = jax.lax.scan(
                        body, h, jnp.arange(32, dtype=jnp.int32))
                    return h, None

                h, _ = jax.lax.scan(step, q, jnp.arange(n))
                return h

            return run, (q0, kv)

        return mk

    t_own = timed_slope("32L extend OWN  (T=512 B=8 ctx=256)", make("own"))
    t_rpa = timed_slope("32L extend RPA  (T=512 B=8 ctx=256)", make("rpa"))
    useful = B * CTX * 32 * 2 * 8 * 128 * 2
    print(f"own {useful/t_own/1e9:.0f} GB/s | rpa {useful/t_rpa/1e9:.0f} GB/s "
          f"(KV bytes only; extend also computes "
          f"{2*T*CTX*32*128*32*2/1e9:.0f} GFLOP over the stack)")


if __name__ == "__main__":
    main()
