"""Round-4 K/V-split kernel A/B on the real TPU.

Extend: new flat-q-block split kernel vs jax_rpa (interleaved) vs the
old per-(seq, q-tile) kernel, at the bench extend shape (32L stack,
T=512 B=8 ctx=256 — the r3 published A/B point: jax_rpa 1.86 ms, old
own kernel 5.79 ms). Done bar (VERDICT #1): within 15% of jax_rpa.

Decode: split kernel vs the interleaved packed kernel at ctx 192/1024
(r3: packed 367 GB/s at ctx 192 — the MXU-redundancy cost the split
layout halves).
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


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


def mk_pool(rng, split, NP, ps=16):
    kv_i = jnp.asarray(
        rng.standard_normal((NP, ps, 16, 128), dtype=np.float32) * 0.1,
        jnp.bfloat16)
    if not split:
        return kv_i
    NPx, psx, NK2, Dx = kv_i.shape
    k = kv_i[:, :, 0::2, :].reshape(NPx, psx, NK2 // 2 * Dx)
    v = kv_i[:, :, 1::2, :].reshape(NPx, psx, NK2 // 2 * Dx)
    return jnp.stack([k, v], axis=0)


def run_extend(which, rng, nqb=64, kvp=16):
    """32-layer extend stack at T=512 B=8 ctx=256."""
    ps = 16
    pages_per_layer = 768
    NP = 32 * (pages_per_layer + 1)
    B, ctx, qlen = 8, 256, 64
    T = B * qlen
    split = which.startswith("split") or which == "old_split"
    kv = mk_pool(rng, split, NP, ps)
    q0 = jnp.asarray(rng.standard_normal((T, 32, 128), dtype=np.float32),
                     jnp.bfloat16)
    MP = ctx // ps
    pt_np = np.zeros((B, MP), np.int32)
    for b in range(B):
        pt_np[b] = (np.arange(MP) + b * MP) % pages_per_layer
    kv_lens = jnp.full((B,), ctx, jnp.int32)
    cu = jnp.asarray(np.arange(B + 1) * qlen, jnp.int32)
    ns = jnp.int32(B)
    pt = jnp.asarray(pt_np)

    if which == "jax_rpa":
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention as jax_rpa)

        def call(h, kvx, l):
            return jax_rpa(h, kvx, kv_lens,
                           pt + l * (pages_per_layer + 1), cu,
                           ns.reshape(1), sm_scale=0.088)
    elif which == "old":
        from iaas_sglang_tpu.ops.extend_attention import (
            ragged_extend_attention)

        def call(h, kvx, l):
            return ragged_extend_attention(
                h, kvx, kv_lens, pt + l * (pages_per_layer + 1), cu, ns,
                sm_scale=0.088)
    elif which == "old_split":
        from iaas_sglang_tpu.ops.extend_attention import (
            ragged_extend_attention)

        def call(h, kvx, l):
            return ragged_extend_attention(
                h, kvx, kv_lens, pt + l * (pages_per_layer + 1), cu, ns,
                sm_scale=0.088)
    else:
        from iaas_sglang_tpu.ops.split_attention import (
            ragged_extend_attention_split)
        dh = int(which.split("dh")[1]) if "dh" in which else 0

        def call(h, kvx, l):
            return ragged_extend_attention_split(
                h, kvx, kv_lens, pt + l * (pages_per_layer + 1), cu, ns,
                sm_scale=0.088, num_q_per_blk=nqb, kv_pages_per_blk=kvp,
                debug_heads=dh)

    def make(n):
        @jax.jit
        def run(q, kv):
            def step(h, _):
                def body(h, l):
                    return call(h, kv, l), None

                h, _ = jax.lax.scan(body, h, jnp.arange(32, dtype=jnp.int32))
                return h, None

            h, _ = jax.lax.scan(step, q, jnp.arange(n))
            return h

        return run, (q0, kv)

    tag = f"extend {which}" + (f" nqb={nqb} kvp={kvp}"
                               if which == "split" else "")
    return timed_slope(tag, make)


def run_decode(which, ctx, rng, cp=16, nb=2, hg=4, kvdtype="bf16"):
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention
    from iaas_sglang_tpu.ops.split_attention import (
        paged_decode_attention_split)

    ps = 16
    pages_per_layer = 768
    B = 32
    MP = max(16, -(-ctx // ps))
    NP = 32 * (pages_per_layer + 1)
    split = which == "split"
    kv = mk_pool(rng, split, NP, ps)
    if kvdtype != "bf16":
        # narrow-KV bandwidth/convert A/B (VERDICT r3 weak #6): numerics
        # irrelevant here, only the dtype's tile layout + VPU upcast cost
        kv = kv.astype(dict(int8=jnp.int8,
                            fp8=jnp.float8_e4m3fn)[kvdtype])
    q0 = jnp.asarray(rng.standard_normal((B, 32, 128), dtype=np.float32),
                     jnp.bfloat16)
    pt_np = np.zeros((B, MP), np.int32)
    for b in range(B):
        pt_np[b] = (np.arange(MP) + b * MP) % pages_per_layer
    kv_lens = jnp.full((B,), ctx, jnp.int32)
    pt = jnp.asarray(pt_np)

    fn = paged_decode_attention_split if split else paged_decode_attention

    def make(n):
        @jax.jit
        def run(q, kv):
            def step(h, _):
                def body(h, l):
                    kw = {"head_group": hg} if split else {}
                    o = fn(h, kv, kv_lens, pt + l * (pages_per_layer + 1),
                           sm_scale=0.088, chunk_pages=cp, num_bufs=nb,
                           **kw)
                    return o, None

                h, _ = jax.lax.scan(body, h, jnp.arange(32, dtype=jnp.int32))
                return h, None

            h, _ = jax.lax.scan(step, q, jnp.arange(n))
            return h

        return run, (q0, kv)

    t = timed_slope(
        f"decode {which} ctx={ctx} cp={cp} nb={nb} hg={hg} kv={kvdtype}",
        make)
    useful = B * ctx * 32 * 2 * 8 * 128 * 2
    print(f"   -> {useful/t/1e9:.0f} GB/s effective "
          f"(roofline {useful/819e9*1000:.2f} ms)", flush=True)
    return t


def main():
    rng = np.random.default_rng(0)
    args = sys.argv[1:] or ["parity", "extend", "decode"]
    if "parity" in args:
        # on-device correctness spot checks vs jnp reference
        from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
        from iaas_sglang_tpu.ops.split_attention import (
            paged_decode_attention_split, ragged_extend_attention_split)

        ps, MP, NPg = 16, 8, 64
        kvs = mk_pool(rng, True, NPg, ps)
        B = 4
        kv_lens = jnp.asarray([7, 40, 96, 17], jnp.int32)
        pages = np.arange(B * MP, dtype=np.int32).reshape(B, MP) % NPg
        pt = jnp.asarray(pages)
        qd = jnp.asarray(rng.standard_normal((B, 32, 128),
                                             dtype=np.float32),
                         jnp.bfloat16)
        cu1 = jnp.asarray(np.arange(B + 1), jnp.int32)
        out = paged_decode_attention_split(qd, kvs, kv_lens, pt,
                                           sm_scale=0.088, chunk_pages=2)
        ref = _jnp_paged_attention(qd, kvs, kv_lens, pt, cu1,
                                   jnp.int32(B), sm_scale=0.088)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"decode split device parity max|d|={err:.4f}", flush=True)
        assert err < 0.05, err
        q_lens = [5, 17, 40, 9]
        T = sum(q_lens)
        qe = jnp.asarray(rng.standard_normal((T, 32, 128),
                                             dtype=np.float32),
                         jnp.bfloat16)
        cu = jnp.asarray(np.cumsum([0] + q_lens), jnp.int32)
        kv_lens_e = jnp.asarray([12, 40, 96, 17], jnp.int32)
        out = ragged_extend_attention_split(
            qe, kvs, kv_lens_e, pt, cu, jnp.int32(B), sm_scale=0.088,
            num_q_per_blk=32, kv_pages_per_blk=2)
        ref = _jnp_paged_attention(qe, kvs, kv_lens_e, pt, cu,
                                   jnp.int32(B), sm_scale=0.088)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        print(f"extend split device parity max|d|={err:.4f}", flush=True)
        assert err < 0.05, err

    if "extend" in args:
        run_extend("jax_rpa", rng)
        run_extend("split", rng, nqb=64, kvp=16)
        run_extend("split", rng, nqb=128, kvp=16)
        run_extend("split", rng, nqb=64, kvp=8)
    if "extend_old" in args:
        run_extend("old", rng)
        run_extend("old_split", rng)
    if "decode" in args:
        run_decode("packed", 192, rng)
        run_decode("split", 192, rng)
        run_decode("packed", 1024, rng)
        run_decode("split", 1024, rng)
    for a in args:
        if a.startswith("dec:"):
            parts = a.split(":")
            run_decode("split", int(parts[1]), rng, cp=int(parts[2]),
                       nb=int(parts[3]),
                       hg=int(parts[4]) if len(parts) > 4 else 4,
                       kvdtype=parts[5] if len(parts) > 5 else "bf16")
        if a.startswith("ex:"):
            parts = a.split(":")
            run_extend("split" + (parts[3] if len(parts) > 3 else ""),
                       rng, nqb=int(parts[1]), kvp=int(parts[2]))


if __name__ == "__main__":
    main()
