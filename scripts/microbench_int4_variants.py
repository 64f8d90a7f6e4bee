"""INT4 dequant-GEMM kernel variant shootout on the real TPU.

Round-1 finding (PARITY.md / VERDICT): the fused INT4 kernel runs at
231 GB/s effective while a DMA-only sweep of the same weights hits
556 GB/s — the VMEM dequant is a non-overlapped cost.  This script
isolates WHERE the time goes by timing a ladder of kernel variants on
one representative decode GEMM (gate proj: [32,4096] x [4096,14336],
32-layer stack, slope-timed per CLAUDE.md):

  bf16      plain bf16 weights, no quant        -> MXU+DMA floor at 2 B/wt
  dma       copy-only kernel (no compute)       -> DMA ceiling at 0.5 B/wt
  noscale   bitcast->bf16 convert + dot         -> + convert cost
  noscale32 bitcast->f32->bf16 + dot            -> + extra convert pass
  scalar    convert f32, * scalar, ->bf16 + dot -> + scale multiply (no groups)
  group     CURRENT production path (reshape3d) -> + group broadcast
  repeat    jnp.repeat(s, G) expansion          -> alt group broadcast
  bigblk    current path, BK=4096 BN=1024       -> DMA/grid amortization
  manual    hand double-buffered HBM->VMEM DMA  -> explicit pipeline control

Numerics of probe variants are intentionally wrong (timing only); the
winner gets re-validated against unpack_int4_ref before graduating into
ops/quant_matmul.py.
"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
B, K, N, L = 32, 4096, 14336, 32


# ---------------------------------------------------------------- kernels

def _var_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k, group, mode):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    w4 = pltpu.bitcast(w_ref[...], jnp.int4)
    KB, NB = w4.shape
    nG = KB // group
    g0 = pl.program_id(1) * nG

    if mode == "noscale":
        wf = w4.astype(x.dtype)
    elif mode == "noscale32":
        wf = w4.astype(jnp.float32).astype(x.dtype)
    elif mode == "scalar":
        wf = (w4.astype(jnp.float32) * s_ref[0, 0]).astype(x.dtype)
    elif mode == "group":
        s = s_ref[pl.ds(g0, nG)]
        w3 = w4.astype(jnp.float32).reshape(nG, group, NB) * s[:, None, :]
        wf = w3.reshape(KB, NB).astype(x.dtype)
    elif mode == "repeat":
        s = s_ref[pl.ds(g0, nG)]
        se = jnp.repeat(s, group, axis=0)
        wf = (w4.astype(jnp.float32) * se).astype(x.dtype)
    elif mode in ("shift", "shiftscale", "bitconst", "bitconst_s"):
        # split-half semantics assumed: byte row r packs original rows
        # (r, r + K/2) -> lo/hi nibble halves are CONTIGUOUS K ranges, so
        # two plain dots replace the packed int4 sublane expansion.
        p = w_ref[...]                              # int8 [KB/2, NB]
        if mode.startswith("shift"):
            lo = jnp.int8(p << 4) >> 4              # signed low nibble
            hi = p >> 4                             # arithmetic: signed
            wl = lo.astype(x.dtype)
            wh = hi.astype(x.dtype)
        else:
            # build bf16 bits directly: 0x4480 | u == 1024.0 + 8.0 * u
            # for the UNSIGNED nibble u (exact: 8u sits in the low
            # mantissa); signedness + bias fold into scale & correction
            p16 = p.astype(jnp.int16)
            wl = pltpu.bitcast(jnp.int16(0x4480) | (p16 & 0xF), jnp.bfloat16)
            wh = pltpu.bitcast(jnp.int16(0x4480) | ((p16 >> 4) & 0xF),
                               jnp.bfloat16)
        if mode in ("shiftscale", "bitconst_s"):
            nG2 = (KB // 2) // group
            s_lo = s_ref[pl.ds(pl.program_id(1) * nG, nG2)]
            s_hi = s_ref[pl.ds(pl.program_id(1) * nG + nG2, nG2)]
            wl = (wl.astype(jnp.float32).reshape(nG2, group, NB)
                  * s_lo[:, None, :]).reshape(KB // 2, NB).astype(x.dtype)
            wh = (wh.astype(jnp.float32).reshape(nG2, group, NB)
                  * s_hi[:, None, :]).reshape(KB // 2, NB).astype(x.dtype)
        xl = x[:, : KB // 2]
        xh = x[:, KB // 2 :]
        acc_ref[...] = (
            acc_ref[...]
            + jax.lax.dot_general(xl, wl, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(xh, wh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32))

        @pl.when(pl.program_id(1) == n_k - 1)
        def _done2():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)

        return
    else:
        raise ValueError(mode)

    acc_ref[...] = acc_ref[...] + jax.lax.dot_general(
        x, wf, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == n_k - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def var_matmul(x, packed, scale, *, mode, block_n=512, block_k=2048,
               const_w=False):
    T, Kd = x.shape
    Kh, Nd = packed.shape
    BN = min(block_n, Nd)
    g = GROUP
    BK = max(g * 8, min(block_k, Kd) // (g * 8) * (g * 8))
    if Kd % BK:
        BK = Kd
    n_k = Kd // BK
    # const_w: weight block pinned to (0,0) — Mosaic skips the re-copy on
    # revisit, isolating pure compute time (numerics intentionally wrong)
    w_map = (lambda j, k: (0, 0)) if const_w else (lambda j, k: (k, j))
    in_specs = [
        pl.BlockSpec((T, BK), lambda j, k: (0, k)),
        pl.BlockSpec((BK // 2, BN), w_map),
        pl.BlockSpec((Kd // g, BN), lambda j, k: (0, j)),
    ]
    kernel = functools.partial(_var_kernel, n_k=n_k, group=g, mode=mode)
    return pl.pallas_call(
        kernel,
        grid=(Nd // BN, n_k),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((T, BN), lambda j, k: (0, j)),
        out_shape=jax.ShapeDtypeStruct((T, Nd), x.dtype),
        scratch_shapes=[pltpu.VMEM((T, BN), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, packed, scale)


# DMA-only: stream all packed bytes into VMEM, touch one lane per block.
def _dma_kernel(w_ref, o_ref):
    o_ref[...] = o_ref[...] * 0.0 + w_ref[0:8, 0:128].astype(jnp.float32)


def dma_sweep(packed, *, block_n=512, block_k=2048):
    Kh, Nd = packed.shape
    BN = min(block_n, Nd)
    BKh = min(block_k // 2, Kh)
    return pl.pallas_call(
        _dma_kernel,
        grid=(Nd // BN, Kh // BKh),
        in_specs=[pl.BlockSpec((BKh, BN), lambda j, k: (k, j))],
        out_specs=pl.BlockSpec((8, 128), lambda j, k: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(packed)


# Manual double-buffered DMA variant: grid over N blocks; fori over K
# chunks DMA'ing packed nibbles into VMEM scratch while the MXU works on
# the previous chunk.
def _manual_kernel(x_ref, w_hbm, s_hbm, o_ref, wbuf, sems, sbuf, ssem,
                   *, n_k, BK, BN, group, mode):
    j = pl.program_id(0)
    nG = BK // group

    def dma(k, slot):
        return pltpu.make_async_copy(
            w_hbm.at[pl.ds(k * (BK // 2), BK // 2), pl.ds(j * BN, BN)],
            wbuf.at[slot], sems.at[slot])

    sdma = pltpu.make_async_copy(
        s_hbm.at[:, pl.ds(j * BN, BN)], sbuf, ssem)
    sdma.start()
    dma(0, 0).start()
    sdma.wait()

    def body(k, acc_v):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < n_k)
        def _():
            dma(k + 1, jax.lax.rem(k + 1, 2)).start()

        dma(k, slot).wait()
        w4 = pltpu.bitcast(wbuf[slot], jnp.int4)
        if mode == "manual":
            s = sbuf[pl.ds(k * nG, nG)]
            w3 = w4.astype(jnp.float32).reshape(nG, group, -1) * s[:, None, :]
            wf = w3.reshape(BK, -1).astype(jnp.bfloat16)
        else:  # manual_noscale
            wf = w4.astype(jnp.bfloat16)
        xk = x_ref[:, pl.ds(k * BK, BK)]
        return acc_v + jax.lax.dot_general(
            xk, wf, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc_v = jax.lax.fori_loop(
        0, n_k, body, jnp.zeros(o_ref.shape, jnp.float32))
    o_ref[...] = acc_v.astype(o_ref.dtype)


def manual_matmul(x, packed, scale, *, mode="manual", block_n=512,
                  block_k=2048):
    T, Kd = x.shape
    Kh, Nd = packed.shape
    BN = min(block_n, Nd)
    BK = min(block_k, Kd)
    n_k = Kd // BK
    g = GROUP
    return pl.pallas_call(
        functools.partial(_manual_kernel, n_k=n_k, BK=BK, BN=BN, group=g,
                          mode=mode),
        grid=(Nd // BN,),
        in_specs=[
            pl.BlockSpec((T, Kd), lambda j: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((T, BN), lambda j: (0, j)),
        out_shape=jax.ShapeDtypeStruct((T, Nd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, BK // 2, BN), jnp.int8),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((Kd // g, BN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, packed, scale)


# ---------------------------------------------------------------- timing

def timed_slope(name, make_fn, n1=4, n2=20, iters=3):
    ts = {}
    for n in (n1, n2):
        fn, args = make_fn(n)
        t0 = time.perf_counter()
        exe = fn.lower(*args).compile()
        tc = time.perf_counter() - t0
        out = exe(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = exe(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        ts[n] = (time.perf_counter() - t0) / iters
    per = (ts[n2] - ts[n1]) / (n2 - n1)
    gb = L * (K * N / 2) / 1e9
    print(f"{name:>14}: {per*1000:7.3f} ms/rep  "
          f"{gb/per:6.0f} GB/s(int4-bytes)  compile={tc:.1f}s", flush=True)
    return per


def main():
    which = sys.argv[1:] or [
        "dma", "bf16", "noscale", "noscale32", "scalar", "group",
        "repeat", "bigblk", "manual", "manual_noscale", "dma_big"]
    rng = np.random.default_rng(0)
    q = rng.integers(-8, 8, size=(K, N), dtype=np.int8)
    lo = q[0::2].astype(np.uint8) & 0xF
    hi = q[1::2].astype(np.uint8) & 0xF
    packed1 = ((hi << 4) | lo).astype(np.int8)
    packed = jnp.asarray(np.broadcast_to(packed1, (L, K // 2, N)).copy())
    scale1 = (rng.standard_normal((K // GROUP, N)).astype(np.float32) * 0.001
              + 0.01)
    scale = jnp.asarray(np.broadcast_to(scale1, (L,) + scale1.shape).copy())
    x = jnp.asarray(rng.standard_normal((B, K), dtype=np.float32) * 0.1,
                    jnp.bfloat16)
    wb16 = jnp.asarray(
        np.broadcast_to(
            rng.standard_normal((K, N), dtype=np.float32) * 0.01,
            (L, K, N)).copy(), jnp.bfloat16)

    def stack(per_layer, ws):
        @jax.jit
        def run(x, *ws):
            def rep(h, _):
                def body(h, lw):
                    y = per_layer(h, *lw)
                    return (h + y[:, :K].astype(h.dtype) * 1e-6), None
                h, _ = jax.lax.scan(body, h, ws)
                return h * (1.0 + 1e-6), None
            h, _ = jax.lax.scan(rep, x, jnp.arange(n))
            return h
        return run

    res = {}
    for v in which:
        if v == "bf16":
            def mk(nn):
                global n
                n = nn
                f = stack(lambda h, w: jnp.dot(
                    h, w, preferred_element_type=jnp.float32), (wb16,))
                return f, (x, wb16)
        elif v == "dma":
            def mk(nn):
                global n
                n = nn
                f = stack(lambda h, w: jnp.zeros((B, N), jnp.float32) +
                          jnp.sum(dma_sweep(w)) * 1e-6, (packed,))
                return f, (x, packed)
        elif v == "dma_big":
            def mk(nn):
                global n
                n = nn
                f = stack(lambda h, w: jnp.zeros((B, N), jnp.float32) +
                          jnp.sum(dma_sweep(
                              w, block_n=2048, block_k=4096)) * 1e-6,
                          (packed,))
                return f, (x, packed)
        elif v.endswith("0"):
            def mk(nn, v=v):
                global n
                n = nn
                f = stack(lambda h, w, s: var_matmul(
                    h, w, s, mode=v[:-1], const_w=True), (packed, scale))
                return f, (x, packed, scale)
        elif v == "manual_big":
            def mk(nn):
                global n
                n = nn
                f = stack(lambda h, w, s: manual_matmul(
                    h, w, s, mode="manual", block_n=1024, block_k=4096),
                    (packed, scale))
                return f, (x, packed, scale)
        elif v == "bigblk":
            def mk(nn):
                global n
                n = nn
                f = stack(lambda h, w, s: var_matmul(
                    h, w, s, mode="group", block_n=1024, block_k=4096),
                    (packed, scale))
                return f, (x, packed, scale)
        elif v in ("manual", "manual_noscale"):
            def mk(nn, v=v):
                global n
                n = nn
                f = stack(lambda h, w, s: manual_matmul(h, w, s, mode=v),
                          (packed, scale))
                return f, (x, packed, scale)
        else:
            def mk(nn, v=v):
                global n
                n = nn
                f = stack(lambda h, w, s: var_matmul(h, w, s, mode=v),
                          (packed, scale))
                return f, (x, packed, scale)
        try:
            res[v] = timed_slope(v, mk)
        except Exception as e:
            print(f"{v:>14}: FAILED {type(e).__name__}: {e}", flush=True)

    theo = L * K * N / 2 / 819e9
    print(f"\ntheoretical int4 DMA: {theo*1000:.2f} ms "
          f"(bf16 floor {theo*4*1000:.2f} ms)")


if __name__ == "__main__":
    main()
