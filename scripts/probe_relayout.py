"""Probe Mosaic lowering + cost of the seq-major <-> head-major relayouts
the fused-layer decode kernel needs (r5):

  q-side: GEMM output qflat [B, Nq*D] (seqs in sublanes) -> per-seq
          [Nq, D] operands (heads in sublanes) for the packed score dots
  o-side: per-seq attention output [Nq, D] -> o-proj GEMM input
          [B, Nq*D]

Variants probed per direction:
  reshape   value reshape [B, NqD] -> [B, Nq, D] (one relayout op)
  slab      per-head store q3[:, h, :] = qflat[:, hD:(h+1)D]
            (strided single-sublane writes across B tiles)
  reduce    per-seq masked reduction over the sublane dim of a
            head-leading [Nq, B, D] scratch (guaranteed-lowerable)

Run ON TPU (tiny shapes, compiles in seconds):
  JAX_COMPILATION_CACHE_DIR=/root/.cache/jax_tpu_cache python scripts/probe_relayout.py
"""

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, Nq, D = 32, 32, 128
REPS = 2000


def _kernel(x_ref, o_ref, q3, *, variant, reps):
    def body(i, acc):
        x = x_ref[...] + acc  # serialized dep so reps don't fold
        if variant == "reshape":
            q3[...] = x.reshape(B, Nq, D)
        elif variant == "slab":
            for h in range(Nq):
                q3[:, h, :] = x[:, h * D:(h + 1) * D]
        elif variant == "noop":
            q3[:, 0, :] = x[:, :D]
        # consume: per-seq leading-dim read (the attention access pattern)
        s = jax.lax.rem(i, B)
        return acc + jnp.sum(q3[s]) * 0.0 + 1.0

    acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    o_ref[...] = jnp.full(o_ref.shape, acc, jnp.float32)


def _kernel_rev(x3_ref, o_ref, flat, *, variant, reps):
    def body(i, acc):
        if variant == "reshape":
            flat[...] = (x3_ref[...] + acc).reshape(B, Nq * D)
        elif variant == "slab":
            for h in range(Nq):
                flat[:, h * D:(h + 1) * D] = x3_ref[:, h, :] + acc
        elif variant == "noop":
            flat[:, :D] = x3_ref[:, 0, :] + acc
        return acc + jnp.sum(flat[0]) * 0.0 + 1.0

    acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    o_ref[...] = jnp.full(o_ref.shape, acc, jnp.float32)


def _kernel_reduce(x_ref, o_ref, qT, *, reps):
    """head-leading scratch [Nq, B, D] built with free stores, per-seq
    extraction via masked sublane reduction."""
    def body(i, acc):
        x = x_ref[...] + acc
        for h in range(Nq):
            qT[h] = x[:, h * D:(h + 1) * D]     # [B, D] free store
        s = jax.lax.rem(i, B)
        row = jax.lax.broadcasted_iota(jnp.int32, (1, B, 1), 1)
        q_s = jnp.sum(jnp.where(row == s, qT[...], 0.0), axis=1)  # [Nq, D]
        return acc + jnp.sum(q_s) * 0.0 + 1.0

    acc = jax.lax.fori_loop(0, reps, body, jnp.float32(0))
    o_ref[...] = jnp.full(o_ref.shape, acc, jnp.float32)


def run(name, kernel_fn, scratch_shape, reps):
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (B, Nq * D)), jnp.float32)
    if "rev" in name:
        x = x.reshape(B, Nq, D)

    @jax.jit
    def go(x):
        return pl.pallas_call(
            functools.partial(kernel_fn, reps=reps),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM(scratch_shape, jnp.float32)],
        )(x)

    try:
        t0 = time.monotonic()
        r = float(go(x)[0, 0])
        compile_s = time.monotonic() - t0
        ts = []
        for _ in range(5):
            t0 = time.monotonic()
            r = float(go(x)[0, 0])
            ts.append(time.monotonic() - t0)
        print(f"{name:28s} ok   wall {min(ts)*1e3:8.2f} ms "
              f"(compile {compile_s:.1f}s, r={r:.0f})")
        return min(ts)
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name:28s} FAIL {msg}")
        return None


if __name__ == "__main__":
    print("devices:", jax.devices())
    R1, R2 = 2000, 20000
    for variant in ("noop", "reshape", "slab"):
        t1 = run(f"fwd_{variant}", functools.partial(_kernel, variant=variant),
                 (B, Nq, D), R1)
        t2 = run(f"fwd_{variant}", functools.partial(_kernel, variant=variant),
                 (B, Nq, D), R2)
        if t1 and t2:
            print(f"  -> slope {(t2 - t1) / (R2 - R1) * 1e6:8.3f} us/iter")
    t1 = run("fwd_reduce", _kernel_reduce, (Nq, B, D), R1)
    t2 = run("fwd_reduce", _kernel_reduce, (Nq, B, D), R2)
    if t1 and t2:
        print(f"  -> slope {(t2 - t1) / (R2 - R1) * 1e6:8.3f} us/iter")
    for variant in ("noop", "reshape", "slab"):
        t1 = run(f"rev_{variant}",
                 functools.partial(_kernel_rev, variant=variant),
                 (B, Nq * D), R1)
        t2 = run(f"rev_{variant}",
                 functools.partial(_kernel_rev, variant=variant),
                 (B, Nq * D), R2)
        if t1 and t2:
            print(f"  -> slope {(t2 - t1) / (R2 - R1) * 1e6:8.3f} us/iter")
