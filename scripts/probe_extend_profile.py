"""xprof trace of the split extend kernel stack: where do the ~20 us per
grid step go? (r4: new kernel 6.7 ms vs jax_rpa 1.8 ms at the T=512 B=8
ctx=256 32L stack; 1-head ablation says compute is ~1.1 ms of it.)"""

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import glob
import sys
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "split"
    rng = np.random.default_rng(0)
    ps = 16
    pages_per_layer = 768
    NP = 32 * (pages_per_layer + 1)
    B, ctx, qlen = 8, 256, 64
    T = B * qlen
    kv_i = jnp.asarray(
        rng.standard_normal((NP, ps, 16, 128), dtype=np.float32) * 0.1,
        jnp.bfloat16)
    if which == "split":
        k = kv_i[:, :, 0::2, :]
        v = kv_i[:, :, 1::2, :]
        kv = jnp.stack([k, v], axis=1)
    else:
        kv = kv_i
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

    if which == "split":
        from iaas_sglang_tpu.ops.split_attention import (
            ragged_extend_attention_split)

        def call(h, kvx, l):
            return ragged_extend_attention_split(
                h, kvx, kv_lens, pt + l * (pages_per_layer + 1), cu, ns,
                sm_scale=0.088)
    else:
        from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
            ragged_paged_attention as jax_rpa)

        def call(h, kvx, l):
            return jax_rpa(h, kvx, kv_lens,
                           pt + l * (pages_per_layer + 1), cu,
                           ns.reshape(1), sm_scale=0.088)

    @jax.jit
    def run(q, kv):
        def body(h, l):
            return call(h, kv, l), None

        h, _ = jax.lax.scan(body, q, jnp.arange(32, dtype=jnp.int32))
        return h

    exe = run.lower(q0, kv).compile()
    out = exe(q0, kv)
    _ = float(jnp.sum(out).astype(jnp.float32))
    trace_dir = f"/tmp/xprof_extend_{which}"
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            out = exe(q0, kv)
        _ = float(jnp.sum(out).astype(jnp.float32))

    from jax.profiler import ProfileData

    xs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not xs:
        print("no xplane files")
        return
    pd = ProfileData.from_file(xs[-1])
    for plane in pd.planes:
        agg = defaultdict(float)
        total = 0.0
        for line in plane.lines:
            for ev in line.events:
                d = ev.duration_ns
                agg[ev.name] += d
                total += d
        if not agg:
            continue
        print(f"\n== plane: {plane.name} (total {total/1e6:.1f} ms) ==")
        for name, d in sorted(agg.items(), key=lambda kv: -kv[1])[:20]:
            print(f"  {d/1e6:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
