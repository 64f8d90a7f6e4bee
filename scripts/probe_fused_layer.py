"""TPU perf probe for the fused whole-layer decode megakernel at the
bench (north-star) geometry: llama-3-8B, 32 layers, B=32, ctx 192.

Honest slope timing (CLAUDE.md): the kernel repeats via an outer
lax.scan inside ONE program; per-step = (t(N2) - t(N1)) / (N2 - N1).
Weights are random device-generated (values don't affect bandwidth).

  python scripts/probe_fused_layer.py [w4a8|w4a16|w8a16] [ctx]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_tpu_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import jax
import jax.numpy as jnp
import numpy as np

from iaas_sglang_tpu.ops.fused_layer import fused_decode_layers

MODE = sys.argv[1] if len(sys.argv) > 1 else "w4a8"
CTX = int(sys.argv[2]) if len(sys.argv) > 2 else 192

L, H, Nq, Nk, D, I = 32, 4096, 32, 8, 128, 14336
B, PS = int(os.environ.get('FB', '32')), 16
NqD, NkD = Nq * D, Nk * D
PAGES_PER_SEQ = -(-CTX // PS)
PPL = B * PAGES_PER_SEQ + 1
NP = L * PPL
INT4 = MODE.startswith("w4")


def gen_stacks(key):
    ks = jax.random.split(key, 9)

    def w(key, K, N):
        rows = K // 2 if INT4 else K
        q = jax.random.randint(key, (L, rows, N), -127, 127, jnp.int8)
        s = jnp.full((L, K // 128, N), 0.002, jnp.float32)
        return q, s

    qkv = w(ks[0], H, NqD + 2 * NkD)
    o = w(ks[1], NqD, H)
    gu = w(ks[2], H, 2 * I)
    dn = w(ks[3], I, H)
    kv = (jax.random.normal(ks[4], (2, NP, PS, NkD), jnp.bfloat16) * 0.3)
    hid = jax.random.normal(ks[5], (B, H), jnp.bfloat16) * 0.3
    n1 = jnp.ones((L, H), jnp.bfloat16)
    n2 = jnp.ones((L, H), jnp.bfloat16)
    return qkv, o, gu, dn, kv, hid, n1, n2


def main():
    print("devices:", jax.devices())
    key = jax.random.PRNGKey(0)
    (qkv, o, gu, dn, kv, hid, n1, n2) = jax.jit(gen_stacks)(key)
    jax.block_until_ready(kv)
    print("stacks ready")

    kv_lens = jnp.full((B,), CTX, jnp.int32)
    pages = np.zeros((B, PAGES_PER_SEQ), np.int32)
    for b in range(B):
        pages[b] = np.arange(b * PAGES_PER_SEQ, (b + 1) * PAGES_PER_SEQ)
    page_indices = jnp.asarray(pages)
    pos = CTX - 1
    out_slots = jnp.asarray(
        [int(pages[b, pos // PS]) * PS + pos % PS for b in range(B)],
        jnp.int32)
    cosf = jnp.ones((B, D // 2), jnp.float32) * 0.7
    sinf = jnp.ones((B, D // 2), jnp.float32) * 0.7

    def run_n(n):
        # weights MUST be jit ARGUMENTS: closed-over device arrays bake
        # into the program as constants (3.7 GB captured, pathological
        # lowering + remote-compile memory — the r3 zero-arg-jit lesson)
        @jax.jit
        def prog(hid, kv, qkv, o, gu, dn, n1, n2, cosf, sinf,
                 kv_lens, page_indices):
            def body(carry, _):
                h, kv = carry
                h2, ko, vo, kv = fused_decode_layers(
                    h, cosf, sinf, kv_lens, out_slots, page_indices, kv,
                    n1, n2,
                    qkv[0], qkv[1], o[0], o[1], gu[0], gu[1],
                    dn[0], dn[1],
                    num_q_heads=Nq, num_kv_heads=Nk, head_dim=D,
                    mode=MODE, sm_scale=D ** -0.5, eps=1e-5,
                    pages_per_layer=PPL,
                    nw=int(os.environ.get("FNW", "0")),
                    nkv=int(os.environ.get("FNKV", "4")),
                    block_k=int(os.environ.get("FBK", "2048")),
                    block_n=int(os.environ.get("FBN", "1024")),
                    head_group=int(os.environ.get("FHG", "4")))
                # keep k/v alive (cheap reduce) so nothing is DCE'd
                return (h2 + ko[0, :, :1] * 0 + vo[0, :, :1] * 0, kv), 0
            (h, kv), _ = jax.lax.scan(body, (hid, kv), None, length=n)
            return jnp.sum(h.astype(jnp.float32))

        args = (hid, kv, qkv, o, gu, dn, n1, n2, cosf, sinf,
                kv_lens, page_indices)
        t0 = time.monotonic()
        r = float(prog(*args))
        compile_s = time.monotonic() - t0
        ts = []
        for _ in range(4):
            t0 = time.monotonic()
            r = float(prog(*args))
            ts.append(time.monotonic() - t0)
        return min(ts), compile_s, r

    N1, N2 = int(os.environ.get('N1','2')), int(os.environ.get('N2','10'))
    t1, c1, r1 = run_n(N1)
    print(f"N={N1}: wall {t1 * 1e3:.2f} ms (compile {c1:.0f}s, r={r1:.3f})")
    t2, c2, r2 = run_n(N2)
    print(f"N={N2}: wall {t2 * 1e3:.2f} ms (compile {c2:.0f}s)")
    step_ms = (t2 - t1) / (N2 - N1) * 1e3
    wbytes = (H * (NqD + 2 * NkD) + NqD * H + 2 * H * I + I * H) * L
    wbytes = wbytes // 2 if INT4 else wbytes
    sbytes = (H * (NqD + 2 * NkD) + NqD * H + 2 * H * I + I * H) // 128 * 4 * L
    kvbytes = B * CTX * NkD * 2 * 2 * L
    gbs = (wbytes + sbytes + kvbytes) / (step_ms / 1e3) / 1e9
    print(f"mode={MODE} ctx={CTX}: {step_ms:.3f} ms/layer-stack-step "
          f"-> {gbs:.0f} GB/s effective (roofline 819)")


if __name__ == "__main__":
    main()
