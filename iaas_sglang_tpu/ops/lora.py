"""Multi-LoRA batched delta kernels.

Two strategies (the TPU answers to the reference's Triton shrink/expand
sgemm kernels, srt/lora/triton_ops/):

  * "onehot" (default): every adapter's shrink runs on every token and a
    one-hot [T, S+1] mixing matrix selects per-token rows — one dense MXU
    matmul chain, no gather/scatter. Cost scales with S·r, which beats
    kernel-launch/gather overheads while S·r stays small (<= ~128).
  * "gmm": tokens sorted by adapter slot, then megablox grouped matmuls
    A (shrink, [S+1, Hin, r]) and B (expand, [S+1, r, Hout]) over the
    ragged groups — cost scales with r alone, the right shape for
    many-adapter serving (S·r >> 128).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _tile(n: int, cap: int = 512) -> int:
    """Largest power-of-two tile <= cap that divides n."""
    t = 1
    while t * 2 <= cap and n % (t * 2) == 0:
        t *= 2
    return t


def lora_gmm_delta(
    x: jnp.ndarray,           # [T, Hin] (UNSORTED rows)
    A_l: jnp.ndarray,         # [S+1, Hin, r]
    B_l: jnp.ndarray,         # [S+1, r, Hout]
    order: jnp.ndarray,       # i32[T] token order sorted by adapter slot
    group_sizes: jnp.ndarray, # i32[S+1]
    scale_sorted: jnp.ndarray,  # f32[T] per-token adapter scaling (sorted)
) -> jnp.ndarray:
    """Grouped shrink+expand: returns the delta [T, Hout] in input order."""
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    T, Hin = x.shape
    S1, _, r = A_l.shape
    Hout = B_l.shape[-1]
    xs = x[order].astype(A_l.dtype)
    tm = _tile(T, 128)
    xa = gmm(xs, A_l, group_sizes,
             tiling=(tm, _tile(Hin), _tile(r, 128)))
    xa = xa * scale_sorted[:, None].astype(xa.dtype)
    y = gmm(xa, B_l, group_sizes,
            tiling=(tm, _tile(r, 128), _tile(Hout)))
    out = jnp.zeros((T, Hout), y.dtype)
    return out.at[order].set(y).astype(jnp.float32)
