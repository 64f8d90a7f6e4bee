"""Normalization ops. On TPU these are pure jnp — XLA fuses RMSNorm into the
surrounding matmuls, which is the reference's fused rmsnorm CUDA kernel
(sgl-kernel csrc/elementwise/) for free."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm in fp32 accumulation (analog of layers/layernorm.py:59)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    normed = x32 * lax.rsqrt(var + eps)
    return (normed * weight.astype(jnp.float32)).astype(dtype)
