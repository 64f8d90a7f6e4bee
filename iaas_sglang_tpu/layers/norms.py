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


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray,
               bias: jnp.ndarray | None = None,
               eps: float = 1e-5) -> jnp.ndarray:
    """Mean-centering LayerNorm in fp32 (GPT-2/Starcoder2/StableLM/Cohere
    families; the reference reuses torch.nn.LayerNorm — on TPU XLA fuses
    this into the adjacent matmuls just like rms_norm)."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    xc = x32 - mean
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    normed = xc * lax.rsqrt(var + eps)
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dtype)
