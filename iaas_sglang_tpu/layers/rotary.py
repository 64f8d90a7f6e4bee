"""Rotary position embeddings (half-split / NeoX convention, as used by the
Llama/Qwen families — analog of sglang layers/rotary_embedding.py:78).

Supports the `llama3` and `linear` rope-scaling schemes; YaRN/MRope land
with the model families that need them.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import numpy as np
import jax.numpy as jnp


def compute_inv_freq(head_dim: int, rope_theta: float,
                     rope_scaling: Optional[dict[str, Any]]) -> np.ndarray:
    inv_freq = 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )
    if not rope_scaling:
        return inv_freq.astype(np.float32)
    rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
    if rope_type == "llama3":
        # Llama-3.1 frequency-dependent scaling
        # (layers/rotary_embedding.py Llama3RotaryEmbedding analog).
        factor = rope_scaling["factor"]
        low = rope_scaling["low_freq_factor"]
        high = rope_scaling["high_freq_factor"]
        orig = rope_scaling["original_max_position_embeddings"]
        wavelen = 2 * math.pi / inv_freq
        ratio = orig / wavelen
        smooth = (ratio - low) / (high - low)
        scaled = np.where(
            wavelen > orig / low,  # low-frequency band: fully scaled
            inv_freq / factor,
            np.where(
                wavelen < orig / high,  # high-frequency band: unscaled
                inv_freq,
                (1 - smooth) * inv_freq / factor + smooth * inv_freq,
            ),
        )
        return scaled.astype(np.float32)
    if rope_type == "linear":
        return (inv_freq / rope_scaling["factor"]).astype(np.float32)
    if rope_type == "dynamic" and "alpha" in rope_scaling:
        # HunYuan NTK-alpha: static base stretch base*alpha^(D/(D-2))
        # (reference srt/layers/rotary_embedding.py
        # DynamicNTKAlphaRotaryEmbedding)
        base = rope_theta * rope_scaling["alpha"] ** (
            head_dim / (head_dim - 2))
        return (1.0 / (base ** (np.arange(0, head_dim, 2, dtype=np.float64)
                                / head_dim))).astype(np.float32)
    if rope_type == "yarn":
        # NTK-by-parts (YaRN, arXiv:2309.00071; HF _compute_yarn_parameters;
        # reference srt/layers/rotary_embedding.py YaRNScalingRotaryEmbedding)
        factor = rope_scaling["factor"]
        orig = rope_scaling.get("original_max_position_embeddings") or \
            rope_scaling.get("max_position_embeddings", 4096)
        beta_fast = rope_scaling.get("beta_fast") or 32
        beta_slow = rope_scaling.get("beta_slow") or 1
        truncate = rope_scaling.get("truncate", True)
        dim = head_dim

        def corr_dim(rot):
            return (dim * math.log(orig / (rot * 2 * math.pi))) \
                / (2 * math.log(rope_theta))

        low, high = corr_dim(beta_fast), corr_dim(beta_slow)
        if truncate:
            low, high = math.floor(low), math.ceil(high)
        low, high = max(low, 0), min(high, dim - 1)
        if low == high:
            high += 0.001
        ramp = np.clip(
            (np.arange(dim // 2, dtype=np.float64) - low) / (high - low), 0, 1)
        extrap_factor = 1 - ramp
        return (
            (inv_freq / factor) * (1 - extrap_factor)
            + inv_freq * extrap_factor
        ).astype(np.float32)
    if rope_type == "longrope":
        # Phi-3 LongRope (HF _compute_longrope_parameters; reference
        # srt/layers/rotary_embedding.py Phi3LongRoPEScaledRotaryEmbedding):
        # per-dimension rescale factors, long set used once the serving
        # context exceeds the original training window. ModelConfig injects
        # `max_position_embeddings`/`original_max_position_embeddings`.
        orig = rope_scaling.get("original_max_position_embeddings") or 4096
        maxp = rope_scaling.get("max_position_embeddings") or orig
        ext = rope_scaling["long_factor"] if maxp > orig \
            else rope_scaling["short_factor"]
        ext = np.asarray(ext, dtype=np.float64)
        return (inv_freq / ext).astype(np.float32)
    if rope_type in ("default", "mrope", ""):
        return inv_freq.astype(np.float32)
    raise NotImplementedError(f"rope scaling {rope_type!r} not supported yet")


def rope_attention_factor(rope_scaling: Optional[dict[str, Any]]) -> float:
    """Post-scaling applied to cos/sin (YaRN mscale; HF attention_scaling)."""
    if not rope_scaling:
        return 1.0
    rope_type = rope_scaling.get("rope_type", rope_scaling.get("type", ""))
    if rope_type == "longrope":
        af = rope_scaling.get("attention_factor")
        if af is not None:
            return float(af)
        orig = rope_scaling.get("original_max_position_embeddings") or 4096
        maxp = rope_scaling.get("max_position_embeddings") or orig
        factor = maxp / orig
        if factor <= 1.0:
            return 1.0
        return float(math.sqrt(1 + math.log(factor) / math.log(orig)))
    if rope_type != "yarn":
        return 1.0
    af = rope_scaling.get("attention_factor")
    if af is not None:
        return float(af)
    factor = rope_scaling["factor"]

    def get_mscale(scale, m=1.0):
        return 1.0 if scale <= 1 else 0.1 * m * math.log(scale) + 1.0

    mscale = rope_scaling.get("mscale")
    mscale_all = rope_scaling.get("mscale_all_dim")
    if mscale and mscale_all:
        return float(get_mscale(factor, mscale) / get_mscale(factor, mscale_all))
    return float(get_mscale(factor))


def apply_rope_interleaved(x: jnp.ndarray, positions: jnp.ndarray,
                           inv_freq: jnp.ndarray,
                           attn_factor: float = 1.0) -> jnp.ndarray:
    """Interleaved (complex-pair) rotary embedding, the DeepSeek MLA rope
    convention: pairs (x[..., 2i], x[..., 2i+1]) are rotated by
    positions * inv_freq[i] (HF deepseek_v2 `apply_rotary_emb` complex
    multiply; reference srt/layers/rotary_embedding.py DeepseekScalingRotary
    uses the same pair order).

    x: [T, N, D], positions: i32[T], inv_freq: f32[D/2]. Returns [T, N, D].
    """
    dtype = x.dtype
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, D/2]
    cos = jnp.cos(freqs)[:, None, :] * attn_factor
    sin = jnp.sin(freqs)[:, None, :] * attn_factor
    x32 = x.astype(jnp.float32)
    x1 = x32[..., 0::2]
    x2 = x32[..., 1::2]
    even = x1 * cos - x2 * sin
    odd = x1 * sin + x2 * cos
    return jnp.stack([even, odd], axis=-1).reshape(x.shape).astype(dtype)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, positions: jnp.ndarray,
               inv_freq: jnp.ndarray,
               attn_factor: float = 1.0,
               mrope_section=None,
               interleaved: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply rotary embedding.

    q: [T, Nq, D], k: [T, Nk, D], positions: i32[T], inv_freq: f32[D/2].
    Half-split convention: rotate pairs (x[i], x[i + D/2]).
    `interleaved=True` rotates adjacent pairs (x[2i], x[2i+1]) instead —
    the Cohere/GLM convention (HF redefines rotate_half for these models).

    MRope (Qwen2-VL, reference rotary_embedding.py:427 MRotaryEmbedding):
    positions is i32[3, T] (temporal, height, width) and `mrope_section`
    splits the D/2 frequency channels between the three position streams.
    """
    if positions.ndim == 2:
        assert mrope_section is not None and len(mrope_section) == 3
        f3 = positions.astype(jnp.float32)[:, :, None] \
            * inv_freq[None, None, :]                       # [3, T, D/2]
        s0, s1, _ = mrope_section
        freqs = jnp.concatenate(
            [f3[0, :, :s0], f3[1, :, s0 : s0 + s1], f3[2, :, s0 + s1 :]],
            axis=-1)                                        # [T, D/2]
    else:
        freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, D/2]
    cos = jnp.cos(freqs)[:, None, :] * attn_factor  # [T, 1, D/2]
    sin = jnp.sin(freqs)[:, None, :] * attn_factor

    def rot(x):
        dtype = x.dtype
        x32 = x.astype(jnp.float32)
        if interleaved:
            x1, x2 = x32[..., 0::2], x32[..., 1::2]
            return jnp.stack(
                [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
            ).reshape(x.shape).astype(dtype)
        half = x.shape[-1] // 2
        x1, x2 = x32[..., :half], x32[..., half:]
        return jnp.concatenate(
            [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
        ).astype(dtype)

    return rot(q), rot(k)
