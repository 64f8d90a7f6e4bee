"""Pallas kernel correctness vs the jnp reference, run in TPU interpret
mode on CPU (analog of sgl-kernel/tests/): decode + ragged extend."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def shapes():
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    Nq, Nk, D, ps, MP, NPg = 8, 4, 128, 16, 8, 64
    kv = jnp.asarray(
        rng.standard_normal((NPg, ps, 2 * Nk, D), dtype=np.float32),
        dtype=jnp.bfloat16) * 0.3
    return rng, Nq, Nk, D, ps, MP, NPg, kv


def _mk_batch(rng, B, kv_lens_l, q_lens, ps, MP, NPg):
    import jax.numpy as jnp

    pages = np.zeros((B, MP), np.int32)
    used = set()
    for b in range(B):
        n = -(-kv_lens_l[b] // ps) if kv_lens_l[b] else 0
        ids = [i for i in range(NPg) if i not in used][:n]
        used.update(ids)
        pages[b, :len(ids)] = ids
    cu = np.zeros(B + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)
    return (jnp.asarray(kv_lens_l, dtype=jnp.int32), jnp.asarray(pages),
            jnp.asarray(cu))


def test_decode_kernel_interpret(shapes):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    B = 4
    kv_lens_l = [7, 40, 96, 17]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = paged_decode_attention(q, kv, kv_lens, page_indices,
                                     sm_scale=D ** -0.5)
    ref = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("cp,nb", [(2, 2), (2, 3), (1, 4)])
def test_decode_kernel_pipeline_variants_interpret(shapes, cp, nb):
    """The global DMA pipeline under stress: multi-chunk sequences, pad
    rows interleaved mid-batch (DP-attention IDLE shape), tiny chunks and
    deeper buffering — all must match the jnp reference exactly."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    B = 6
    kv_lens_l = [0, 97, 0, 128, 3, 33]   # leading + interleaved pad rows
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = paged_decode_attention(q, kv, kv_lens, page_indices,
                                     sm_scale=D ** -0.5,
                                     chunk_pages=cp, num_bufs=nb)
    ref = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[nz], np.asarray(ref, np.float32)[nz],
        rtol=3e-2, atol=3e-2)
    assert not np.asarray(out, np.float32)[~nz].any()


def test_decode_kernel_sliding_window_chunk_skip_interpret(shapes):
    """Sliding window with the first in-window chunk past chunk 0: the
    kernel's fori_loop starts at c0 and must still match the reference."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    B = 3
    kv_lens_l = [120, 128, 40]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    # window 24 << kv_len, chunk = 2 pages = 32 tokens -> c0 > 0
    W = jnp.int32(24)
    with pltpu.force_tpu_interpret_mode():
        out = paged_decode_attention(q, kv, kv_lens, page_indices,
                                     sliding_window=W, sm_scale=D ** -0.5,
                                     chunk_pages=2)
    ref = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                               jnp.int32(B), sliding_window=W,
                               sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_extend_kernel_interpret(shapes):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.extend_attention import ragged_extend_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    q_lens = [40, 17, 1, 0]
    kv_lens_l = [40, 60, 25, 0]
    B = len(q_lens)
    T = sum(q_lens)
    Tpad = 64
    q = jnp.asarray(rng.standard_normal((Tpad, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = ragged_extend_attention(
            q, kv, kv_lens, page_indices, cu, jnp.int32(3),
            sm_scale=D ** -0.5, bq=32)
    ref = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                               jnp.int32(3), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out[:T], np.float32), np.asarray(ref[:T], np.float32),
        rtol=3e-2, atol=3e-2)


def test_mla_decode_kernel_interpret(shapes):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import mla_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import mla_paged_decode_attention

    rng, Nq, _, _, ps, MP, NPg, _ = shapes
    Dk, v_dim = 192, 128          # latent 128 + rope 64
    kv = jnp.asarray(
        rng.standard_normal((NPg, ps, 1, Dk), dtype=np.float32),
        dtype=jnp.bfloat16) * 0.3
    B = 4
    kv_lens_l = [7, 40, 96, 17]
    q = jnp.asarray(rng.standard_normal((B, Nq, Dk), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = mla_paged_decode_attention(
            q, kv, kv_lens, page_indices, sm_scale=Dk ** -0.5, v_dim=v_dim)
    ref = mla_paged_attention(q, kv, kv_lens, page_indices, cu, jnp.int32(B),
                              sm_scale=Dk ** -0.5, v_dim=v_dim)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_mla_decode_kernel_pipeline_interpret(shapes):
    """MLA pipeline stress: pad rows mid-batch + multi-chunk + NBUF=3."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import mla_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import mla_paged_decode_attention

    rng, Nq, _, _, ps, MP, NPg, _ = shapes
    Dk, v_dim = 192, 128
    kv = jnp.asarray(
        rng.standard_normal((NPg, ps, 1, Dk), dtype=np.float32),
        dtype=jnp.bfloat16) * 0.3
    B = 6
    kv_lens_l = [0, 97, 0, 128, 3, 33]
    q = jnp.asarray(rng.standard_normal((B, Nq, Dk), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = mla_paged_decode_attention(
            q, kv, kv_lens, page_indices, sm_scale=Dk ** -0.5, v_dim=v_dim,
            chunk_pages=2, num_bufs=3)
    ref = mla_paged_attention(q, kv, kv_lens, page_indices, cu, jnp.int32(B),
                              sm_scale=Dk ** -0.5, v_dim=v_dim)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[nz], np.asarray(ref, np.float32)[nz],
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("sad", [False, True],
                         ids=["weight_scale", "scale_after_dot"])
@pytest.mark.parametrize("zeros", [False, True], ids=["sym", "awq_zeros"])
def test_int4_matmul_kernel_interpret(zeros, sad):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.quant_matmul import (
        int4_matmul, pack_int4, unpack_int4_ref)

    rng = np.random.default_rng(1)
    T, K, N, G = 16, 2048, 256, 128
    s = (rng.random((K // G, N)).astype(np.float32) + 0.5) * 0.02
    if zeros:
        # AWQ asymmetric: unsigned nibbles + per-group zeros, mapped to the
        # signed domain at ingestion: q_s = q_u - 8, zero_scale = (z-8)*s
        q_u = rng.integers(0, 16, size=(K, N)).astype(np.int8)
        z = rng.integers(0, 16, size=(K // G, N)).astype(np.int8)
        q = q_u - 8
        zs = (z.astype(np.float32) - 8.0) * s
        wd = (q_u.astype(np.float32) - np.repeat(z, G, axis=0)) \
            * np.repeat(s, G, axis=0)
    else:
        q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
        zs = None
        wd = q.astype(np.float32) * np.repeat(s, G, axis=0)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))

    packed = jnp.asarray(pack_int4(q))
    assert (np.asarray(unpack_int4_ref(packed)) == q).all()
    ref = np.asarray(x) @ wd

    with pltpu.force_tpu_interpret_mode():
        out = int4_matmul(
            x, packed, jnp.asarray(s),
            jnp.asarray(zs) if zeros else None,
            group=G, block_n=128, block_k=1024, scale_after_dot=sad)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kn", [(2048, 256), (1536, 128), (2048, 384)],
                         ids=["even", "kfull", "nfull"])
@pytest.mark.parametrize("zeros", [False, True], ids=["sym", "awq_zeros"])
def test_int4_matmul_dma_kernel_interpret(zeros, kn):
    """The hand-pipelined DMA dequant-GEMM (production decode path) must
    match the dequantized reference, including the double-buffered K
    chunking, ragged block picks, and the AWQ zero table."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.quant_matmul import (
        int4_matmul_dma, pack_int4)

    rng = np.random.default_rng(2)
    K, N = kn
    T, G = 16, 128
    s = (rng.random((K // G, N)).astype(np.float32) + 0.5) * 0.02
    if zeros:
        q_u = rng.integers(0, 16, size=(K, N)).astype(np.int8)
        z = rng.integers(0, 16, size=(K // G, N)).astype(np.int8)
        q = q_u - 8
        zs = (z.astype(np.float32) - 8.0) * s
        wd = (q_u.astype(np.float32) - np.repeat(z, G, axis=0)) \
            * np.repeat(s, G, axis=0)
    else:
        q = rng.integers(-8, 8, size=(K, N)).astype(np.int8)
        zs = None
        wd = q.astype(np.float32) * np.repeat(s, G, axis=0)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    packed = jnp.asarray(pack_int4(q))
    ref = np.asarray(x) @ wd

    with pltpu.force_tpu_interpret_mode():
        out = int4_matmul_dma(
            x, packed, jnp.asarray(s),
            jnp.asarray(zs) if zeros else None,
            group=G, block_n=128, block_k=1024)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_mla_extend_kernel_interpret(shapes):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import mla_paged_attention
    from iaas_sglang_tpu.ops.extend_attention import (
        mla_ragged_extend_attention,
    )

    rng, Nq, _, _, ps, MP, NPg, _ = shapes
    Dk, v_dim = 192, 128
    kv = jnp.asarray(
        rng.standard_normal((NPg, ps, 1, Dk), dtype=np.float32),
        dtype=jnp.bfloat16) * 0.3
    q_lens = [40, 17, 1, 0]
    kv_lens_l = [40, 60, 25, 0]
    B, T, Tpad = len(q_lens), sum(q_lens), 64
    q = jnp.asarray(rng.standard_normal((Tpad, Nq, Dk), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = mla_ragged_extend_attention(
            q, kv, kv_lens, page_indices, cu, jnp.int32(3),
            sm_scale=Dk ** -0.5, v_dim=v_dim, bq=32)
    ref = mla_paged_attention(q, kv, kv_lens, page_indices, cu, jnp.int32(3),
                              sm_scale=Dk ** -0.5, v_dim=v_dim)
    np.testing.assert_allclose(
        np.asarray(out[:T], np.float32), np.asarray(ref[:T], np.float32),
        rtol=3e-2, atol=3e-2)


def test_extend_kernel_tree_mask_interpret(shapes):
    """Tree-verify mask in the extend kernel vs the jnp reference path."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.extend_attention import ragged_extend_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    Kp1 = 5
    q_lens = [Kp1, Kp1, 0]
    kv_lens_l = [23 + Kp1, 40 + Kp1, 0]
    B, T, Tpad = 3, 2 * Kp1, 16
    q = jnp.asarray(rng.standard_normal((Tpad, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    bits = np.zeros((B, 32), np.int32)
    for b in range(B):
        bits[b, 0] = 0b00001
        bits[b, 1] = 0b00011
        bits[b, 2] = 0b00101
        bits[b, 3] = 0b01011
        bits[b, 4] = 0b10101
    bits_j = jnp.asarray(bits)
    with pltpu.force_tpu_interpret_mode():
        out = ragged_extend_attention(
            q, kv, kv_lens, page_indices, cu, jnp.int32(2), None, bits_j,
            sm_scale=D ** -0.5)
    ref = _jnp_paged_attention(
        q, kv, kv_lens, page_indices, cu, jnp.int32(2),
        sm_scale=D ** -0.5, tree_bits=bits_j)
    np.testing.assert_allclose(
        np.asarray(out[:T], np.float32), np.asarray(ref[:T], np.float32),
        rtol=3e-2, atol=3e-2)


def test_decode_kernel_chunked_window_interpret(shapes):
    """Llama-4 chunked local attention: decode kernel vs jnp reference."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    B = 4
    kv_lens_l = [7, 40, 96, 17]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    C = jnp.int32(32)
    with pltpu.force_tpu_interpret_mode():
        out = paged_decode_attention(
            q, kv, kv_lens, page_indices, sliding_window=C,
            window_chunked=True, sm_scale=D ** -0.5)
    ref = _jnp_paged_attention(
        q, kv, kv_lens, page_indices, cu, jnp.int32(B),
        sliding_window=C, window_chunked=True, sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_extend_kernel_chunked_window_interpret(shapes):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.extend_attention import ragged_extend_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    q_lens = [40, 17, 1, 0]
    kv_lens_l = [40, 60, 25, 0]
    B = len(q_lens)
    T = sum(q_lens)
    Tpad = 64
    q = jnp.asarray(rng.standard_normal((Tpad, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    C = jnp.int32(32)
    with pltpu.force_tpu_interpret_mode():
        out = ragged_extend_attention(
            q, kv, kv_lens, page_indices, cu, jnp.int32(3),
            sliding_window=C, window_chunked=True,
            sm_scale=D ** -0.5, bq=32)
    ref = _jnp_paged_attention(
        q, kv, kv_lens, page_indices, cu, jnp.int32(3),
        sliding_window=C, window_chunked=True, sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out[:T], np.float32), np.asarray(ref[:T], np.float32),
        rtol=3e-2, atol=3e-2)


def test_jnp_chunked_window_mask_semantics():
    """floor(kpos/C) == floor(qpos/C) visibility, dense-mask oracle."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention

    rng = np.random.default_rng(1)
    Nq, Nk, D, ps = 2, 2, 8, 4
    S, C = 24, 8
    kv = jnp.asarray(rng.standard_normal((6, ps, 2 * Nk, D)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((S, Nq, D)), jnp.float32)
    kv_lens = jnp.asarray([S], jnp.int32)
    pages = jnp.arange(6, dtype=jnp.int32).reshape(1, 6)
    cu = jnp.asarray([0, S], jnp.int32)
    out = _jnp_paged_attention(
        q, kv, kv_lens, pages, cu, jnp.int32(1),
        sliding_window=C, window_chunked=True, sm_scale=D ** -0.5)
    # dense oracle
    k = kv.reshape(S, 2 * Nk, D)[:, 0::2]
    v = kv.reshape(S, 2 * Nk, D)[:, 1::2]
    qf = np.asarray(q).reshape(S, Nk, Nq // Nk, D)
    scores = np.einsum("tkgd,skd->tkgs", qf, np.asarray(k)) * D ** -0.5
    qpos = np.arange(S)[:, None]
    kpos = np.arange(S)[None, :]
    mask = (kpos <= qpos) & ((kpos // C) == (qpos // C))
    scores = np.where(mask[:, None, None, :], scores, -np.inf)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    ref = np.einsum("tkgs,skd->tkgd", p, np.asarray(v)).reshape(S, Nq, D)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-5, atol=2e-5)


def test_decode_kernel_fp8_kv_interpret(shapes):
    """FP8 KV pool: the kernel upcasts on read; result matches the jnp
    reference over the same fp8 pool exactly-ish, and the bf16 pool
    loosely (quantization error)."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    kv8 = kv.astype(jnp.float8_e4m3fn)
    B = 4
    kv_lens_l = [7, 40, 96, 17]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = paged_decode_attention(q, kv8, kv_lens, page_indices,
                                     sm_scale=D ** -0.5)
    ref8 = _jnp_paged_attention(q, kv8, kv_lens, page_indices, cu,
                                jnp.int32(B), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref8, np.float32),
        rtol=3e-2, atol=3e-2)
    ref16 = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                                 jnp.int32(B), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref16, np.float32),
        rtol=0.15, atol=0.05)


def test_extend_kernel_fp8_kv_interpret(shapes):
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.extend_attention import ragged_extend_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    kv8 = kv.astype(jnp.float8_e4m3fn)
    B = 3
    kv_lens_l = [24, 96, 40]
    q_lens = [8, 16, 8]
    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = ragged_extend_attention(q, kv8, kv_lens, page_indices, cu,
                                      jnp.int32(B), sm_scale=D ** -0.5,
                                      bq=32)
    ref8 = _jnp_paged_attention(q, kv8, kv_lens, page_indices, cu,
                                jnp.int32(B), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out[:T], np.float32), np.asarray(ref8[:T], np.float32),
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("zeros", [False, True])
def test_int4_matmul_dma_stacked_interpret(zeros):
    """The stacked-layer DMA kernel (scan path: layer indexed INSIDE the
    kernel, no per-layer HBM weight copy) must match per-layer dequant
    references for every layer index."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.quant_matmul import (
        int4_matmul_dma_stacked, pack_int4)

    rng = np.random.default_rng(5)
    L, K, N = 3, 1024, 256
    T, G = 8, 128
    s = (rng.random((L, K // G, N)).astype(np.float32) + 0.5) * 0.02
    if zeros:
        q_u = rng.integers(0, 16, size=(L, K, N)).astype(np.int8)
        z = rng.integers(0, 16, size=(L, K // G, N)).astype(np.int8)
        q = q_u - 8
        zs = (z.astype(np.float32) - 8.0) * s
        wd = (q_u.astype(np.float32) - np.repeat(z, G, axis=1)) \
            * np.repeat(s, G, axis=1)
    else:
        q = rng.integers(-8, 8, size=(L, K, N)).astype(np.int8)
        zs = None
        wd = q.astype(np.float32) * np.repeat(s, G, axis=1)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))
    packed = jnp.asarray(np.stack([pack_int4(q[l]) for l in range(L)]))

    for l in range(L):
        ref = np.asarray(x) @ wd[l]
        with pltpu.force_tpu_interpret_mode():
            out = int4_matmul_dma_stacked(
                x, packed, jnp.asarray(s),
                jnp.asarray(zs) if zeros else None,
                jnp.int32(l), group=G, block_n=128, block_k=512)
        np.testing.assert_allclose(
            np.asarray(out), ref, rtol=2e-2, atol=2e-2), l



@pytest.mark.parametrize("shapes", [0], indirect=False)
def test_decode_kernel_perhead_interpret(shapes):
    """The per-head compute variant must match the packed dot + jnp ref."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng = np.random.default_rng(11)
    Nq, Nk, D, ps, MP, NPg = 8, 4, 128, 4, 8, 40
    kv = jnp.asarray(rng.standard_normal((NPg, ps, 2 * Nk, D),
                                         dtype=np.float32) * 0.3,
                     jnp.bfloat16)
    B = 5
    kv_lens_l = [0, 17, 3, 32, 9]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    with pltpu.force_tpu_interpret_mode():
        out = paged_decode_attention(q, kv, kv_lens, page_indices,
                                     sm_scale=D ** -0.5, chunk_pages=2,
                                     compute="perhead")
    ref = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[nz], np.asarray(ref, np.float32)[nz],
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("dtype", ["int8", "fp8"])
def test_q8_matmul_dma_interpret(dtype):
    """8-bit (int8/fp8) pipelined dequant-GEMM vs dequantized reference,
    plain and stacked."""
    import jax.numpy as jnp
    import ml_dtypes
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.quant_matmul import (
        q8_matmul_dma, q8_matmul_dma_stacked)

    rng = np.random.default_rng(9)
    L, K, N, T, G = 3, 1024, 256, 8, 128
    if dtype == "int8":
        q = rng.integers(-127, 128, size=(L, K, N)).astype(np.int8)
        qf = q.astype(np.float32)
    else:
        raw = (rng.standard_normal((L, K, N)) * 4).astype(np.float32)
        q = raw.astype(ml_dtypes.float8_e4m3fn)
        qf = q.astype(np.float32)
    s = (rng.random((L, K // G, N)).astype(np.float32) + 0.5) * 0.02
    wd = qf * np.repeat(s, G, axis=1)
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        out = q8_matmul_dma(x, jnp.asarray(q[0]), jnp.asarray(s[0]),
                            group=G, block_n=128, block_k=512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ wd[0],
                               rtol=2e-2, atol=2e-2)
    for l in range(L):
        with pltpu.force_tpu_interpret_mode():
            out = q8_matmul_dma_stacked(
                x, jnp.asarray(q), jnp.asarray(s), jnp.int32(l),
                group=G, block_n=128, block_k=512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) @ wd[l],
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("mode", ["split", "split_t"])
def test_decode_kernel_split_interpret(shapes, mode):
    """r4 deinterleaved compute variants (half-width packed dot /
    transposed scores) must match the jnp reference, including sliding
    windows and multi-chunk pipelines."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.decode_attention import paged_decode_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    B = 6
    kv_lens_l = [0, 97, 0, 128, 3, 33]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    out = paged_decode_attention(q, kv, kv_lens, page_indices,
                                 sm_scale=D ** -0.5, chunk_pages=2,
                                 compute=mode, interpret=True)
    ref = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[nz], np.asarray(ref, np.float32)[nz],
        rtol=3e-2, atol=3e-2)
    # sliding window
    out_w = paged_decode_attention(q, kv, kv_lens, page_indices, 40,
                                   sm_scale=D ** -0.5, chunk_pages=2,
                                   compute=mode, interpret=True)
    ref_w = _jnp_paged_attention(q, kv, kv_lens, page_indices, cu,
                                 jnp.int32(B), sm_scale=D ** -0.5,
                                 sliding_window=40)
    np.testing.assert_allclose(
        np.asarray(out_w, np.float32)[nz],
        np.asarray(ref_w, np.float32)[nz], rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("zeros,pre", [(False, False), (True, False),
                                       (False, True), (True, True)])
def test_q_a8_dma_interpret(zeros, pre):
    """Integer-dot W4A8 stacked kernel vs the dequantized int reference
    (same quantized activations): exact up to f32 accumulation order.
    pre=True feeds the pre-grouped [K/g, T, g] activation layout (the
    hoisted-transpose variant)."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.quant_matmul import (
        q_matmul_dma_stacked_a8, quantize_act_int8, group_act_int8,
        pack_int4)

    rng = np.random.default_rng(5)
    L, K, N, T, G = 3, 1024, 256, 8, 128
    q = rng.integers(-8, 8, size=(L, K, N)).astype(np.int8)
    packed = np.stack([pack_int4(q[l]) for l in range(L)])
    sc = (rng.random((L, K // G, N)).astype(np.float32) * 0.001 + 0.01)
    zs = (rng.random((L, K // G, N)).astype(np.float32) * 0.01 - 0.005
          ) if zeros else None
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    xq, xs, rs = quantize_act_int8(x, G)
    xq_np = np.asarray(xq, np.int32)
    xs_np = np.asarray(xs, np.float32)
    for li in range(L):
        wf = q[li].astype(np.float64) * np.repeat(sc[li], G, axis=0)
        ref = (xq_np.astype(np.float64) @ wf) * xs_np
        if zeros:
            rs_np = xq_np.reshape(T, K // G, G).sum(-1).astype(np.float64)
            ref = ref - (rs_np @ zs[li].astype(np.float64)) * xs_np
        got = q_matmul_dma_stacked_a8(
            group_act_int8(xq, G) if pre else xq, xs, rs,
            jnp.asarray(packed), jnp.asarray(sc),
            None if zs is None else jnp.asarray(zs),
            li, group=G, pre_grouped=pre, interpret=True)
        err = np.abs(np.asarray(got, np.float64) - ref).max() / (
            np.abs(ref).max() + 1e-9)
        assert err < 2e-2, (li, err)


def _to_split(kv):
    """[NP, ps, 2Nk, D] interleaved -> [2, NP, ps, Nk*D] plane-flat."""
    import jax.numpy as jnp
    NP, ps, NK2, D = kv.shape
    k = kv[:, :, 0::2, :].reshape(NP, ps, NK2 // 2 * D)
    v = kv[:, :, 1::2, :].reshape(NP, ps, NK2 // 2 * D)
    return jnp.stack([k, v], axis=0)


@pytest.mark.parametrize("hg,nb", [(4, 4), (2, 4), (8, 2)])
def test_decode_split_kernel_interpret(shapes, hg, nb):
    """r4 K/V-split decode kernel vs the jnp reference (split pages):
    head-group packed dots (incl. multi-group), depth-N prefetch,
    sliding windows, multi-chunk pipeline."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.split_attention import (
        paged_decode_attention_split)

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    kvs = _to_split(kv)
    B = 6
    kv_lens_l = [0, 97, 0, 128, 3, 33]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    out = paged_decode_attention_split(q, kvs, kv_lens, page_indices,
                                       sm_scale=D ** -0.5, chunk_pages=2,
                                       head_group=hg, num_bufs=nb,
                                       interpret=True)
    ref = _jnp_paged_attention(q, kvs, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[nz], np.asarray(ref, np.float32)[nz],
        rtol=3e-2, atol=3e-2)
    out_w = paged_decode_attention_split(q, kvs, kv_lens, page_indices, 40,
                                         sm_scale=D ** -0.5, chunk_pages=2,
                                         head_group=hg, num_bufs=nb,
                                         interpret=True)
    ref_w = _jnp_paged_attention(q, kvs, kv_lens, page_indices, cu,
                                 jnp.int32(B), sm_scale=D ** -0.5,
                                 sliding_window=40)
    np.testing.assert_allclose(
        np.asarray(out_w, np.float32)[nz],
        np.asarray(ref_w, np.float32)[nz], rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("D", [64, 32])
def test_decode_split_kernel_small_head_dim_interpret(D):
    """D % 128 != 0 takes the per-head-store epilogue (Mosaic cannot
    concat value slices at mismatched sub-128 lane offsets — r4); lock
    both epilogue paths in (ADVICE r4)."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.split_attention import (
        paged_decode_attention_split)

    rng = np.random.default_rng(5)
    Nq, Nk, ps, MP, NPg = 8, 4, 16, 8, 64
    k = jnp.asarray(rng.standard_normal((NPg, ps, Nk * D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((NPg, ps, Nk * D)), jnp.bfloat16)
    kvs = jnp.stack([k, v], axis=0) * 0.3
    B = 4
    kv_lens_l = [7, 97, 0, 128]
    q = jnp.asarray(rng.standard_normal((B, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)
    out = paged_decode_attention_split(q, kvs, kv_lens, page_indices,
                                       sm_scale=D ** -0.5, chunk_pages=2,
                                       interpret=True)
    ref = _jnp_paged_attention(q, kvs, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out, np.float32)[nz], np.asarray(ref, np.float32)[nz],
        rtol=3e-2, atol=3e-2)


@pytest.mark.parametrize("case", ["plain", "window", "chunked", "softcap"])
def test_extend_split_kernel_interpret(shapes, case):
    """r4 flat-q-block split extend kernel vs the jnp reference: ragged
    multi-sequence batches crossing q-block boundaries, causal KV-block
    skipping, windows (incl. chunked local) and softcap."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.split_attention import (
        ragged_extend_attention_split)

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    kvs = _to_split(kv)
    B = 4
    kv_lens_l = [39, 90, 17, 128]
    q_lens = [7, 60, 17, 33]          # ragged; spans q-block boundaries
    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    kw = dict(sm_scale=D ** -0.5, num_q_per_blk=32, kv_pages_per_blk=2,
              interpret=True)
    rkw = dict(sm_scale=D ** -0.5)
    if case == "window":
        kw["sliding_window"] = 25
        rkw["sliding_window"] = 25
    elif case == "chunked":
        kw["sliding_window"] = 32
        kw["window_chunked"] = True
        rkw["sliding_window"] = 32
        rkw["window_chunked"] = True
    elif case == "softcap":
        kw["logit_softcap"] = 30.0
        rkw["logit_softcap"] = 30.0
    out = ragged_extend_attention_split(
        q, kvs, kv_lens, page_indices, cu, jnp.int32(B),
        kw.pop("sliding_window", None), **kw)
    ref = _jnp_paged_attention(q, kvs, kv_lens, page_indices, cu,
                               jnp.int32(B), **rkw)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)


def test_extend_interleaved_kernel_split_layout_interpret(shapes):
    """The per-(seq, q-tile) extend kernel (tree-mask path) reads the
    split layout too."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import _jnp_paged_attention
    from iaas_sglang_tpu.ops.extend_attention import ragged_extend_attention

    rng, Nq, Nk, D, ps, MP, NPg, kv = shapes
    kvs = _to_split(kv)
    B = 3
    kv_lens_l = [39, 90, 17]
    q_lens = [7, 30, 17]
    T = sum(q_lens)
    q = jnp.asarray(rng.standard_normal((T, Nq, D), dtype=np.float32),
                    dtype=jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, q_lens, ps, MP, NPg)
    out = ragged_extend_attention(
        q, kvs, kv_lens, page_indices, cu, jnp.int32(B),
        sm_scale=D ** -0.5, interpret=True)
    ref = _jnp_paged_attention(q, kvs, kv_lens, page_indices, cu,
                               jnp.int32(B), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=3e-2, atol=3e-2)
    # tree-mask path on split pages
    q_lens_t = [4, 4, 4]
    Tt = sum(q_lens_t)
    qt = jnp.asarray(rng.standard_normal((Tt, Nq, D), dtype=np.float32),
                     dtype=jnp.bfloat16)
    kv_lens_t, pit, cut = _mk_batch(
        rng, B, kv_lens_l, q_lens_t, ps, MP, NPg)
    bits = np.zeros((B, 32), np.int32)
    for b in range(B):
        bits[b, 0] = 0b0001
        bits[b, 1] = 0b0011
        bits[b, 2] = 0b0101
        bits[b, 3] = 0b1011
    out_t = ragged_extend_attention(
        qt, kvs, kv_lens_t, pit, cut, jnp.int32(B),
        None, jnp.asarray(bits),
        sm_scale=D ** -0.5, interpret=True)
    ref_t = _jnp_paged_attention(qt, kvs, kv_lens_t, pit, cut,
                                 jnp.int32(B), sm_scale=D ** -0.5,
                                 tree_bits=jnp.asarray(bits))
    np.testing.assert_allclose(
        np.asarray(out_t, np.float32), np.asarray(ref_t, np.float32),
        rtol=3e-2, atol=3e-2)


def test_q_a8_dma_eight_bit_interpret():
    """W8A8 int8 path of the integer-dot kernel (per-channel scales tiled
    to 8 rows) vs the int reference."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.quant_matmul import (
        q_matmul_dma_stacked_a8, quantize_act_int8)

    rng = np.random.default_rng(6)
    L, K, N, T = 2, 1024, 256, 8
    w = rng.integers(-127, 128, (L, K, N)).astype(np.int8)
    scpc = (rng.random((L, 1, N)).astype(np.float32) * 0.001 + 0.01)
    sc8 = np.tile(scpc, (1, 8, 1))
    g = K // 8
    x = jnp.asarray(rng.standard_normal((T, K)).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    xq, xs, rs = quantize_act_int8(x, g)
    for li in range(L):
        ref = ((np.asarray(xq, np.int32) @ w[li].astype(np.int32))
               .astype(np.float64) * scpc[li] * np.asarray(xs, np.float64))
        got = q_matmul_dma_stacked_a8(
            xq, xs, rs, jnp.asarray(w), jnp.asarray(sc8), None, li,
            group=g, eight_bit=True, interpret=True)
        err = np.abs(np.asarray(got, np.float64) - ref).max() / (
            np.abs(ref).max() + 1e-9)
        assert err < 1e-2, (li, err)


def test_int8_kv_split_kernels_interpret():
    """INT8 KV with inline per-token po2 scales (r5, VERDICT #3): the
    split decode + extend kernels must match the jnp reference reading
    the same int8 pool EXACTLY, and stay within quantization tolerance
    of the bf16 pool."""
    import jax.numpy as jnp

    from iaas_sglang_tpu.ops.attention import (
        _jnp_paged_attention, quantize_kv_int8, write_kv_pages)
    from iaas_sglang_tpu.ops.split_attention import (
        paged_decode_attention_split, ragged_extend_attention_split)

    rng = np.random.default_rng(11)
    Nq, Nk, D, ps, MP, NPg = 8, 4, 128, 16, 8, 64
    NkD = Nk * D
    kvf = jnp.asarray(rng.standard_normal((2, NPg, ps, NkD)) * 0.4,
                      jnp.bfloat16)
    # int8 pool built by the write path itself (token rows + scales)
    kv8 = jnp.zeros((2, NPg, ps, NkD + 128), jnp.int8)
    rows_k = kvf[0].reshape(NPg * ps, Nk, D)
    rows_v = kvf[1].reshape(NPg * ps, Nk, D)
    kv8 = write_kv_pages(kv8, jnp.arange(NPg * ps), rows_k, rows_v)
    assert kv8.shape == (2, NPg, ps, NkD + 128)

    B = 4
    kv_lens_l = [7, 97, 0, 64]
    q = jnp.asarray(rng.standard_normal((B, Nq, D)), jnp.bfloat16)
    kv_lens, page_indices, cu = _mk_batch(
        rng, B, kv_lens_l, [1] * B, ps, MP, NPg)

    out8 = paged_decode_attention_split(
        q, kv8, kv_lens, page_indices, sm_scale=D ** -0.5,
        chunk_pages=2, interpret=True)
    ref8 = _jnp_paged_attention(q, kv8, kv_lens, page_indices, cu,
                                jnp.int32(B), sm_scale=D ** -0.5)
    reff = _jnp_paged_attention(q, kvf, kv_lens, page_indices, cu,
                                jnp.int32(B), sm_scale=D ** -0.5)
    nz = np.asarray(kv_lens) > 0
    np.testing.assert_allclose(
        np.asarray(out8, np.float32)[nz], np.asarray(ref8, np.float32)[nz],
        rtol=3e-2, atol=3e-2)
    # int8 vs bf16: quantization error only
    np.testing.assert_allclose(
        np.asarray(ref8, np.float32)[nz], np.asarray(reff, np.float32)[nz],
        rtol=8e-2, atol=8e-2)

    # extend over the same int8 pool
    q_lens = [3, 17, 1, 9]
    T = sum(q_lens)
    qe = jnp.asarray(rng.standard_normal((T, Nq, D)), jnp.bfloat16)
    kv_lens2, page_indices2, cu2 = _mk_batch(
        rng, B, [39, 97, 5, 64], q_lens, ps, MP, NPg)
    oute = ragged_extend_attention_split(
        qe, kv8, kv_lens2, page_indices2, cu2, jnp.int32(B), None,
        sm_scale=D ** -0.5, num_q_per_blk=16, kv_pages_per_blk=2,
        interpret=True)
    refe = _jnp_paged_attention(qe, kv8, kv_lens2, page_indices2, cu2,
                                jnp.int32(B), sm_scale=D ** -0.5)
    np.testing.assert_allclose(
        np.asarray(oute, np.float32), np.asarray(refe, np.float32),
        rtol=3e-2, atol=3e-2)

    # quantize/dequantize roundtrip error bound (po2 scale: <= 2/127 rel)
    x = jnp.asarray(rng.standard_normal((32, NkD)) * 3, jnp.float32)
    rows = quantize_kv_int8(x)
    from iaas_sglang_tpu.ops.attention import dequantize_kv_int8
    back = dequantize_kv_int8(rows, jnp.float32)
    err = np.abs(np.asarray(back) - np.asarray(x))
    amax = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
    assert (err <= amax * 2.01 / 127).all()
