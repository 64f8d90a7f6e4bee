"""DP attention (reference --enable-dp-attention, layers/dp_attention.py:61):
attention runs batch-parallel with UNSPLIT heads over all dp*tp attention
ranks, each owning a private KV page space; FFN/MoE stays TP/EP over the
full mesh. Every feature ships with a greedy-parity test (CLAUDE.md
convention): dp-attention ON must match OFF token-for-token.

Runs on the 8-virtual-device CPU mesh (run_tests.sh)."""

import numpy as np
import pytest

from iaas_sglang_tpu.entrypoints.engine import Engine
from iaas_sglang_tpu.server_args import ServerArgs

TINY_QWEN = dict(
    architectures=["Qwen2ForCausalLM"], model_type="qwen2",
    num_hidden_layers=2, hidden_size=64, num_attention_heads=8,
    num_key_value_heads=4, intermediate_size=128, vocab_size=512,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=1024,
    tie_word_embeddings=True,
)

TINY_DSV3 = dict(
    architectures=["DeepseekV3ForCausalLM"], model_type="deepseek_v3",
    num_hidden_layers=3, hidden_size=64, num_attention_heads=4,
    num_key_value_heads=4, intermediate_size=96, vocab_size=256,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
    tie_word_embeddings=False, q_lora_rank=24, kv_lora_rank=16,
    qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
    n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
    moe_intermediate_size=32, first_k_dense_replace=1,
    routed_scaling_factor=2.5, n_group=2, topk_group=1, norm_topk_prob=True,
)

PROMPTS = [[1, 2, 3] * 7, [5, 6] * 9, [1, 2, 3] * 7 + [9, 8], [7] * 5,
           [11, 12, 13, 14] * 4]


def _args(**kw):
    base = dict(model_path="dummy://t", load_format="dummy", page_size=4,
                max_total_tokens=8192, skip_tokenizer_init=True,
                chunked_prefill_size=16, random_seed=0)
    base.update(kw)
    return ServerArgs(**base)


def _gen(eng, prompts, sp, **kw):
    # fixed rids: the per-request RNG seed derives from hash(rid), so
    # cross-engine sampling parity needs identical request ids
    rids = [f"parity-{i}" for i in range(len(prompts))]
    return [o["output_ids"]
            for o in eng.generate(input_ids=prompts, sampling_params=sp,
                                  rid=rids, **kw)]


@pytest.fixture(scope="module")
def baseline_qwen():
    eng = Engine(_args(), hf_config_override=TINY_QWEN)
    yield eng
    eng.shutdown()


@pytest.fixture(scope="module")
def dp_qwen():
    eng = Engine(_args(tp_size=2, dp_size=2, enable_dp_attention=True),
                 hf_config_override=TINY_QWEN)
    yield eng
    eng.shutdown()


def test_greedy_parity_dense(baseline_qwen, dp_qwen):
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    assert _gen(dp_qwen, PROMPTS, sp) == _gen(baseline_qwen, PROMPTS, sp)


def test_sampling_rank_placement_independence(dp_qwen):
    """Seeded top-k/top-p sampling must not depend on which attention rank
    or padded row a request lands on: per-request RNG streams are keyed by
    (seed, step). Submitting the batch in reverse order shuffles rank
    assignment and row placement; per-rid outputs must be identical.
    (Cross-sharding token equality vs the tp=1 baseline is NOT asserted:
    a different GSPMD partitioning changes f32 reduction order, which can
    legitimately flip a categorical sample on near-uniform dummy logits.)"""
    sp = {"max_new_tokens": 8, "temperature": 0.8, "top_k": 20, "top_p": 0.9}
    rids = [f"s-{i}" for i in range(len(PROMPTS))]
    a = dp_qwen.generate(input_ids=PROMPTS, sampling_params=sp, rid=rids)
    b = dp_qwen.generate(input_ids=PROMPTS[::-1], sampling_params=sp,
                         rid=rids[::-1])
    assert [o["output_ids"] for o in a] == [o["output_ids"]
                                            for o in b[::-1]]


def test_penalties_and_logprobs_parity(baseline_qwen, dp_qwen):
    """Penalty rows and logprob fetch must respect the rank-major row map."""
    sp = {"max_new_tokens": 6, "temperature": 0.0, "frequency_penalty": 0.5}
    kw = dict(sampling_params=sp, return_logprob=True, top_logprobs_num=2,
              rid=[f"lp-{i}" for i in range(3)])
    a = baseline_qwen.generate(input_ids=PROMPTS[:3], **kw)
    b = dp_qwen.generate(input_ids=PROMPTS[:3], **kw)
    for x, y in zip(a, b):
        assert x["output_ids"] == y["output_ids"]
        # logprob values drift ~1e-3 between layouts (tp-sharded matmuls
        # change f32 reduction order); token choice must be identical
        np.testing.assert_allclose(
            x["meta_info"]["output_token_logprobs"],
            y["meta_info"]["output_token_logprobs"], atol=2e-2)


def test_greedy_parity_mla_ep():
    """The headline DP-attention case: MLA (DeepSeek) whose single latent
    head cannot shard over tp — KV shards over all 8 attention ranks,
    MoE runs EP over tp."""
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    eng0 = Engine(_args(), hf_config_override=TINY_DSV3)
    base = _gen(eng0, PROMPTS, sp)
    eng0.shutdown()
    eng1 = Engine(_args(tp_size=4, dp_size=2, ep_size=4,
                        enable_dp_attention=True),
                  hf_config_override=TINY_DSV3)
    assert _gen(eng1, PROMPTS, sp) == base
    # per-rank radix reuse: repeat must hit the cache and stay identical
    outs = eng1.generate(input_ids=PROMPTS,
                         sampling_params=sp)
    assert [o["output_ids"] for o in outs] == base
    assert any(o["meta_info"]["cached_tokens"] > 0 for o in outs)
    st = eng1.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
    eng1.shutdown()


def test_retraction_under_pressure():
    """Tiny per-rank pools force retraction; every request still finishes
    and pages balance across all rank allocators afterwards."""
    sp = {"max_new_tokens": 24, "temperature": 0.0, "ignore_eos": True}
    eng = Engine(_args(tp_size=2, dp_size=2, enable_dp_attention=True,
                       max_total_tokens=512, max_running_requests=16),
                 hf_config_override=TINY_QWEN)
    prompts = [[i + 1] * 48 for i in range(12)]
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    assert all(len(o["output_ids"]) == 24 for o in outs)
    st = eng.get_internal_state()
    assert st["free_pages"] + st["evictable_pages"] == st["total_pages"]
    eng.shutdown()


def test_incompatible_flags_rejected():
    with pytest.raises(ValueError):
        _args(enable_dp_attention=True, enable_hierarchical_cache=True)
    with pytest.raises(ValueError):
        _args(enable_dp_attention=True, disaggregation_mode="prefill")


def test_moe_ep_a2a_matches_dense():
    """All-to-all EP token dispatch (ops/moe.py moe_ep_a2a) must match the
    dense dispatch exactly when capacity suffices (8-dev CPU mesh)."""
    import jax.numpy as jnp
    import numpy as np

    from iaas_sglang_tpu.ops.moe import moe_block
    from iaas_sglang_tpu.parallel.mesh import make_mesh

    rng = np.random.default_rng(7)
    T, H, E, I, K = 64, 32, 8, 16, 2
    mesh_ctx = make_mesh(tp_size=8, dp_size=1)
    h = jnp.asarray(rng.standard_normal((T, H)).astype(np.float32) * 0.3)
    wr = jnp.asarray(rng.standard_normal((H, E)).astype(np.float32) * 0.3)
    wg = jnp.asarray(rng.standard_normal((E, H, I)).astype(np.float32) * 0.3)
    wu = jnp.asarray(rng.standard_normal((E, H, I)).astype(np.float32) * 0.3)
    wd = jnp.asarray(rng.standard_normal((E, I, H)).astype(np.float32) * 0.3)
    ref = moe_block(h, wr, wg, wu, wd, top_k=K, renormalize=True,
                    impl="dense")
    with mesh_ctx.mesh:
        got = moe_block(h, wr, wg, wu, wd, top_k=K, renormalize=True,
                        impl="ep_a2a", mesh=mesh_ctx.mesh,
                        capacity_factor=8.0)  # C = Tl*K: nothing can drop
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_moe_ep_a2a_engine_parity():
    """Engine with --moe-a2a-backend a2a (mixtral, ep=4) matches tp=1."""
    from tests.test_golden_model import TINY_MIXTRAL, _hf_moe_model
    from tests.utils import RawDriver, load_hf_weights_into, make_runner

    hf_model = _hf_moe_model(TINY_MIXTRAL)
    runner, cfg, sa = make_runner(TINY_MIXTRAL, tp_size=4, ep_size=4,
                                  moe_a2a_backend="a2a")
    assert runner.model.moe_impl == "ep_a2a"
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    from tests.test_golden_model import PROMPT
    from tests.utils import hf_forward_logits
    import numpy as np

    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_tbo_moe_parity():
    """--enable-two-batch-overlap must be bit-identical (the split is
    row-wise; only the schedule changes)."""
    from tests.test_golden_model import TINY_MIXTRAL, _hf_moe_model
    from tests.utils import (RawDriver, hf_forward_logits,
                             load_hf_weights_into, make_runner)
    from tests.test_golden_model import PROMPT
    import numpy as np

    hf_model = _hf_moe_model(TINY_MIXTRAL)
    runner, cfg, sa = make_runner(TINY_MIXTRAL, tp_size=4, ep_size=4,
                                  moe_a2a_backend="a2a",
                                  enable_two_batch_overlap=True)
    assert runner.model.tbo
    load_hf_weights_into(runner, hf_model)
    driver = RawDriver(runner, sa.page_size)
    ours = driver.prefill_logits(PROMPT)
    ref = hf_forward_logits(hf_model, PROMPT)
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-2)


def test_multi_step_decode_under_dp_attention(baseline_qwen):
    """r4 (VERDICT #5): multi-step decode (and cross-dispatch chaining)
    now runs under DP attention — the in-program page/slot recompute is
    rank-aware. Token-for-token parity vs the single-step baseline, with
    the multi path demonstrably engaged."""
    eng = Engine(_args(tp_size=2, dp_size=2, enable_dp_attention=True,
                       decode_steps_per_dispatch=4),
                 hf_config_override=TINY_QWEN)
    try:
        calls = {"multi": 0}
        orig = type(eng.scheduler).run_multi_batch

        def spy(self, b):
            calls["multi"] += 1
            return orig(self, b)

        type(eng.scheduler).run_multi_batch = spy
        sp = {"max_new_tokens": 11, "temperature": 0.0, "ignore_eos": True}
        try:
            outs = _gen(eng, PROMPTS, sp)
        finally:
            type(eng.scheduler).run_multi_batch = orig
        refs = _gen(baseline_qwen, PROMPTS, sp)
        assert calls["multi"] > 0, "multi-step did not engage under DP"
        assert outs == refs
        # penalties ride too (device count state under DP placement)
        spp = {"max_new_tokens": 9, "temperature": 0.0, "ignore_eos": True,
               "frequency_penalty": 0.6, "repetition_penalty": 1.15}
        outs_p = _gen(eng, PROMPTS[:3], spp)
        refs_p = _gen(baseline_qwen, PROMPTS[:3], spp)
        assert outs_p == refs_p
        eng.scheduler.check_memory_leak()
    finally:
        eng.shutdown()


def test_expert_capture_under_dp_attention():
    """r4: expert-distribution recording works under DP attention (the
    capture tap masks per-rank token tails)."""
    eng = Engine(_args(tp_size=2, dp_size=2, ep_size=2,
                       enable_dp_attention=True),
                 hf_config_override=TINY_DSV3)
    try:
        from iaas_sglang_tpu.managers.io_struct import ExpertDistributionReq
        eng.scheduler.expert_capture_interval = 1
        r = eng.scheduler.handle_expert_distribution(
            ExpertDistributionReq(action="start"))
        assert r.success, "capture must start under DP attention"
        sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
        _gen(eng, PROMPTS[:4], sp)
        r = eng.scheduler.handle_expert_distribution(
            ExpertDistributionReq(action="stop"))
        assert r.success and r.counts is not None
        counts = np.asarray(r.counts)
        assert counts.sum() > 0, "no routed tokens recorded"
    finally:
        eng.shutdown()


def test_ngram_spec_under_dp_attention(baseline_qwen):
    """Speculative decoding composes with DP attention (r5, VERDICT #5):
    ngram draft + tree-verify runs per-rank inside the shard_map boundary
    and must match plain greedy token-for-token."""
    eng = Engine(_args(tp_size=2, dp_size=2, enable_dp_attention=True,
                       speculative_algorithm="ngram",
                       speculative_num_draft_tokens=3),
                 hf_config_override=TINY_QWEN)
    try:
        prompts = [[3, 4, 5] * 6, [7, 8] * 8, [1, 2, 3] * 7, [9] * 6,
                   [11, 12] * 7]
        sp = {"max_new_tokens": 10, "temperature": 0.0}
        assert _gen(eng, prompts, sp) == _gen(baseline_qwen, prompts, sp)
        assert eng.scheduler.spec_steps > 0, "spec path must engage"
        eng.scheduler.check_memory_leak()
    finally:
        eng.shutdown()


def test_eagle_spec_under_dp_attention(baseline_qwen):
    """EAGLE draft chains run replicated over the mesh; target verify is
    per-rank — greedy parity under dp-attention (reference
    eagle_worker.py:68 + dp_attention.py:61)."""
    eng = Engine(_args(tp_size=2, dp_size=2, enable_dp_attention=True,
                       speculative_algorithm="eagle",
                       speculative_num_draft_tokens=3),
                 hf_config_override=TINY_QWEN)
    try:
        prompts = [[7, 8, 9, 10] * 3, list(range(30, 45)), [5, 6] * 9,
                   [2] * 7]
        sp = {"max_new_tokens": 12, "temperature": 0.0}
        assert _gen(eng, prompts, sp) == _gen(baseline_qwen, prompts, sp)
        assert eng.scheduler.spec_steps > 0, "spec path must engage"
        eng.scheduler.check_memory_leak()
    finally:
        eng.shutdown()
