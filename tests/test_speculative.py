"""Speculative decoding (ngram draft + target verify): unit accept logic
and end-to-end greedy parity with plain decoding
(analog of the reference's EAGLE tests, srt/speculative/)."""

import numpy as np
import pytest

from iaas_sglang_tpu.speculative.ngram_worker import (
    accept_draft_tokens,
    draft_ngram,
)
from tests.test_scheduler import make_engine


def test_draft_ngram_finds_repeat():
    ids = [1, 2, 3, 4, 9, 9, 1, 2, 3]
    d = draft_ngram(ids, num_draft=3)
    # tail [1,2,3] occurred earlier, followed by [4, 9, 9]
    assert d == [4, 9, 9]


def test_draft_ngram_no_match():
    assert draft_ngram([1, 2, 3, 4, 5], num_draft=3, min_ngram=2) is None


def test_accept_full():
    out = accept_draft_tokens(
        [5, 6, 7], np.array([5, 6, 7, 8]),
        eos_token_ids=set(), stop_token_ids=[], ignore_eos=False)
    assert out == [5, 6, 7, 8]  # all accepted + bonus


def test_accept_partial():
    out = accept_draft_tokens(
        [5, 9, 7], np.array([5, 6, 7, 8]),
        eos_token_ids=set(), stop_token_ids=[], ignore_eos=False)
    assert out == [5, 6]  # accept 5, then target's 6 as bonus


def test_accept_stops_at_eos():
    out = accept_draft_tokens(
        [5, 2, 7], np.array([5, 2, 7, 8]),
        eos_token_ids={2}, stop_token_ids=[], ignore_eos=False)
    assert out == [5, 2]


def test_spec_matches_plain_greedy():
    """Spec decoding must emit exactly the plain greedy continuation."""
    eng_spec = make_engine(speculative_algorithm="ngram",
                           speculative_num_draft_tokens=4)
    eng_plain = make_engine()
    # a repetitive prompt gives the ngram draft traction
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
    ]
    sp = {"max_new_tokens": 16, "temperature": 0.0}
    outs_s = eng_spec.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_s, outs_p):
        assert a["output_ids"] == b["output_ids"]
    st = eng_spec.get_internal_state()
    assert st["spec_accept_length"] >= 1.0  # every verify emits >= 1
    eng_spec.scheduler.check_memory_leak()


def test_spec_with_stop_tokens():
    eng = make_engine(speculative_algorithm="ngram")
    ids = [3, 4, 5, 3, 4, 5, 3, 4]
    free = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0})
    stop_tok = free["output_ids"][2]
    out = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0,
        "stop_token_ids": [stop_tok]})
    assert out["output_ids"][-1] == stop_tok
    assert len(out["output_ids"]) == 3


def test_eagle_matches_plain_greedy():
    """EAGLE (dummy-weight draft) must emit exactly the plain greedy
    continuation — verification is exact regardless of draft quality."""
    eng_eagle = make_engine(speculative_algorithm="eagle",
                            speculative_num_draft_tokens=3)
    eng_plain = make_engine()
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
        list(range(100, 170)),   # > chunked_prefill_size: exercises carry
    ]
    sp = {"max_new_tokens": 14, "temperature": 0.0}
    outs_e = eng_eagle.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_e, outs_p):
        assert a["output_ids"] == b["output_ids"]
    st = eng_eagle.get_internal_state()
    assert st["spec_accept_length"] >= 1.0
    eng_eagle.scheduler.check_memory_leak()


def test_eagle_prefix_cache_reuse_parity():
    """Second pass over the same prompts hits the radix cache (draft primes
    only from the uncached suffix) — tokens must still match."""
    eng = make_engine(speculative_algorithm="eagle",
                      speculative_num_draft_tokens=3)
    prompts = [list(range(20, 40))]
    sp = {"max_new_tokens": 10, "temperature": 0.0}
    first = eng.generate(input_ids=prompts, sampling_params=sp)
    second = eng.generate(input_ids=prompts, sampling_params=sp)
    assert first[0]["output_ids"] == second[0]["output_ids"]


# ---------------------------------------------------------------- tree mode

def test_build_tree_draft_structure():
    from iaas_sglang_tpu.speculative.ngram_worker import build_tree_draft

    # S=2 steps, topk=2: spine tokens 5 then 6
    toks = np.array([[5, 9], [6, 11]])
    scores = np.array([[-0.1, -2.0], [-0.3, -0.9]])
    tree = build_tree_draft(toks, scores, K=3)
    # top-3 by score: (0,0)=5 s-0.1, (1,0)=6 s-0.3, (1,1)=11 s-0.9
    assert tree.tokens == [5, 6, 11]
    assert tree.depths == [1, 2, 2]
    assert tree.parent_rows == [0, 1, 1]
    # row bits: root=1; row1 root+self; rows2/3 root+row1+self
    assert tree.bits[0] == 0b0001
    assert tree.bits[1] == 0b0011
    assert tree.bits[2] == 0b0111
    assert tree.bits[3] == 0b1011


def test_accept_tree_walk():
    from iaas_sglang_tpu.speculative.ngram_worker import (
        TreeDraft,
        accept_tree_tokens,
    )

    bits = np.zeros(32, np.int32)
    tree = TreeDraft(tokens=[5, 6, 11], depths=[1, 2, 2],
                     bits=bits, parent_rows=[0, 1, 1])
    # target argmax: root->5 (match row1), row1->11 (match row3), row3->77
    out = np.array([5, 11, 99, 77])
    emitted, src_rows, node_rows = accept_tree_tokens(
        tree, out, eos_token_ids=set(), stop_token_ids=[], ignore_eos=False)
    assert emitted == [5, 11, 77]
    assert src_rows == [0, 1, 3]
    assert node_rows == [1, 3, -1]
    # divergence at root: bonus only
    out2 = np.array([42, 0, 0, 0])
    e2, s2, n2 = accept_tree_tokens(
        tree, out2, eos_token_ids=set(), stop_token_ids=[], ignore_eos=False)
    assert e2 == [42] and s2 == [0] and n2 == [-1]


def test_eagle_tree_matches_plain_greedy():
    """Tree-verify EAGLE (topk>1) must emit exactly the plain greedy
    continuation — tree acceptance walks target-argmax-matching edges."""
    eng_tree = make_engine(speculative_algorithm="eagle",
                           speculative_num_draft_tokens=4,
                           speculative_eagle_topk=2,
                           speculative_num_steps=3)
    eng_plain = make_engine()
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
        list(range(100, 170)),
    ]
    sp = {"max_new_tokens": 14, "temperature": 0.0}
    outs_t = eng_tree.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_t, outs_p):
        assert a["output_ids"] == b["output_ids"]
    st = eng_tree.get_internal_state()
    assert st["spec_accept_length"] >= 1.0
    eng_tree.scheduler.check_memory_leak()


def test_eagle_tree_with_stop_and_mixed_batch():
    eng = make_engine(speculative_algorithm="eagle",
                      speculative_num_draft_tokens=3,
                      speculative_eagle_topk=2)
    ids = [3, 4, 5, 3, 4, 5, 3, 4]
    free = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0})
    stop_tok = free["output_ids"][2]
    out = eng.generate(input_ids=ids, sampling_params={
        "max_new_tokens": 10, "temperature": 0.0,
        "stop_token_ids": [stop_tok]})
    assert out["output_ids"][-1] == stop_tok
    assert len(out["output_ids"]) == 3
    eng.scheduler.check_memory_leak()


def test_eagle_tree_offspine_acceptance_and_kv_moves():
    """Force acceptance through SIBLING (off-spine) tree nodes: the draft
    tree is rigged so the true greedy tokens sit off the spine. This
    exercises the tree attention mask (node 3 attends root+node2, skipping
    node 1) AND the KV slot canonicalization moves; any corruption breaks
    parity with plain greedy."""
    from iaas_sglang_tpu.speculative.ngram_worker import TreeDraft

    eng_plain = make_engine()
    prompt = list(range(50, 65))
    sp = {"max_new_tokens": 12, "temperature": 0.0}
    expected = eng_plain.generate(
        input_ids=prompt, sampling_params=sp)["output_ids"]

    eng = make_engine(speculative_algorithm="eagle",
                      speculative_num_draft_tokens=3,
                      speculative_eagle_topk=2)
    eagle = eng.scheduler.eagle
    orig = eagle.feed_pairs

    def rigged(items):
        orig(items)
        for (req, _, _) in items:
            n = len(req.output_ids)
            nxt = expected[n : n + 2]
            if len(nxt) < 2:
                continue
            bits = np.zeros(32, np.int32)
            bits[0] = 0b0001          # root
            bits[1] = 0b0011          # wrong spine node
            bits[2] = 0b0101          # true sibling (child of root)
            bits[3] = 0b1101          # true grandchild (child of row 2)
            st = eagle.state(req.rid)
            st.drafts = TreeDraft(
                tokens=[(nxt[0] + 1) % 256, nxt[0], nxt[1]],
                depths=[1, 1, 2], bits=bits, parent_rows=[0, 0, 2])

    eagle.feed_pairs = rigged
    out = eng.generate(input_ids=prompt, sampling_params=sp)
    assert out["output_ids"] == expected
    st = eng.get_internal_state()
    assert st["spec_accept_length"] > 1.5  # rigged tree accepts 3/step
    eng.scheduler.check_memory_leak()


# ------------------------------------------------------ DeepSeek NextN (MTP)

TINY_DSV3_SPEC = dict(
    architectures=["DeepseekV3ForCausalLM"], model_type="deepseek_v3",
    num_hidden_layers=3, hidden_size=64, num_attention_heads=4,
    num_key_value_heads=4, intermediate_size=96, vocab_size=256,
    rms_norm_eps=1e-6, rope_theta=10000.0, max_position_embeddings=512,
    tie_word_embeddings=False, q_lora_rank=None, kv_lora_rank=16,
    qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16,
    n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
    moe_intermediate_size=32, first_k_dense_replace=1,
    routed_scaling_factor=1.0, topk_method="noaux_tc",
    scoring_func="sigmoid", n_group=1, topk_group=1, norm_topk_prob=True,
    num_nextn_predict_layers=1,
)


def make_ds_engine(**kw):
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    defaults = dict(
        model_path="test://tiny-dsv3", load_format="dummy", dtype="float32",
        page_size=4, max_total_tokens=512, device="cpu",
        max_running_requests=8, max_prefill_tokens=128,
        chunked_prefill_size=32, skip_tokenizer_init=True, random_seed=0,
    )
    defaults.update(kw)
    sa = ServerArgs(**defaults)
    return Engine(sa, hf_config_override=TINY_DSV3_SPEC)


def test_nextn_matches_plain_greedy():
    """NextN MTP drafting on a DeepSeek-V3 (MLA+MoE) target: exact greedy
    parity with the plain decode path (dummy draft weights — verification
    exactness is what's under test)."""
    eng_spec = make_ds_engine(speculative_algorithm="nextn",
                              speculative_num_draft_tokens=3)
    eng_plain = make_ds_engine()
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
        list(range(100, 170)),   # > chunked_prefill_size: exercises carry
    ]
    sp = {"max_new_tokens": 12, "temperature": 0.0}
    outs_s = eng_spec.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_s, outs_p):
        assert a["output_ids"] == b["output_ids"]
    assert eng_spec.get_internal_state()["spec_accept_length"] >= 1.0
    eng_spec.scheduler.check_memory_leak()


def test_nextn_weight_specs_layout():
    """NextN weights resolve at layer index num_hidden_layers of the main
    checkpoint (reference deepseek_v2.py:2344), with enorm/hnorm/eh_proj/
    shared_head.norm under the layer prefix."""
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.models.deepseek_nextn import DeepseekNextNDraft

    cfg = ModelConfig.from_hf(TINY_DSV3_SPEC, model_path="test://tiny",
                              dtype="float32")
    cfg.nextn_layer_id = cfg.num_layers
    cfg.num_layers = 1
    draft = DeepseekNextNDraft(cfg)
    specs = draft.weight_specs()
    assert specs["enorm"].hf_key == "model.layers.3.enorm.weight"
    assert specs["eh_proj"].hf_key == "model.layers.3.eh_proj.weight"
    assert specs["final_norm"].hf_key == \
        "model.layers.3.shared_head.norm.weight"
    assert "embed" not in specs and "lm_head" not in specs
    # stacked layer weights address hf layer 3
    st = [sp for sp in specs.values() if sp.stacked]
    assert st and all(sp.layer_offset == 3 for sp in st)


def test_mimo_mtp_matches_plain_greedy():
    """MiMo MTP drafting (qwen2 body, flipped concat order, position-0
    token-embed masking): greedy parity with plain decode."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    hf = dict(architectures=["MiMoForCausalLM"], model_type="mimo",
              num_hidden_layers=2, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, intermediate_size=128, vocab_size=256,
              rms_norm_eps=1e-6, rope_theta=10000.0,
              max_position_embeddings=512, tie_word_embeddings=False,
              num_nextn_predict_layers=1)

    def mk(**kw):
        defaults = dict(
            model_path="dummy://mimo", load_format="dummy", dtype="float32",
            page_size=4, max_total_tokens=512, device="cpu",
            max_running_requests=8, max_prefill_tokens=128,
            chunked_prefill_size=32, skip_tokenizer_init=True,
            random_seed=0)
        defaults.update(kw)
        return Engine(ServerArgs(**defaults), hf_config_override=hf)

    eng_spec = mk(speculative_algorithm="eagle",
                  speculative_num_draft_tokens=3)
    eng_plain = mk()
    prompts = [[7, 8, 9, 10] * 3, list(range(30, 50))]
    sp = {"max_new_tokens": 10, "temperature": 0.0}
    outs_s = eng_spec.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_s, outs_p):
        assert a["output_ids"] == b["output_ids"]
    # draft plumbing sanity: MTP keys resolve under model.mtp_layers.0
    specs = eng_spec.scheduler.eagle.draft.weight_specs()
    assert specs["input_proj"].hf_key == \
        "model.mtp_layers.0.input_proj.weight"
    assert specs["final_norm"].hf_key == \
        "model.mtp_layers.0.final_layernorm.weight"
    eng_spec.shutdown()
    eng_plain.shutdown()


def test_qwen2_eagle_draft_bias_specs():
    """Qwen2-family EAGLE drafts carry qkv bias (models/qwen2_eagle.py)."""
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.models.llama_eagle import LlamaEagleDraft

    hf = dict(architectures=["Qwen2ForCausalLM"], model_type="qwen2",
              num_hidden_layers=1, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, intermediate_size=128, vocab_size=256)
    cfg = ModelConfig.from_hf(hf, model_path="t", dtype="float32")
    specs = LlamaEagleDraft(cfg).weight_specs()
    assert "bq" in specs and specs["bq"].optional


# ---------------------------------------------------------------- EAGLE3


def test_eagle3_matches_plain_greedy():
    """EAGLE3 (reference models/llama_eagle3.py): target taps the 3-layer
    aux feature concat, draft runs the cat[embeds_norm; hidden_norm] layer
    with its own head + d2t map (identity under dummy weights). Exact
    greedy parity regardless of draft quality."""
    eng_e3 = make_engine(speculative_algorithm="eagle3",
                         speculative_num_draft_tokens=3)
    eng_plain = make_engine()
    from iaas_sglang_tpu.models.llama_eagle3 import LlamaEagle3Draft

    assert isinstance(eng_e3.scheduler.eagle.draft, LlamaEagle3Draft)
    assert eng_e3.scheduler.model_runner.eagle3_aux_layers is not None
    prompts = [
        [7, 8, 9, 10, 7, 8, 9, 10, 7, 8],
        list(range(30, 45)),
        list(range(100, 170)),   # > chunked_prefill_size: exercises carry
    ]
    sp = {"max_new_tokens": 14, "temperature": 0.0}
    outs_e = eng_e3.generate(input_ids=prompts, sampling_params=sp)
    outs_p = eng_plain.generate(input_ids=prompts, sampling_params=sp)
    for a, b in zip(outs_e, outs_p):
        assert a["output_ids"] == b["output_ids"]
    st = eng_e3.get_internal_state()
    assert st["spec_accept_length"] >= 1.0
    eng_e3.scheduler.check_memory_leak()


def test_eagle3_draft_weight_specs_layout():
    """EAGLE3 checkpoint layout: midlayer.* keys, 2H-wide qkv input, 3*Ht
    fc, reduced-vocab head, integer d2t offsets."""
    from iaas_sglang_tpu.configs.model_config import ModelConfig
    from iaas_sglang_tpu.models.llama_eagle3 import LlamaEagle3Draft

    hf = dict(architectures=["LlamaForCausalLMEagle3"], model_type="llama",
              num_hidden_layers=1, hidden_size=64, num_attention_heads=4,
              num_key_value_heads=2, intermediate_size=128, vocab_size=256,
              draft_vocab_size=64, target_hidden_size=96,
              rms_norm_eps=1e-6, rope_theta=10000.0,
              max_position_embeddings=512, tie_word_embeddings=False)
    cfg = ModelConfig.from_hf(hf)
    d = LlamaEagle3Draft(cfg)
    s = d.weight_specs()
    assert s["wq"].shape == (128, 64)            # 2H -> NqD
    assert s["fc_w"].shape == (3 * 96, 64)       # 3*target_hidden -> H
    assert s["lm_head"].shape == (64, 64)        # H -> draft_vocab
    assert s["d2t"].shape == (64,) and s["d2t"].force_dtype == "int32"
    assert "midlayer.hidden_norm.weight" in s["hidden_norm"].hf_key

    # d2t mapping: target_id = i + d2t[i]
    import jax.numpy as jnp
    params = {"d2t": jnp.asarray([5, 0, 7], jnp.int32)}
    out = d.map_tokens(params, jnp.asarray([0, 1, 2], jnp.int32))
    assert out.tolist() == [5, 1, 9]
