"""Multi-LoRA serving: adapter math vs merged weights, no-LoRA parity,
and mixed-adapter batching (analog of the reference's srt/lora tests)."""

import numpy as np
import pytest

from tests.test_scheduler import make_engine
from tests.utils import TINY_LLAMA


def _make_peft_state_dict(cfg_dict, rank, seed):
    """PEFT-style adapter tensors for q_proj/v_proj on every layer."""
    rng = np.random.default_rng(seed)
    L = cfg_dict["num_hidden_layers"]
    H = cfg_dict["hidden_size"]
    heads = cfg_dict["num_attention_heads"]
    kvh = cfg_dict["num_key_value_heads"]
    D = H // heads
    sd = {}
    for l in range(L):
        for mod, out_dim in (("q_proj", heads * D), ("v_proj", kvh * D)):
            base = f"base_model.model.model.layers.{l}.self_attn.{mod}"
            sd[f"{base}.lora_A.weight"] = (
                rng.standard_normal((rank, H)).astype(np.float32) * 0.1)
            sd[f"{base}.lora_B.weight"] = (
                rng.standard_normal((out_dim, rank)).astype(np.float32) * 0.1)
    return sd


@pytest.fixture(scope="module")
def lora_engine():
    return make_engine(enable_lora=True, max_lora_rank=4)


def test_no_lora_parity(lora_engine):
    """enable_lora with no adapter selected must match the plain engine."""
    plain = make_engine()
    ids = list(range(10, 25))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    a = lora_engine.generate(input_ids=ids, sampling_params=sp)
    b = plain.generate(input_ids=ids, sampling_params=sp)
    assert a["output_ids"] == b["output_ids"]


def test_lora_changes_output_and_matches_merged(lora_engine):
    sd = _make_peft_state_dict(TINY_LLAMA, rank=4, seed=1)
    lora_engine.load_lora_adapter("adA", sd, rank=4, alpha=8.0)
    ids = list(range(30, 46))
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    base = lora_engine.generate(input_ids=ids, sampling_params=sp)
    with_lora = lora_engine.generate(input_ids=ids, sampling_params=sp,
                                     lora_path="adA")
    assert with_lora["output_ids"] != base["output_ids"]

    # merged-weight reference: W' = W + (alpha/r) * (A^T B^T)
    merged = make_engine()
    runner = merged.scheduler.model_runner
    import jax.numpy as jnp

    scaling = 8.0 / 4
    L = TINY_LLAMA["num_hidden_layers"]
    for t, mod in (("wq", "q_proj"), ("wv", "v_proj")):
        W = np.array(runner.params["layers"][t], dtype=np.float32)
        for l in range(L):
            A = sd[f"base_model.model.model.layers.{l}.self_attn.{mod}.lora_A.weight"]
            B = sd[f"base_model.model.model.layers.{l}.self_attn.{mod}.lora_B.weight"]
            W[l] += scaling * (A.T @ B.T)
        import jax

        runner.params["layers"][t] = jax.device_put(
            W.astype(np.float32), runner.mesh_ctx.sharding(None, None, "tp"))
    ref = merged.generate(input_ids=ids, sampling_params=sp)
    assert with_lora["output_ids"] == ref["output_ids"]


def test_mixed_adapter_batch(lora_engine):
    """Requests with different adapters (and none) in one batch."""
    sd_b = _make_peft_state_dict(TINY_LLAMA, rank=4, seed=2)
    lora_engine.load_lora_adapter("adB", sd_b, rank=4, alpha=4.0)
    ids = [list(range(50, 62)), list(range(50, 62)), list(range(50, 62))]
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    # run the three variants individually
    o_none = lora_engine.generate(input_ids=ids[0], sampling_params=sp)
    o_a = lora_engine.generate(input_ids=ids[1], sampling_params=sp,
                               lora_path="adA")
    o_b = lora_engine.generate(input_ids=ids[2], sampling_params=sp,
                               lora_path="adB")
    assert len({tuple(o_none["output_ids"]), tuple(o_a["output_ids"]),
                tuple(o_b["output_ids"])}) >= 2
