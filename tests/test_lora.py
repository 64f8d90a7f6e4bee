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


def test_lora_gmm_delta_matches_onehot():
    """Grouped-matmul LoRA delta (ops/lora.py, megablox) vs the one-hot
    slot-mixing math, interpret mode."""
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from iaas_sglang_tpu.ops.lora import lora_gmm_delta

    rng = np.random.default_rng(3)
    T, Hin, Hout, r, S1 = 64, 128, 64, 8, 4
    x = jnp.asarray(rng.standard_normal((T, Hin)).astype(np.float32))
    A = jnp.asarray(rng.standard_normal((S1, Hin, r)).astype(np.float32) * .1)
    B = jnp.asarray(rng.standard_normal((S1, r, Hout)).astype(np.float32) * .1)
    # slot 0 = "no adapter": zero weights
    A = A.at[0].set(0.0)
    B = B.at[0].set(0.0)
    scaling = jnp.asarray([0.0, 2.0, 0.5, 1.0], jnp.float32)
    lora_ids = jnp.asarray(rng.integers(0, S1, T), jnp.int32)

    order = jnp.argsort(lora_ids)
    gs = jnp.bincount(lora_ids, length=S1)
    scale_sorted = scaling[lora_ids[order]]
    with pltpu.force_tpu_interpret_mode():
        got = lora_gmm_delta(x, A, B, order, gs, scale_sorted)

    onehot = jax.nn.one_hot(lora_ids, S1, dtype=jnp.float32) * scaling[None, :]
    xa = jnp.einsum("th,shr->tsr", x, A) * onehot[:, :, None]
    ref = jnp.einsum("tsr,sro->to", xa, B)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_lora_gmm_engine_parity():
    """Full engine with lora_backend=gmm must match the onehot backend
    token-for-token (interpret mode wraps compile+run)."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    eng1 = make_engine(enable_lora=True, max_lora_rank=4)
    eng2 = make_engine(enable_lora=True, max_lora_rank=4,
                       lora_backend="gmm")
    sd = _make_peft_state_dict(TINY_LLAMA, rank=4, seed=5)
    eng1.load_lora_adapter("adG", sd, rank=4, alpha=8.0)
    eng2.load_lora_adapter("adG", sd, rank=4, alpha=8.0)
    ids = list(range(30, 46))
    sp = {"max_new_tokens": 6, "temperature": 0.0}
    ref = eng1.generate(input_ids=ids, sampling_params=sp, lora_path="adG")
    with pltpu.force_tpu_interpret_mode():
        got = eng2.generate(input_ids=ids, sampling_params=sp,
                            lora_path="adG")
    assert got["output_ids"] == ref["output_ids"]
