"""GGUF checkpoint ingestion (model_loader/gguf.py — the analog of the
reference's GGUF load format, model_loader/loader.py:1224): container
round-trip, llama.cpp q/k row permutation, Q8_0 blocks, and engine-level
parity between a GGUF checkpoint and the same weights via safetensors."""

import numpy as np
import pytest

from iaas_sglang_tpu.model_loader import gguf as G
from tests.utils import TINY_LLAMA


def test_gguf_roundtrip_types(tmp_path):
    rng = np.random.default_rng(0)
    tensors = {
        "a.f32": rng.standard_normal((8, 16)).astype(np.float32),
        "b.f16": rng.standard_normal((4, 32)).astype(np.float32),
        "c.bf16": rng.standard_normal((2, 64)).astype(np.float32),
        "d.q8": rng.standard_normal((16, 64)).astype(np.float32),
    }
    path = str(tmp_path / "t.gguf")
    G.write_gguf(path, {"general.architecture": "llama", "n": 3,
                        "f": 0.5, "flag": True},
                 tensors, tensor_types={"b.f16": G.T_F16,
                                        "c.bf16": G.T_BF16,
                                        "d.q8": G.T_Q8_0})
    meta, got = G.read_gguf(path)
    assert meta["general.architecture"] == "llama"
    assert meta["n"] == 3 and meta["flag"] is True
    np.testing.assert_array_equal(got["a.f32"], tensors["a.f32"])
    np.testing.assert_allclose(got["b.f16"], tensors["b.f16"], atol=2e-3)
    np.testing.assert_allclose(got["c.bf16"], tensors["c.bf16"], atol=2e-2)
    # Q8_0: per-32-block scale quantization, ~1% relative error
    err = np.abs(got["d.q8"] - tensors["d.q8"]).max()
    assert err < 0.05
    assert got["d.q8"].shape == tensors["d.q8"].shape


def test_permute_inverse():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 64)).astype(np.float32)  # 4 heads x 8
    for n_head in (2, 4):
        p = G.permute_rows(w, n_head)
        assert not np.array_equal(p, w)
        np.testing.assert_array_equal(G.unpermute_rows(p, n_head), w)


def _tiny_hf_weights(seed=0):
    rng = np.random.default_rng(seed)
    c = TINY_LLAMA
    H, I, V = c["hidden_size"], c["intermediate_size"], c["vocab_size"]
    Nk = c["num_key_value_heads"]
    kv = H // c["num_attention_heads"] * Nk
    w = {}

    def mat(*shape):
        return (rng.standard_normal(shape) * 0.02).astype(np.float32)

    w["model.embed_tokens.weight"] = mat(V, H)
    w["model.norm.weight"] = np.ones(H, np.float32)
    w["lm_head.weight"] = mat(V, H)
    for l in range(c["num_hidden_layers"]):
        p = f"model.layers.{l}."
        w[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        w[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        w[p + "self_attn.q_proj.weight"] = mat(H, H)
        w[p + "self_attn.k_proj.weight"] = mat(kv, H)
        w[p + "self_attn.v_proj.weight"] = mat(kv, H)
        w[p + "self_attn.o_proj.weight"] = mat(H, H)
        w[p + "mlp.gate_proj.weight"] = mat(I, H)
        w[p + "mlp.up_proj.weight"] = mat(I, H)
        w[p + "mlp.down_proj.weight"] = mat(H, I)
    return w


_GGUF_NAME = {v: k for k, v in G._DIRECT.items()}
_GGUF_BLK = {v: k for k, v in G._BLK.items()}


def _to_gguf_tensors(hf):
    c = TINY_LLAMA
    out = {}
    for name, arr in hf.items():
        if name in _GGUF_NAME:
            out[_GGUF_NAME[name]] = arr
            continue
        parts = name.split(".")
        idx, rest = parts[2], ".".join(parts[3:])
        if rest == "self_attn.q_proj.weight":
            arr = G.permute_rows(arr, c["num_attention_heads"])
        elif rest == "self_attn.k_proj.weight":
            arr = G.permute_rows(arr, c["num_key_value_heads"])
        out[f"blk.{idx}.{_GGUF_BLK[rest]}"] = arr
    return out


def _make_engine(model_path, load_format):
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(model_path=model_path, load_format=load_format,
                    dtype="float32", page_size=4, max_total_tokens=512,
                    device="cpu", skip_tokenizer_init=True, random_seed=0)
    return Engine(sa, hf_config_override=TINY_LLAMA)


def test_gguf_engine_parity_vs_safetensors(tmp_path):
    """A GGUF checkpoint (with llama.cpp q/k permutation) must serve
    byte-identical tokens to the same weights via safetensors."""
    from safetensors.numpy import save_file

    hf = _tiny_hf_weights()
    st_dir = tmp_path / "st"
    st_dir.mkdir()
    save_file(hf, str(st_dir / "model.safetensors"))

    gg_dir = tmp_path / "gg"
    gg_dir.mkdir()
    G.write_gguf(str(gg_dir / "model.gguf"), {
        "general.architecture": "llama",
        "llama.attention.head_count": TINY_LLAMA["num_attention_heads"],
        "llama.attention.head_count_kv": TINY_LLAMA["num_key_value_heads"],
    }, _to_gguf_tensors(hf))

    sp = {"max_new_tokens": 8, "temperature": 0.0}
    ids = list(range(7, 25))
    out_st = _make_engine(str(st_dir), "auto").generate(
        input_ids=ids, sampling_params=sp)
    # explicit gguf format AND auto-detection of a gguf-only directory
    out_gg = _make_engine(str(gg_dir), "gguf").generate(
        input_ids=ids, sampling_params=sp)
    out_auto = _make_engine(str(gg_dir), "auto").generate(
        input_ids=ids, sampling_params=sp)
    assert out_gg["output_ids"] == out_st["output_ids"]
    assert out_auto["output_ids"] == out_st["output_ids"]


def test_remote_load_format_roundtrip(tmp_path):
    """save_remote_model -> load_format=remote reload parity
    (reference RemoteModelLoader, model_loader/loader.py:1329)."""
    from iaas_sglang_tpu.entrypoints.engine import Engine
    from iaas_sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(model_path="t://x", load_format="dummy",
                    dtype="float32", page_size=4, max_total_tokens=512,
                    device="cpu", skip_tokenizer_init=True, random_seed=0)
    eng = Engine(sa, hf_config_override=TINY_LLAMA)
    sp = {"max_new_tokens": 8, "temperature": 0.0}
    ids = list(range(30, 46))
    before = eng.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    url = f"file://{tmp_path}/store"
    ok, msg = eng.save_remote_model(url)
    assert ok, msg

    eng2 = _make_engine(url, "remote")
    after = eng2.generate(input_ids=ids, sampling_params=sp)["output_ids"]
    assert after == before
