"""Weight loading: HF safetensors checkpoints / in-memory torch state dicts /
dummy random init (analog of sglang srt/model_loader/loader.py:169
DefaultModelLoader and :520 DummyModelLoader — dummy is the perf-testing
path that needs no checkpoint).

The loader materializes each model weight as a host numpy array (stacking
per-layer tensors into [L, ...] for the scan), then `jax.device_put`s it
with its NamedSharding so the transfer itself performs the TP partition.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import re
from typing import Any, Dict

import ml_dtypes
import numpy as np
import jax
import jax.numpy as jnp

from iaas_sglang_tpu.configs.model_config import ModelConfig
from iaas_sglang_tpu.models.llama_family import WeightSpec
from iaas_sglang_tpu.parallel.mesh import MeshContext
from iaas_sglang_tpu.utils import logger


def _np_dtype(dtype_str: str):
    return {"bfloat16": ml_dtypes.bfloat16, "float32": np.float32}[dtype_str]


def _torch_to_numpy(t) -> np.ndarray:
    import torch

    if t.dtype == torch.bfloat16:
        return t.view(torch.uint16).numpy().view(ml_dtypes.bfloat16)
    if t.dtype == getattr(torch, "float8_e4m3fn", None):
        return t.view(torch.uint8).numpy().view(ml_dtypes.float8_e4m3fn)
    return t.numpy()


import dataclasses


@dataclasses.dataclass
class HostQuant:
    """A pre-quantized (AWQ-style) host weight: packed nibbles + tables."""
    packed: np.ndarray       # int8 [(L,) K/2, N]
    scale: np.ndarray        # f32  [(L,) K/G, N]
    zero_scale: np.ndarray   # f32  [(L,) K/G, N]


@dataclasses.dataclass
class HostBlockFP8:
    """A blockwise-FP8 checkpoint weight (DeepSeek-V3 format: fp8 tensor +
    128x128 `weight_scale_inv` dequant scales, reference
    layers/quantization/fp8.py:1151)."""
    q: np.ndarray            # fp8_e4m3 [(L,) K, N]
    scale: np.ndarray        # f32 [(L,) ceil(K/128), ceil(N/128)]


def _set_nested(tree: Dict[str, Any], path: str, value) -> None:
    parts = path.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def shardings_for_specs(specs: Dict[str, WeightSpec], mesh_ctx: MeshContext):
    """Pytree of NamedShardings matching the params pytree structure."""
    tree: Dict[str, Any] = {}
    for name, spec in specs.items():
        dims = spec.pspec
        if spec.stacked:
            dims = (None,) + tuple(dims)
        _set_nested(tree, name, mesh_ctx.sharding(*dims))
    return tree


def load_params(
    model,
    config: ModelConfig,
    mesh_ctx: MeshContext,
    *,
    load_format: str = "auto",
    quantization: str | None = None,
    seed: int = 0,
) -> Dict[str, Any]:
    specs = model.weight_specs()
    if load_format == "dummy":
        return _dummy_device_params(
            specs, config, mesh_ctx, quantization, seed)
    if load_format == "dummy_host":
        # legacy host-side generator (streams weights through the relay;
        # kept for A/B against the on-device path)
        host = _dummy_host_params(specs, config, seed)
    elif load_format == "sharded_state":
        return _load_sharded_state(model, config, mesh_ctx)
    elif load_format == "remote":
        return _load_remote(model, config, mesh_ctx)
    elif load_format == "gguf":
        host = _load_host_params_gguf(specs, config)
    elif load_format == "bitsandbytes":
        raise NotImplementedError(
            "load_format=bitsandbytes needs the bitsandbytes package "
            "(absent in this image); export the checkpoint to safetensors "
            "or use --quantization int4 on a bf16 checkpoint instead")
    else:
        # "auto"/"safetensors"; a directory holding only *.gguf files
        # routes to the gguf reader (reference loader.py:1224 GGUF path)
        if not glob.glob(os.path.join(config.model_path, "*.safetensors")) \
                and (config.model_path.endswith(".gguf")
                     or glob.glob(os.path.join(config.model_path, "*.gguf"))):
            host = _load_host_params_gguf(specs, config)
        else:
            host = _load_host_params_safetensors(specs, config)
    return put_params(host, specs, mesh_ctx, quantization=quantization)


def _load_sharded_state(model, config: ModelConfig,
                        mesh_ctx: MeshContext) -> Dict[str, Any]:
    """Reload flat shards written by ModelRunner.save_sharded_model —
    already in OUR param layout (incl. '<name>::q'/'::scale' quantized
    entries), so no HF-key repacking happens (the reference's
    ShardedStateLoader, model_loader/loader.py:748)."""
    from safetensors.numpy import load_file

    files = sorted(glob.glob(
        os.path.join(config.model_path, "shard-*.safetensors")))
    if not files:
        raise FileNotFoundError(
            f"no shard-*.safetensors under {config.model_path}")
    tensors: Dict[str, np.ndarray] = {}
    for f in files:
        tensors.update(load_file(f))
    return _tree_from_flat_tensors(model, config, mesh_ctx, tensors)


def _load_remote(model, config: ModelConfig,
                 mesh_ctx: MeshContext) -> Dict[str, Any]:
    """load_format=remote: stream tensors from a connector URL
    (file:// / redis:// / s3://, reference RemoteModelLoader,
    model_loader/loader.py:1329). Tensors are in OUR flat param layout —
    the save_remote_model round-trip partner."""
    from iaas_sglang_tpu.connector import create_remote_connector

    conn = create_remote_connector(config.model_path)
    tensors = {name: arr for name, arr in conn.weight_iterator()}
    if not tensors:
        raise FileNotFoundError(
            f"connector {config.model_path!r} holds no weights")
    return _tree_from_flat_tensors(model, config, mesh_ctx, tensors)


def _tree_from_flat_tensors(model, config: ModelConfig,
                            mesh_ctx: MeshContext,
                            tensors: Dict[str, np.ndarray]) -> Dict[str, Any]:
    from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

    specs = model.weight_specs()
    tree: Dict[str, Any] = {}
    for name, spec in specs.items():
        dims = ((None,) + tuple(spec.pspec)) if spec.stacked \
            else tuple(spec.pspec)
        sharding = mesh_ctx.sharding(*dims)
        if name in tensors:
            _set_nested(tree, name, jax.device_put(tensors[name], sharding))
            continue
        if f"{name}::q" in tensors:
            q = tensors[f"{name}::q"]
            s = tensors[f"{name}::scale"]
            zs = tensors.get(f"{name}::zero_scale")
            s_dims = tuple(None if s.shape[i] == 1 else d
                           for i, d in enumerate(dims))
            packed = q.shape[-2] * 2 == spec.shape[0]
            _set_nested(tree, name, QuantizedWeight(
                q=jax.device_put(q, sharding),
                scale=jax.device_put(s, mesh_ctx.sharding(*s_dims)),
                zero_scale=(jax.device_put(zs, mesh_ctx.sharding(*s_dims))
                            if zs is not None else None),
                packed=packed))
            continue
        if spec.optional:
            n_stack = (len(spec.layer_map) if spec.layer_map is not None
                       else spec.num_stack or config.num_layers)
            shape = ((n_stack,) + tuple(spec.shape)) if spec.stacked \
                else tuple(spec.shape)
            fill = (np.ones if "norm" in name else np.zeros)(
                shape, dtype=_np_dtype(config.dtype))
            _set_nested(tree, name, jax.device_put(fill, sharding))
            continue
        raise KeyError(f"sharded state missing tensor {name!r}")
    return tree


def _quantize_host(arr: np.ndarray, spec: WeightSpec, method: str):
    """Quantize a (possibly layer-stacked) weight on host -> (q, scale)."""
    from iaas_sglang_tpu.quantization.qlinear import quantize_weight

    if spec.stacked:
        qs, ss = [], []
        for l in range(arr.shape[0]):
            q, s, dt = quantize_weight(np.asarray(arr[l], dtype=np.float32), method)
            qs.append(q)
            ss.append(s)
        return np.stack(qs), np.stack(ss), dt
    q, s, dt = quantize_weight(np.asarray(arr, dtype=np.float32), method)
    return q, s, dt


def put_params(host: Dict[str, np.ndarray], specs: Dict[str, WeightSpec],
               mesh_ctx: MeshContext,
               quantization: str | None = None) -> Dict[str, Any]:
    from iaas_sglang_tpu.quantization.qlinear import QuantizedWeight

    tree: Dict[str, Any] = {}
    for name, spec in specs.items():
        dims = spec.pspec
        if spec.stacked:
            dims = (None,) + tuple(dims)
        sharding = mesh_ctx.sharding(*dims)
        if isinstance(host.get(name), HostQuant):
            # pre-quantized checkpoint (AWQ): already packed + tabled
            hq = host[name]
            _set_nested(tree, name, QuantizedWeight(
                q=jax.device_put(hq.packed, sharding),
                scale=jax.device_put(hq.scale, sharding),
                zero_scale=jax.device_put(hq.zero_scale, sharding),
                packed=True))
            continue
        if isinstance(host.get(name), HostBlockFP8):
            # DeepSeek-V3-style blockwise FP8 checkpoint: fp8 weight +
            # 128x128 weight_scale_inv blocks (tiny — keep replicated)
            hq = host[name]
            _set_nested(tree, name, QuantizedWeight(
                q=jax.device_put(hq.q, sharding),
                scale=jax.device_put(hq.scale, mesh_ctx.replicated),
                block=True))
            continue
        if quantization and spec.quantizable:
            q_np, s_np, target_dtype = _quantize_host(host[name], spec, quantization)
            # int4 note: this jax version cannot pass native jnp.int4 arrays
            # into jit (infinite reshard recursion, CPU and TPU alike), so
            # int4 ships nibble-PACKED in an int8 container ([in/2, out]) —
            # HBM reads are true 4-bit; ops/quant_matmul.py dequantizes.
            q_dev = jax.device_put(q_np, sharding)
            # scale shards like the weight, except size-1 dims stay unsharded
            # (fp8 per-channel scale is [1, out])
            s_dims = tuple(
                None if s_np.shape[i] == 1 else d
                for i, d in enumerate(dims)
            )
            block = quantization.startswith("fp8_block")
            s_dev = jax.device_put(
                s_np, mesh_ctx.replicated if block
                else mesh_ctx.sharding(*s_dims))
            packed = quantization.startswith("int4")
            _set_nested(tree, name,
                        QuantizedWeight(q=q_dev, scale=s_dev, packed=packed,
                                        block=block,
                                        act_quant=quantization == "w8a8_int8"))
        else:
            arr = jax.device_put(host[name], sharding)
            _set_nested(tree, name, arr)
    return tree


def _dummy_device_params(specs: Dict[str, WeightSpec], config: ModelConfig,
                         mesh_ctx: MeshContext, quantization: str | None,
                         seed: int) -> Dict[str, Any]:
    """Dummy weights generated ON DEVICE (jit'd counter-based PRNG +
    on-device quantization): no host->device weight stream at all. Through
    the remote relay the old host path took ~15 min for an 8B model; this
    path is a few compiled programs. Values are key-deterministic and
    sharding-invariant (threefry), so multihost processes and differently
    meshed runs generate identical weights; quantized tensors are the
    on-device quantization of the SAME normal draw the bf16 path yields,
    preserving quant-fidelity (INT4 vs BF16 greedy-agreement) semantics."""
    import zlib

    from iaas_sglang_tpu.quantization.qlinear import (
        QuantizedWeight,
        quantize_weight_jnp,
    )

    dt = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    tree: Dict[str, Any] = {}
    for name, spec in specs.items():
        n_stack = (len(spec.layer_map) if spec.layer_map is not None
                   else spec.num_stack or config.num_layers)
        stacked_shape = ((n_stack,) + tuple(spec.shape)) if spec.stacked \
            else tuple(spec.shape)
        dims = spec.pspec
        if spec.stacked:
            dims = (None,) + tuple(dims)
        sharding = mesh_ctx.sharding(*dims)
        key = jax.random.key(
            (seed ^ zlib.crc32(name.encode())) & 0x7FFFFFFF)
        if spec.force_dtype is not None:
            fdt = jnp.dtype(spec.force_dtype)
            arr = jax.jit(lambda sh=stacked_shape, d=fdt: jnp.zeros(sh, d),
                          out_shardings=sharding)()
            _set_nested(tree, name, arr)
            continue
        if "norm" in name:
            arr = jax.jit(lambda sh=stacked_shape, d=dt: jnp.ones(sh, d),
                          out_shardings=sharding)()
            _set_nested(tree, name, arr)
            continue
        # normal draw, sliced over leading (layer/expert) dims so the f32
        # transient stays one [in, out] slice; the quantized path draws
        # the SAME values as the bf16 path and quantizes the dt-rounded
        # weights (matching the host generator's semantics)
        lead = stacked_shape[:-2] if len(stacked_shape) > 2 else ()
        slice_shape = stacked_shape[len(lead):]

        def draw_one(kk, sh=slice_shape, d=dt):
            w = jax.random.normal(kk, sh, jnp.float32) * 0.02
            return w.astype(d)

        def mapped(one_fn, k, n_out=1):
            if not lead:
                return one_fn(k)
            keys = jax.random.split(k, int(np.prod(lead)))
            out = jax.lax.map(one_fn, keys)
            reshape = lambda a: a.reshape(lead + a.shape[1:])
            return (jax.tree.map(reshape, out) if n_out > 1
                    else reshape(out))

        # the key is a jit ARGUMENT, never a closed-over constant: a
        # constant key lets the (remote) compiler constant-fold the whole
        # threefry draw at compile time — measured 180 s in the compiler
        # for the [128k, 4096] embedding
        if quantization and spec.quantizable:
            qz = functools.partial(quantize_weight_jnp, method=quantization)

            def gen_q(k):
                return mapped(
                    lambda kk: qz(draw_one(kk).astype(jnp.float32)),
                    k, n_out=2)

            block = quantization.startswith("fp8_block")
            # scale shards like the weight except size-1/block dims
            q_abs = jax.eval_shape(gen_q, key)
            s_dims = tuple(
                None if q_abs[1].shape[i] == 1 else d
                for i, d in enumerate(dims)
            )
            s_sharding = (mesh_ctx.replicated if block
                          else mesh_ctx.sharding(*s_dims))
            q_dev, s_dev = jax.jit(
                gen_q, out_shardings=(sharding, s_sharding))(key)
            _set_nested(tree, name, QuantizedWeight(
                q=q_dev, scale=s_dev,
                packed=quantization.startswith("int4"), block=block,
                act_quant=quantization == "w8a8_int8"))
            continue
        arr = jax.jit(lambda k: mapped(draw_one, k),
                      out_shardings=sharding)(key)
        _set_nested(tree, name, arr)
    return tree


def dummy_host_params_device_gen(specs: Dict[str, WeightSpec],
                                 config: ModelConfig,
                                 seed: int) -> Dict[str, np.ndarray]:
    """Flat numpy dummy params drawn by the ON-DEVICE generator, so a
    consumer that slices/places its own shards (the PP runner's per-stage
    split) sees the SAME values as ModelRunner's dummy load — PP-vs-
    single-runner greedy parity depends on it."""
    from iaas_sglang_tpu.parallel.mesh import make_mesh

    tree = _dummy_device_params(specs, config, make_mesh(1, 1), None, seed)

    def get(name):
        cur = tree
        for part in name.split("."):
            cur = cur[part]
        return cur

    return {name: np.asarray(get(name)) for name in specs}


def _dummy_host_params(specs: Dict[str, WeightSpec], config: ModelConfig,
                       seed: int) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng(seed)
    dt = _np_dtype(config.dtype)
    out = {}
    for name, spec in specs.items():
        n_stack = (len(spec.layer_map) if spec.layer_map is not None
                   else spec.num_stack or config.num_layers)
        shape = ((n_stack,) + tuple(spec.shape)) if spec.stacked \
            else tuple(spec.shape)
        if spec.force_dtype is not None:
            out[name] = np.zeros(shape, dtype=np.dtype(spec.force_dtype))
        elif "norm" in name:
            out[name] = np.ones(shape, dtype=dt)
        else:
            # NOTE: scale BEFORE casting — `astype(bf16) * 0.02` silently
            # promotes back to float32 (numpy scalar promotion), which
            # doubles weight HBM and cost a long OOM hunt.
            out[name] = (
                rng.standard_normal(shape, dtype=np.float32) * 0.02
            ).astype(dt)
    return out


def load_params_from_state_dict(
    model, config: ModelConfig, mesh_ctx: MeshContext, state_dict: Dict[str, Any]
) -> Dict[str, Any]:
    """Load from an in-memory torch state dict (used by the golden tests to
    share weights with a HF reference model)."""
    specs = model.weight_specs()
    getter = lambda key: _torch_to_numpy(state_dict[key].detach().cpu())
    host = _assemble(specs, config, getter)
    return put_params(host, specs, mesh_ctx)


def _load_host_params_safetensors(
    specs: Dict[str, WeightSpec], config: ModelConfig
) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(config.model_path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no *.safetensors under {config.model_path}")
    key_to_file: Dict[str, str] = {}
    handles: Dict[str, Any] = {}
    for fpath in files:
        h = safe_open(fpath, framework="pt")
        handles[fpath] = h
        for k in h.keys():
            key_to_file[k] = fpath

    def getter(key: str) -> np.ndarray:
        if key not in key_to_file:
            raise KeyError(f"checkpoint missing tensor {key!r}")
        return _torch_to_numpy(handles[key_to_file[key]].get_tensor(key))

    try:
        return _assemble(specs, config, getter)
    finally:
        del handles


def _load_host_params_gguf(
    specs: Dict[str, WeightSpec], config: ModelConfig
) -> Dict[str, np.ndarray]:
    """GGUF checkpoint -> HF-keyed tensors -> normal spec assembly
    (F32/F16/BF16/Q8_0 encodings; model_loader/gguf.py)."""
    from iaas_sglang_tpu.model_loader.gguf import gguf_to_hf_tensors, read_gguf

    if config.model_path.endswith(".gguf"):
        files = [config.model_path]
    else:
        files = sorted(glob.glob(os.path.join(config.model_path, "*.gguf")))
    if not files:
        raise FileNotFoundError(f"no *.gguf under {config.model_path}")
    hf_tensors: Dict[str, np.ndarray] = {}
    for f in files:
        meta, tensors = read_gguf(f)
        hf_tensors.update(gguf_to_hf_tensors(
            meta, tensors,
            num_heads=config.hf_config.get("num_attention_heads"),
            num_kv_heads=config.hf_config.get("num_key_value_heads")))
    if "lm_head.weight" not in hf_tensors \
            and "model.embed_tokens.weight" in hf_tensors:
        # tied embeddings: llama.cpp omits output.weight
        hf_tensors["lm_head.weight"] = hf_tensors["model.embed_tokens.weight"]

    def getter(key: str) -> np.ndarray:
        if key not in hf_tensors:
            raise KeyError(f"gguf checkpoint missing tensor {key!r}")
        return hf_tensors[key]

    return _assemble(specs, config, getter)


def _assemble_quant_one(getter, prefix: str, K: int, N: int, method: str):
    from iaas_sglang_tpu.quantization.awq import ingest_awq, ingest_gptq

    qw = getter(prefix + ".qweight")
    qz = getter(prefix + ".qzeros")
    sc = getter(prefix + ".scales")
    if method == "awq":
        if qw.shape != (K, N // 8):
            raise ValueError(
                f"{prefix}.qweight: got {qw.shape}, want {(K, N // 8)}")
        return ingest_awq(qw, qz, sc.astype(np.float32))
    if qw.shape != (K // 8, N):
        raise ValueError(
            f"{prefix}.qweight: got {qw.shape}, want {(K // 8, N)}")
    g_idx = None
    try:
        g_idx = getter(prefix + ".g_idx")
    except KeyError:
        pass
    return ingest_gptq(qw, qz, sc.astype(np.float32), g_idx)


def _assemble(specs: Dict[str, WeightSpec], config: ModelConfig,
              raw_getter) -> Dict[str, np.ndarray]:
    dt = _np_dtype(config.dtype)   # per-spec force_dtype shadows this below
    out: Dict[str, np.ndarray] = {}

    def _maybe_t(t: np.ndarray, spec) -> np.ndarray:
        if spec.hf_pre is not None:
            # fused-source weights (phi3 qkv_proj, gpt2 c_attn, glm
            # gate_up_proj): slice this spec's piece out of the fetched
            # tensor before the layout transpose
            t = spec.hf_pre(t)
        if not spec.transpose:
            return t
        if t.ndim > 2:
            # conv kernels ([O, C, kh, kw] etc.): flatten trailing dims in
            # torch row-major order (matches host-side patch flattening)
            t = t.reshape(t.shape[0], -1)
        return t.T

    def _default_init(spec, name: str) -> np.ndarray:
        # optional weights absent from the checkpoint (OLMo's
        # non-parametric LayerNorm): identity for norms, zero otherwise
        if spec.force_dtype is not None:
            return np.zeros(spec.shape, dtype=np.dtype(spec.force_dtype))
        if "norm" in name:
            return np.ones(spec.shape, dtype=dt)
        return np.zeros(spec.shape, dtype=dt)

    def getter(key: str) -> np.ndarray:
        # '|'-separated alternates: transformers renamed VLM tower prefixes
        # across versions (e.g. 'model.vision_tower.' vs 'vision_tower.')
        cands = key.split("|")
        for cand in cands:
            try:
                t = raw_getter(cand)
            except KeyError:
                continue
            if (t.dtype == ml_dtypes.float8_e4m3fn
                    and key.endswith(".weight")
                    and config.ckpt_quant_method == "fp8_block"):
                # fp8 tensor reached a spec that keeps full precision
                # (expert stacks, shared experts): dequantize with its
                # weight_scale_inv blocks at load
                s = raw_getter(cand[: -len(".weight")]
                               + ".weight_scale_inv").astype(np.float32)
                R, C = t.shape
                se = np.repeat(np.repeat(s, 128, 0)[:R], 128, 1)[:, :C]
                return t.astype(np.float32) * se
            return t
        raise KeyError(f"checkpoint missing tensor (tried {cands})")

    for name, spec in specs.items():
        if spec.hf_key is None:
            continue
        dt = (np.dtype(spec.force_dtype) if spec.force_dtype is not None
              else _np_dtype(config.dtype))
        if (config.ckpt_quant_method in ("awq", "gptq") and spec.quantizable
                and spec.hf_pre is not None):
            raise NotImplementedError(
                "AWQ/GPTQ checkpoints with fused-source projections "
                "(phi3/glm/gpt2) are not supported yet")
        if (config.ckpt_quant_method == "fp8_block" and spec.quantizable
                and spec.hf_key.endswith(".weight")):
            # DeepSeek-V3 blockwise FP8 checkpoint: fp8 `weight` [out,in]
            # + f32 `weight_scale_inv` [ceil(out/128), ceil(in/128)]
            # (reference fp8.py:1151 / fp8_kernel.py); transpose both into
            # our [in, out] convention — dequant w = q * scale[block]
            prefix_t = spec.hf_key[: -len(".weight")]

            def _one_fp8(hf_l_prefix):
                # raw_getter: bypass the dequantizing getter wrapper —
                # this path keeps the fp8 bytes + block scales as-is
                qw = raw_getter(hf_l_prefix + ".weight")
                sc = raw_getter(hf_l_prefix + ".weight_scale_inv")
                if not spec.transpose:
                    raise NotImplementedError(
                        "fp8_block ingestion expects transposed (torch "
                        f"[out,in]) projections; spec {name} is not")
                return (np.ascontiguousarray(qw.T),
                        np.ascontiguousarray(sc.T.astype(np.float32)))

            if spec.stacked:
                n_stack = (len(spec.layer_map) if spec.layer_map is not None
                           else spec.num_stack or config.num_layers)
                qs, ss = [], []
                for l in range(n_stack):
                    hf_l = (spec.layer_map[l] if spec.layer_map is not None
                            else l + spec.layer_offset)
                    if spec.num_experts:
                        eq, es = [], []
                        for e in range(spec.num_experts):
                            q_, s_ = _one_fp8(
                                prefix_t.format(l=hf_l, e=e))
                            eq.append(q_)
                            es.append(s_)
                        qs.append(np.stack(eq))
                        ss.append(np.stack(es))
                    else:
                        q_, s_ = _one_fp8(prefix_t.format(l=hf_l))
                        qs.append(q_)
                        ss.append(s_)
                out[name] = HostBlockFP8(np.stack(qs), np.stack(ss))
            else:
                out[name] = HostBlockFP8(*_one_fp8(prefix_t))
            continue
        if (config.ckpt_quant_method in ("awq", "gptq") and spec.quantizable
                and spec.hf_key.endswith(".weight")):
            prefix_t = spec.hf_key[: -len(".weight")]
            K, N = spec.shape
            if spec.stacked:
                n_stack = (len(spec.layer_map) if spec.layer_map is not None
                           else spec.num_stack or config.num_layers)
                ps, ss, zs = [], [], []
                for l in range(n_stack):
                    hf_l = (spec.layer_map[l] if spec.layer_map is not None
                            else l + spec.layer_offset)
                    p_, s_, z_ = _assemble_quant_one(
                        getter, prefix_t.format(l=hf_l),
                        K, N, config.ckpt_quant_method)
                    ps.append(p_)
                    ss.append(s_)
                    zs.append(z_)
                out[name] = HostQuant(np.stack(ps), np.stack(ss), np.stack(zs))
            else:
                out[name] = HostQuant(*_assemble_quant_one(
                    getter, prefix_t, K, N, config.ckpt_quant_method))
            continue
        if spec.stacked:
            n_stack = (len(spec.layer_map) if spec.layer_map is not None
                       else spec.num_stack or config.num_layers)
            stacked = np.empty((n_stack,) + tuple(spec.shape), dtype=dt)
            for l in range(n_stack):
                hf_l = (spec.layer_map[l] if spec.layer_map is not None
                        else l + spec.layer_offset)
                if spec.num_experts:
                    for e in range(spec.num_experts):
                        t = _maybe_t(getter(spec.hf_key.format(l=hf_l, e=e)), spec)
                        stacked[l, e] = t.astype(dt, copy=False)
                    continue
                try:
                    t = _maybe_t(getter(spec.hf_key.format(l=hf_l)), spec)
                except KeyError:
                    if not spec.optional:
                        raise
                    t = _default_init(spec, name)
                if tuple(t.shape) != tuple(spec.shape):
                    raise ValueError(
                        f"{name} layer {l}: got {t.shape}, want {spec.shape}")
                stacked[l] = t.astype(dt, copy=False)
            out[name] = stacked
        else:
            try:
                t = _maybe_t(getter(spec.hf_key), spec)
            except KeyError:
                if not spec.optional:
                    raise
                t = _default_init(spec, name)
            if tuple(t.shape) != tuple(spec.shape):
                raise ValueError(f"{name}: got {t.shape}, want {spec.shape}")
            out[name] = np.ascontiguousarray(t).astype(dt, copy=False)
    logger.info("loaded %d weights", len(out))
    return out
