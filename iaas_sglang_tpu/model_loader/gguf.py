"""Minimal GGUF checkpoint ingestion (analog of the reference's GGUF
load format, model_loader/loader.py:1224 — the reference delegates to
the `gguf` package; this environment has none, so the container format
is parsed directly).

Supported tensor encodings: F32 (0), F16 (1), Q8_0 (8, 32-element blocks
of f16 scale + int8), BF16 (30). Tensor names follow the llama.cpp
convention (`blk.N.attn_q.weight`, `token_embd.weight`, ...) and are
mapped back to HF llama-family keys; attn_q/attn_k rows are un-permuted
(inverse of llama.cpp convert_hf_to_gguf `permute`, which reorders rows
for ggml's rope layout).

`write_gguf` emits the same subset of the format (used by the loader
tests and as a lightweight export path).
"""

from __future__ import annotations

import struct
from typing import Dict, Optional, Tuple

import ml_dtypes
import numpy as np

GGUF_MAGIC = 0x46554747  # "GGUF" little-endian
GGUF_VERSION = 3
ALIGNMENT = 32

# ggml tensor types we handle
T_F32, T_F16, T_Q8_0, T_BF16 = 0, 1, 8, 30

# metadata value types
_V_U8, _V_I8, _V_U16, _V_I16, _V_U32, _V_I32, _V_F32, _V_BOOL = range(8)
_V_STR, _V_ARR, _V_U64, _V_I64, _V_F64 = 8, 9, 10, 11, 12

_SCALAR_FMT = {_V_U8: "<B", _V_I8: "<b", _V_U16: "<H", _V_I16: "<h",
               _V_U32: "<I", _V_I32: "<i", _V_F32: "<f", _V_BOOL: "<B",
               _V_U64: "<Q", _V_I64: "<q", _V_F64: "<d"}


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, fmt: str):
        vals = struct.unpack_from(fmt, self.data, self.pos)
        self.pos += struct.calcsize(fmt)
        return vals[0] if len(vals) == 1 else vals

    def read_str(self) -> str:
        n = self.read("<Q")
        s = self.data[self.pos:self.pos + n].decode("utf-8")
        self.pos += n
        return s

    def read_value(self, vtype: int):
        if vtype in _SCALAR_FMT:
            v = self.read(_SCALAR_FMT[vtype])
            return bool(v) if vtype == _V_BOOL else v
        if vtype == _V_STR:
            return self.read_str()
        if vtype == _V_ARR:
            etype = self.read("<I")
            count = self.read("<Q")
            return [self.read_value(etype) for _ in range(count)]
        raise ValueError(f"unknown gguf metadata value type {vtype}")


def _dequant_q8_0(raw: bytes, n_elements: int) -> np.ndarray:
    """Q8_0: blocks of 32 int8 with one f16 scale (34 bytes/block)."""
    n_blocks = n_elements // 32
    blk = np.frombuffer(raw, dtype=np.uint8).reshape(n_blocks, 34)
    scales = blk[:, :2].copy().view(np.float16).astype(np.float32)  # [nb,1]
    qs = blk[:, 2:].copy().view(np.int8).astype(np.float32)         # [nb,32]
    return (qs * scales).reshape(-1)


def read_gguf(path: str) -> Tuple[Dict[str, object], Dict[str, np.ndarray]]:
    """Parse a GGUF file -> (metadata dict, {tensor_name: np.ndarray})."""
    with open(path, "rb") as f:
        data = f.read()
    r = _Reader(data)
    magic = r.read("<I")
    if magic != GGUF_MAGIC:
        raise ValueError(f"{path}: not a GGUF file (magic {magic:#x})")
    version = r.read("<I")
    if version not in (2, 3):
        raise ValueError(f"unsupported GGUF version {version}")
    n_tensors = r.read("<Q")
    n_kv = r.read("<Q")
    meta: Dict[str, object] = {}
    for _ in range(n_kv):
        key = r.read_str()
        vtype = r.read("<I")
        meta[key] = r.read_value(vtype)
    align = int(meta.get("general.alignment", ALIGNMENT))

    infos = []
    for _ in range(n_tensors):
        name = r.read_str()
        n_dims = r.read("<I")
        ne = [r.read("<Q") for _ in range(n_dims)]
        ttype = r.read("<I")
        offset = r.read("<Q")
        infos.append((name, ne, ttype, offset))

    data_start = (r.pos + align - 1) // align * align
    tensors: Dict[str, np.ndarray] = {}
    for name, ne, ttype, offset in infos:
        shape = tuple(reversed(ne))  # ggml ne order -> numpy row-major
        n_el = int(np.prod(shape)) if shape else 1
        start = data_start + offset
        if ttype == T_F32:
            arr = np.frombuffer(data, np.float32, n_el, start).copy()
        elif ttype == T_F16:
            arr = np.frombuffer(data, np.float16, n_el, start).astype(
                np.float32)
        elif ttype == T_BF16:
            arr = np.frombuffer(data, np.uint16, n_el, start).copy().view(
                ml_dtypes.bfloat16).astype(np.float32)
        elif ttype == T_Q8_0:
            nbytes = n_el // 32 * 34
            arr = _dequant_q8_0(data[start:start + nbytes], n_el)
        else:
            raise NotImplementedError(
                f"gguf tensor {name!r}: ggml type {ttype} not supported "
                "(F32/F16/BF16/Q8_0 only)")
        tensors[name] = arr.reshape(shape)
    return meta, tensors


# --------------------------------------------------- llama.cpp name mapping

_DIRECT = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output.weight": "lm_head.weight",
}
_BLK = {
    "attn_norm.weight": "input_layernorm.weight",
    "attn_q.weight": "self_attn.q_proj.weight",
    "attn_k.weight": "self_attn.k_proj.weight",
    "attn_v.weight": "self_attn.v_proj.weight",
    "attn_output.weight": "self_attn.o_proj.weight",
    "ffn_norm.weight": "post_attention_layernorm.weight",
    "ffn_gate.weight": "mlp.gate_proj.weight",
    "ffn_up.weight": "mlp.up_proj.weight",
    "ffn_down.weight": "mlp.down_proj.weight",
    "attn_q_norm.weight": "self_attn.q_norm.weight",
    "attn_k_norm.weight": "self_attn.k_norm.weight",
}


def permute_rows(w: np.ndarray, n_head: int) -> np.ndarray:
    """llama.cpp convert_hf_to_gguf permute: HF rope layout -> ggml."""
    return (w.reshape(n_head, 2, w.shape[0] // n_head // 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def unpermute_rows(w: np.ndarray, n_head: int) -> np.ndarray:
    """Inverse of permute_rows: ggml rope layout -> HF."""
    return (w.reshape(n_head, w.shape[0] // n_head // 2, 2, *w.shape[1:])
            .swapaxes(1, 2).reshape(w.shape))


def gguf_to_hf_tensors(meta: Dict[str, object],
                       tensors: Dict[str, np.ndarray],
                       num_heads: Optional[int] = None,
                       num_kv_heads: Optional[int] = None,
                       ) -> Dict[str, np.ndarray]:
    """Rename llama.cpp tensors to HF llama keys and undo the q/k row
    permutation. Head counts default to the GGUF metadata."""
    arch = meta.get("general.architecture", "llama")
    if num_heads is None:
        num_heads = int(meta.get(f"{arch}.attention.head_count", 0))
    if num_kv_heads is None:
        num_kv_heads = int(meta.get(
            f"{arch}.attention.head_count_kv", num_heads))
    out: Dict[str, np.ndarray] = {}
    for name, arr in tensors.items():
        if name in _DIRECT:
            out[_DIRECT[name]] = arr
            continue
        if name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            hf_rest = _BLK.get(rest)
            if hf_rest is None:
                raise KeyError(f"unmapped gguf tensor {name!r}")
            if rest == "attn_q.weight" and num_heads:
                arr = unpermute_rows(arr, num_heads)
            elif rest == "attn_k.weight" and num_kv_heads:
                arr = unpermute_rows(arr, num_kv_heads)
            out[f"model.layers.{idx}.{hf_rest}"] = arr
            continue
        raise KeyError(f"unmapped gguf tensor {name!r}")
    return out


# ------------------------------------------------------------------ writer

def _quant_q8_0(arr: np.ndarray) -> bytes:
    flat = arr.reshape(-1, 32).astype(np.float32)
    scale = np.abs(flat).max(axis=1) / 127.0
    scale = np.where(scale == 0, 1.0, scale)
    q = np.clip(np.round(flat / scale[:, None]), -127, 127).astype(np.int8)
    blocks = np.concatenate(
        [scale.astype(np.float16).view(np.uint8).reshape(-1, 2),
         q.view(np.uint8)], axis=1)
    return blocks.tobytes()


def write_gguf(path: str, metadata: Dict[str, object],
               tensors: Dict[str, np.ndarray],
               tensor_types: Optional[Dict[str, int]] = None) -> None:
    """Emit a GGUF v3 file. metadata values: int -> u32, float -> f32,
    str, bool. tensor_types maps name -> ggml type (default F32)."""
    tensor_types = tensor_types or {}
    out = bytearray()
    out += struct.pack("<IIQQ", GGUF_MAGIC, GGUF_VERSION,
                       len(tensors), len(metadata))

    def put_str(s: str):
        b = s.encode("utf-8")
        out.extend(struct.pack("<Q", len(b)))
        out.extend(b)

    for k, v in metadata.items():
        put_str(k)
        if isinstance(v, bool):
            out.extend(struct.pack("<IB", _V_BOOL, int(v)))
        elif isinstance(v, int):
            out.extend(struct.pack("<Ii", _V_I32, v))
        elif isinstance(v, float):
            out.extend(struct.pack("<If", _V_F32, v))
        elif isinstance(v, str):
            out.extend(struct.pack("<I", _V_STR))
            put_str(v)
        else:
            raise TypeError(f"metadata {k}: unsupported {type(v)}")

    blobs = []
    offset = 0
    for name, arr in tensors.items():
        ttype = tensor_types.get(name, T_F32)
        if ttype == T_F32:
            blob = np.ascontiguousarray(arr, dtype=np.float32).tobytes()
        elif ttype == T_F16:
            blob = np.ascontiguousarray(arr, dtype=np.float16).tobytes()
        elif ttype == T_BF16:
            blob = np.ascontiguousarray(arr).astype(
                ml_dtypes.bfloat16).view(np.uint16).tobytes()
        elif ttype == T_Q8_0:
            blob = _quant_q8_0(np.ascontiguousarray(arr, dtype=np.float32))
        else:
            raise NotImplementedError(f"writer: ggml type {ttype}")
        put_str(name)
        ne = list(reversed(arr.shape))
        out.extend(struct.pack("<I", len(ne)))
        for d in ne:
            out.extend(struct.pack("<Q", d))
        out.extend(struct.pack("<IQ", ttype, offset))
        pad = (-len(blob)) % ALIGNMENT
        blobs.append(blob + b"\0" * pad)
        offset += len(blob) + pad

    pad = (-len(out)) % ALIGNMENT
    out.extend(b"\0" * pad)
    for blob in blobs:
        out.extend(blob)
    with open(path, "wb") as f:
        f.write(bytes(out))
