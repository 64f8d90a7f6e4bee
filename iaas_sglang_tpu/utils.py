"""Small shared utilities (analog of sglang `srt/utils.py`, trimmed to what
the TPU stack needs: shape bucketing, ports, dtype parsing, logging)."""

from __future__ import annotations

import logging
import os
import socket
import time
from typing import Any, Iterable

import numpy as np

logger = logging.getLogger("iaas_sglang_tpu")


def configure_logger(level: int = logging.INFO, prefix: str = "") -> None:
    fmt = f"[%(asctime)s{prefix}] %(message)s"
    logging.basicConfig(level=level, format=fmt, datefmt="%H:%M:%S", force=True)


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def next_power_of_2(n: int) -> int:
    if n <= 1:
        return 1
    return 1 << (n - 1).bit_length()


def bucket_size(n: int, buckets: Iterable[int]) -> int:
    """Smallest bucket >= n. `buckets` must be sorted ascending."""
    for b in buckets:
        if b >= n:
            return b
    raise ValueError(f"size {n} exceeds largest bucket {list(buckets)[-1]}")


def make_buckets(max_size: int, min_size: int = 8) -> list[int]:
    """Power-of-two buckets from min_size up to (and including) max_size.

    These index the compiled-step-function cache — the TPU analog of the
    reference's CUDA-graph batch-size table
    (model_executor/cuda_graph_runner.py:138 `get_batch_sizes_to_capture`).
    """
    out = []
    b = min_size
    while b < max_size:
        out.append(b)
        b *= 2
    out.append(max_size)
    return out


def get_open_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("", 0))
        return s.getsockname()[1]


def parse_dtype(name: str):
    import jax.numpy as jnp

    table = {
        "bfloat16": jnp.bfloat16,
        "bf16": jnp.bfloat16,
        "float16": jnp.bfloat16,  # fp16 is not a TPU-native dtype; map to bf16
        "half": jnp.bfloat16,
        "float32": jnp.float32,
        "fp32": jnp.float32,
        "auto": jnp.bfloat16,
    }
    if name not in table:
        raise ValueError(f"unknown dtype {name!r}")
    return table[name]


def np_pad_to(arr: np.ndarray, size: int, fill: int = 0, axis: int = 0) -> np.ndarray:
    """Pad `arr` along `axis` with `fill` up to `size`."""
    pad = size - arr.shape[axis]
    if pad < 0:
        raise ValueError(f"array dim {arr.shape[axis]} > target {size}")
    if pad == 0:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[axis] = (0, pad)
    return np.pad(arr, widths, constant_values=fill)


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0


def kill_process_tree(pid: int | None = None, include_parent: bool = True) -> None:
    """Kill a process and its children by exact PID (never by pattern)."""
    import psutil

    try:
        parent = psutil.Process(pid or os.getpid())
    except psutil.NoSuchProcess:
        return
    children = parent.children(recursive=True)
    for p in children:
        try:
            p.kill()
        except psutil.NoSuchProcess:
            pass
    if include_parent:
        try:
            parent.kill()
        except psutil.NoSuchProcess:
            pass


class TypeBasedDispatcher:
    """Dispatch a message object to a handler by exact type
    (analog of sglang srt/utils.py TypeBasedDispatcher)."""

    def __init__(self, mapping: list[tuple[type, Any]]):
        self._mapping = mapping

    def __call__(self, obj: Any):
        for ty, fn in self._mapping:
            if isinstance(obj, ty):
                return fn(obj)
        raise ValueError(f"no handler for {type(obj)}")
