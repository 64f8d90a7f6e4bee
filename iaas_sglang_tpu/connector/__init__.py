"""Remote weight/KV-cache store connectors
(analog of sglang srt/connector/: Redis, S3 + safe serde).

This environment is zero-egress, so the filesystem connector is the
working backend; Redis/S3 classes keep API parity and activate when
their client libraries/servers exist.

URL schemes: file://<path>, redis://host:port/db, s3://bucket/prefix
"""

from __future__ import annotations

import io
import os
import pickle
from typing import Any, Iterator, Optional, Tuple

import numpy as np


class BaseConnector:
    def __init__(self, url: str):
        self.url = url

    def weight_iterator(self, rank: int = 0) -> Iterator[Tuple[str, np.ndarray]]:
        raise NotImplementedError

    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def set(self, key: str, value: bytes) -> None:
        raise NotImplementedError

    def put_weights(self, named_arrays) -> int:
        """Persist (name, np.ndarray) pairs so weight_iterator reads them
        back (save_remote_model path). Returns the tensor count."""
        n = 0
        for name, arr in named_arrays:
            buf = io.BytesIO()
            np.save(buf, arr)
            self.set(f"weights:{name}", buf.getvalue())
            n += 1
        return n


class FileConnector(BaseConnector):
    """file:// — directory of .npz weight shards + a kv/ blob store."""

    def __init__(self, url: str):
        super().__init__(url)
        self.root = url[len("file://"):]
        os.makedirs(self.root, exist_ok=True)

    def weight_iterator(self, rank: int = 0):
        for fname in sorted(os.listdir(self.root)):
            if fname.endswith(".npz"):
                with np.load(os.path.join(self.root, fname)) as z:
                    for k in z.files:
                        yield k, z[k]

    def _path(self, key: str) -> str:
        return os.path.join(self.root, "blobs", key.replace("/", "_"))

    def get(self, key: str) -> Optional[bytes]:
        p = self._path(key)
        if not os.path.exists(p):
            return None
        with open(p, "rb") as f:
            return f.read()

    def set(self, key: str, value: bytes) -> None:
        os.makedirs(os.path.dirname(self._path(key)), exist_ok=True)
        with open(self._path(key), "wb") as f:
            f.write(value)

    def put_weights(self, named_arrays) -> int:
        # one .npz in the root so weight_iterator round-trips it
        arrays = dict(named_arrays)
        np.savez(os.path.join(self.root, "weights-00000.npz"), **arrays)
        return len(arrays)


class RedisConnector(BaseConnector):
    def __init__(self, url: str):
        super().__init__(url)
        import redis  # noqa: F401 — optional dependency

        self.client = redis.Redis.from_url(url)

    def get(self, key: str) -> Optional[bytes]:
        return self.client.get(key)

    def set(self, key: str, value: bytes) -> None:
        self.client.set(key, value)

    def weight_iterator(self, rank: int = 0):
        for key in self.client.scan_iter("weights:*"):
            buf = io.BytesIO(self.client.get(key))
            yield key.decode().removeprefix("weights:"), np.load(buf)


class S3Connector(BaseConnector):
    def __init__(self, url: str):
        super().__init__(url)
        import boto3  # noqa: F401 — optional dependency

        self.client = boto3.client("s3")
        rest = url[len("s3://"):]
        self.bucket, _, self.prefix = rest.partition("/")

    def get(self, key: str) -> Optional[bytes]:
        try:
            obj = self.client.get_object(
                Bucket=self.bucket, Key=f"{self.prefix}{key}")
            return obj["Body"].read()
        except Exception:  # noqa: BLE001
            return None

    def set(self, key: str, value: bytes) -> None:
        self.client.put_object(
            Bucket=self.bucket, Key=f"{self.prefix}{key}", Body=value)


def create_remote_connector(url: str) -> BaseConnector:
    if url.startswith("file://"):
        return FileConnector(url)
    if url.startswith("redis://"):
        return RedisConnector(url)
    if url.startswith("s3://"):
        return S3Connector(url)
    raise ValueError(f"unsupported connector url {url!r}")
