"""Disk-backed stores for server-side artifacts (voices, video jobs).

Counterpart of the reference's persistent artifact storage (reference
vllm_omni/entrypoints/openai/storage.py — uploaded voice embeddings —
and stores.py VIDEO_STORE/VIDEO_TASKS): without it a server restart
loses every uploaded voice and generated video.  Entries persist one
file per key under a root directory using the repo's pickle-free data
codec (distributed/connectors/codec.py: JSON structure + raw ndarray
buffers — decode never executes payload content), so numpy leaves like
speaker embeddings and video frames round-trip losslessly.

A small in-memory write-through cache keeps the hot path dict-fast;
reads fall back to disk so a freshly restarted server sees everything a
previous process stored.
"""

from __future__ import annotations

import os
import re
import threading
from collections.abc import MutableMapping
from typing import Any

from ht_vllm_omni_tpu.distributed.connectors.codec import (
    decode_payload,
    encode_payload,
)

_SAFE = re.compile(r"[^A-Za-z0-9._-]")


def _fname(key: str) -> str:
    # keys are user-supplied (voice names, job ids): sanitize for the
    # filesystem and keep a reversible-enough suffix for uniqueness
    safe = _SAFE.sub("_", key)[:80]
    return f"{safe}-{abs(hash(key)) & 0xFFFFFFFF:08x}.bin"


class DiskDict(MutableMapping):
    """dict[str, Any] persisted one codec-encoded file per key."""

    def __init__(self, root: str) -> None:
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        self._cache: dict[str, Any] = {}
        self._index_path = os.path.join(root, "_index.bin")
        self._index: dict[str, str] = {}  # key -> filename
        if os.path.exists(self._index_path):
            try:
                with open(self._index_path, "rb") as f:
                    self._index = dict(decode_payload(f.read()))
            except Exception:
                self._index = {}

    def _write_index(self) -> None:
        tmp = self._index_path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(encode_payload(self._index))
        os.replace(tmp, self._index_path)

    def __setitem__(self, key: str, value: Any) -> None:
        with self._lock:
            fn = self._index.get(key) or _fname(key)
            tmp = os.path.join(self.root, fn + ".tmp")
            with open(tmp, "wb") as f:
                f.write(encode_payload(value))
            os.replace(tmp, os.path.join(self.root, fn))
            self._cache[key] = value
            if self._index.get(key) != fn:
                self._index[key] = fn
                self._write_index()

    def __getitem__(self, key: str) -> Any:
        with self._lock:
            if key in self._cache:
                return self._cache[key]
            fn = self._index.get(key)
            if fn is None:
                raise KeyError(key)
            with open(os.path.join(self.root, fn), "rb") as f:
                val = decode_payload(f.read())
            self._cache[key] = val
            return val

    def __delitem__(self, key: str) -> None:
        with self._lock:
            fn = self._index.pop(key, None)
            self._cache.pop(key, None)
            if fn is None:
                raise KeyError(key)
            try:
                os.remove(os.path.join(self.root, fn))
            except FileNotFoundError:
                pass
            self._write_index()

    def __iter__(self):
        return iter(list(self._index))

    def __len__(self) -> int:
        return len(self._index)

    def __contains__(self, key) -> bool:
        return key in self._index
