"""POSIX shared-memory connector for cross-process single-node transfer.

Rebuild of the reference's SharedMemoryConnector (reference
vllm_omni/distributed/omni_connectors/connectors/shm_connector.py:17-151):
encode the payload into a named multiprocessing.shared_memory segment; a
small named side-channel (a filesystem directory of key files) advertises
segment names; the consumer unlinks the segment after reading.

Payloads use the data-only codec (codec.py) rather than pickle: shm
segments and the registry dir are same-host but still a process trust
boundary (any local process can publish a segment name), and the codec
is also zero-copy-friendlier for large arrays.
"""

from __future__ import annotations

import os
import tempfile
import uuid
from multiprocessing import shared_memory
from typing import Any

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase
from ht_vllm_omni_tpu.distributed.connectors.codec import (
    decode_payload,
    encode_payload,
)


class SharedMemoryConnector(OmniConnectorBase):
    def __init__(self, registry_dir: str | None = None, **extra: Any) -> None:
        super().__init__(**extra)
        self.registry_dir = registry_dir or os.path.join(
            tempfile.gettempdir(), "ht_omni_shm_registry"
        )
        os.makedirs(self.registry_dir, exist_ok=True)

    def _reg_path(self, from_stage: int, to_stage: int, key: str) -> str:
        safe = f"{from_stage}_{to_stage}_{key}".replace("/", "_")
        return os.path.join(self.registry_dir, safe)

    def put(self, from_stage, to_stage, key, data):
        blob = encode_payload(data)
        seg_name = f"htomni_{uuid.uuid4().hex[:16]}"
        seg = shared_memory.SharedMemory(
            create=True, size=max(len(blob), 1), name=seg_name
        )
        try:
            seg.buf[: len(blob)] = blob
        finally:
            seg.close()
        reg = self._reg_path(from_stage, to_stage, key)
        tmp = reg + ".tmp"
        with open(tmp, "w") as f:
            f.write(f"{seg_name}\n{len(blob)}")
        os.replace(tmp, reg)  # atomic publish
        return True, len(blob)

    def get(self, from_stage, to_stage, key):
        reg = self._reg_path(from_stage, to_stage, key)
        try:
            with open(reg) as f:
                seg_name, size = f.read().split("\n")
        except FileNotFoundError:
            return None, 0
        try:
            seg = shared_memory.SharedMemory(name=seg_name)
        except FileNotFoundError:
            return None, 0
        try:
            data = decode_payload(bytes(seg.buf[: int(size)]))
        finally:
            seg.close()
            try:
                seg_unlink = shared_memory.SharedMemory(name=seg_name)
                seg_unlink.close()
                seg_unlink.unlink()
            except FileNotFoundError:
                pass
            try:
                os.unlink(reg)
            except FileNotFoundError:
                pass
        return data, int(size)
