"""Shared-filesystem connector: put/get over a cluster-visible directory.

Fills the reference's alternative-transport slot (reference
vllm_omni/distributed/omni_connectors/connectors/yuanrong_connector.py —
a thin client over a third-party datasystem KV store + etcd discovery;
that service does not exist here, and a shared filesystem — NFS,
Lustre, GCS-FUSE — is the equivalent infrastructure most TPU pods
already mount).  Same ``put``/``get`` key contract as every other
connector (base.py), with:

- atomic publication: payloads write to a ``.tmp-<uuid>`` file and
  ``os.rename`` into place, so a consumer never reads a torn payload;
- consume-on-get: the reader renames the file to a private name first
  (the POSIX analog of the single-reader SHM unlink), so concurrent
  readers cannot double-consume;
- TTL sweep: files older than ``ttl_s`` (default 300 s, the reference's
  Mooncake stale-buffer window, mooncake_transfer_engine_connector.py:31)
  are reclaimed on each put, bounding leaked keys from dead consumers;
- the data-only wire codec (codec.py) — the directory is a cross-host
  trust boundary, so no pickle.
"""

from __future__ import annotations

import os
import tempfile
import time
import uuid
from typing import Any

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase
from ht_vllm_omni_tpu.distributed.connectors.codec import (
    decode_payload,
    encode_payload,
)


class FsStoreConnector(OmniConnectorBase):
    def __init__(
        self,
        store_dir: str | None = None,
        ttl_s: float = 300.0,
        **extra: Any,
    ) -> None:
        super().__init__(**extra)
        self.store_dir = store_dir or os.path.join(
            tempfile.gettempdir(), "ht_omni_fsstore"
        )
        self.ttl_s = float(ttl_s)
        os.makedirs(self.store_dir, exist_ok=True)
        self._last_sweep = 0.0

    def _path(self, from_stage: int, to_stage: int, key: str) -> str:
        safe = f"{from_stage}_{to_stage}_{key}".replace("/", "_")
        return os.path.join(self.store_dir, safe + ".bin")

    def put(
        self, from_stage: int, to_stage: int, key: str, data: Any
    ) -> tuple[bool, int]:
        try:
            blob = encode_payload(data)
            tmp = os.path.join(
                self.store_dir, f".tmp-{uuid.uuid4().hex}"
            )
            with open(tmp, "wb") as f:
                f.write(blob)
                f.flush()
                os.fsync(f.fileno())
            os.rename(tmp, self._path(from_stage, to_stage, key))
            self._maybe_sweep()
            return True, len(blob)
        except OSError:
            return False, 0

    def get(
        self, from_stage: int, to_stage: int, key: str
    ) -> tuple[Any | None, int]:
        path = self._path(from_stage, to_stage, key)
        claim = path + f".claim-{uuid.uuid4().hex}"
        try:
            os.rename(path, claim)  # atomic single-consumer claim
        except OSError:
            return None, 0
        try:
            with open(claim, "rb") as f:
                blob = f.read()
            return decode_payload(blob), len(blob)
        finally:
            try:
                os.unlink(claim)
            except OSError:
                pass

    def _maybe_sweep(self) -> None:
        now = time.time()
        if now - self._last_sweep < self.ttl_s / 4:
            return
        self._last_sweep = now
        try:
            for name in os.listdir(self.store_dir):
                p = os.path.join(self.store_dir, name)
                try:
                    if now - os.path.getmtime(p) > self.ttl_s:
                        os.unlink(p)
                except OSError:
                    pass
        except OSError:
            pass
