"""In-process connector: a locked dict.

Default transport for the single-controller deployment (all stages in one
process, one TPU mesh) — the reference's SharedMemoryConnector exists to
cross its per-stage process boundary, which the TPU design removes.  Also
doubles as the MockConnector used pervasively by the reference's tests
(reference tests/distributed/omni_connectors/test_kv_flow.py:15-31).
"""

from __future__ import annotations

import pickle
import threading
from typing import Any

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase


class InMemoryConnector(OmniConnectorBase):
    def __init__(self, **extra: Any) -> None:
        super().__init__(**extra)
        self._store: dict[str, Any] = {}
        self._lock = threading.Lock()

    def _key(self, from_stage: int, to_stage: int, key: str) -> str:
        return f"{from_stage}->{to_stage}:{key}"

    def put(self, from_stage, to_stage, key, data):
        with self._lock:
            self._store[self._key(from_stage, to_stage, key)] = data
        try:
            size = len(pickle.dumps(data, protocol=pickle.HIGHEST_PROTOCOL))
        except Exception:
            size = 0
        return True, size

    def get(self, from_stage, to_stage, key):
        with self._lock:
            data = self._store.pop(self._key(from_stage, to_stage, key), None)
        return data, 0 if data is None else 1

    def peek_len(self) -> int:
        with self._lock:
            return len(self._store)
