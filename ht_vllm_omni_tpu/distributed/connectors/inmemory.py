"""In-process connector: a locked dict.

Default transport for the single-controller deployment (all stages in one
process, one TPU mesh) — the reference's SharedMemoryConnector exists to
cross its per-stage process boundary, which the TPU design removes.  Also
doubles as the MockConnector used pervasively by the reference's tests
(reference tests/distributed/omni_connectors/test_kv_flow.py:15-31).
"""

from __future__ import annotations

import sys
import threading
from typing import Any

import numpy as np

from ht_vllm_omni_tpu.distributed.connectors.base import OmniConnectorBase


def _approx_nbytes(o: Any) -> int:
    """Metrics-only size estimate. The payload never leaves the process
    (passed by reference), so no serialization — and no pickle — is
    involved; this just feeds the bytes counters."""
    if isinstance(o, np.ndarray):
        return o.nbytes
    if hasattr(o, "nbytes"):  # jax arrays and friends
        try:
            return int(o.nbytes)
        except Exception:
            return 0
    if isinstance(o, (bytes, bytearray, memoryview)):
        return len(o)
    if isinstance(o, dict):
        return sum(_approx_nbytes(v) for v in o.values())
    if isinstance(o, (list, tuple)):
        return sum(_approx_nbytes(v) for v in o)
    try:
        return sys.getsizeof(o)
    except Exception:
        return 0


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
        return True, _approx_nbytes(data)

    def get(self, from_stage, to_stage, key):
        with self._lock:
            data = self._store.pop(self._key(from_stage, to_stage, key), None)
        return data, 0 if data is None else 1

    def peek_len(self) -> int:
        with self._lock:
            return len(self._store)
