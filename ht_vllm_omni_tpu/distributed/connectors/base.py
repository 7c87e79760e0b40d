"""Connector protocol for stage-to-stage tensor/KV transfer.

Same put/get key contract as the reference (reference
vllm_omni/distributed/omni_connectors/connectors/base.py and
docs/design/feature/disaggregated_inference.md:30-52): a producer stage
``put``s an arbitrary python payload under a string key; the consumer
``get``s (and consumes) it.  Keys follow ``{request_id}_{stage}_{chunk}``
for async-chunk streams (reference chunk_transfer_adapter.py:131).
"""

from __future__ import annotations

import abc
from typing import Any


class OmniConnectorBase(abc.ABC):
    def __init__(self, **extra: Any) -> None:
        self.extra = extra

    @abc.abstractmethod
    def put(
        self, from_stage: int, to_stage: int, key: str, data: Any
    ) -> tuple[bool, int]:
        """Store payload; returns (ok, approx_size_bytes)."""

    @abc.abstractmethod
    def get(
        self, from_stage: int, to_stage: int, key: str
    ) -> tuple[Any | None, int]:
        """Fetch-and-consume payload; (None, 0) when not present."""

    def close(self) -> None:  # pragma: no cover - optional
        pass
