"""Engine-internal request state.

First-class version of the reference's patched vLLM Request (reference
vllm_omni/patch.py:47-50 extends RequestStatus with WAITING_FOR_CHUNK;
vllm_omni/request.py carries prompt_embeds / additional_information).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import numpy as np

from ht_vllm_omni_tpu.sampling_params import SamplingParams


class RequestStatus(enum.Enum):
    WAITING = enum.auto()
    # async-chunk streaming: parked until the upstream stage delivers the
    # next chunk (reference WAITING_FOR_CHUNK, patch.py:47).
    WAITING_FOR_CHUNK = enum.auto()
    RUNNING = enum.auto()
    PREEMPTED = enum.auto()
    FINISHED_STOPPED = enum.auto()
    FINISHED_LENGTH = enum.auto()
    FINISHED_ABORTED = enum.auto()
    FINISHED_ERROR = enum.auto()

    @property
    def finished(self) -> bool:
        return self in _FINISHED

    @property
    def finish_reason(self) -> str | None:
        return {
            RequestStatus.FINISHED_STOPPED: "stop",
            RequestStatus.FINISHED_LENGTH: "length",
            RequestStatus.FINISHED_ABORTED: "abort",
            RequestStatus.FINISHED_ERROR: "error",
        }.get(self)


_FINISHED = {
    RequestStatus.FINISHED_STOPPED,
    RequestStatus.FINISHED_LENGTH,
    RequestStatus.FINISHED_ABORTED,
    RequestStatus.FINISHED_ERROR,
}


@dataclasses.dataclass
class Request:
    request_id: str
    prompt_token_ids: list[int]
    sampling_params: SamplingParams
    # [prompt_len, hidden] — consumed instead of the embedding table rows
    # when present (thinker->talker handoff).
    prompt_embeds: np.ndarray | None = None
    additional_information: dict[str, Any] = dataclasses.field(
        default_factory=dict
    )
    arrival_time: float = 0.0
    status: RequestStatus = RequestStatus.WAITING
    # keep pages alive after finish until the KV transfer manager extracts
    # them (reference kv_extracted_req_ids deferred freeing,
    # omni_ar_scheduler.py:454-479)
    needs_kv_transfer: bool = False

    # --- scheduler state ---
    # dp page-pool partition this request allocates from (assigned at
    # every waiting->running admission; core/block_pool.py groups)
    pool_group: int = 0
    output_token_ids: list[int] = dataclasses.field(default_factory=list)
    num_computed_tokens: int = 0  # prompt tokens whose KV is materialised
    page_ids: list[int] = dataclasses.field(default_factory=list)
    num_preemptions: int = 0

    # --- streamed multimodal output accumulation (runner side) ---
    multimodal_chunks: dict[str, Any] = dataclasses.field(default_factory=dict)
    hidden_state_chunks: list[np.ndarray] = dataclasses.field(
        default_factory=list
    )

    @property
    def num_prompt_tokens(self) -> int:
        return len(self.prompt_token_ids)

    @property
    def num_output_tokens(self) -> int:
        return len(self.output_token_ids)

    @property
    def num_tokens(self) -> int:
        return self.num_prompt_tokens + self.num_output_tokens

    @property
    def all_token_ids(self) -> list[int]:
        return self.prompt_token_ids + self.output_token_ids

    @property
    def prefill_done(self) -> bool:
        return self.num_computed_tokens >= self.num_prompt_tokens
