"""Unified request outputs.

Counterpart of the reference's OmniRequestOutput (reference
vllm_omni/outputs.py:30) which unifies AR pipeline outputs and diffusion
outputs, plus the multimodal tensor accumulation semantics of
MultimodalOutputProcessor (reference vllm_omni/engine/output_processor.py:24):
streamed per-step tensors are list-appended, while scalar (0-dim) tensors
are metadata and latest-wins — the HT streaming fix.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


@dataclasses.dataclass
class CompletionOutput:
    """One decoded sequence of an AR request."""

    index: int
    token_ids: list[int]
    text: str = ""
    finish_reason: str | None = None  # "stop" | "length" | "abort" | "error"
    # Optional per-request hidden states captured at sampled positions
    # ([num_tokens, hidden]); forwarded to downstream stages.
    hidden_states: np.ndarray | None = None
    # Optional hidden states at the PROMPT positions ([prompt_len,
    # hidden]; SamplingParams.return_prompt_hidden_states) — the
    # MammothModa2 AR->DiT edge needs text-condition hiddens from the
    # prompt (reference stage_input_processors/mammoth_moda2.py:46).
    prompt_hidden_states: np.ndarray | None = None
    # Optional per-token logprobs (SamplingParams.logprobs): one dict
    # per generated token with "token_id", "logprob", and up to
    # MAX_TOP_LOGPROBS alternatives ("top_token_ids"/"top_logprobs").
    logprobs: list | None = None
    cumulative_logprob: float | None = None

    @property
    def finished(self) -> bool:
        return self.finish_reason is not None


@dataclasses.dataclass
class OmniRequestOutput:
    """What a client (or the orchestrator) receives for one request."""

    request_id: str
    stage_id: int = 0
    final_output: bool = True
    prompt_token_ids: list[int] | None = None
    outputs: list[CompletionOutput] = dataclasses.field(default_factory=list)
    finished: bool = False
    # modality -> accumulated tensors (list-append) or scalar (latest-wins)
    multimodal_output: dict[str, Any] = dataclasses.field(default_factory=dict)
    metrics: dict[str, float] = dataclasses.field(default_factory=dict)
    error: str | None = None

    def merge_multimodal(self, tensors: dict[str, Any]) -> None:
        """Accumulate streamed multimodal tensors.

        ndarray with ndim == 0 (and python scalars) are treated as
        latest-wins metadata; everything else is appended to a list
        (O(1) per chunk; consolidation happens at read time).
        """
        for key, value in tensors.items():
            is_scalar = np.isscalar(value) or (
                isinstance(value, np.ndarray) and value.ndim == 0
            )
            if is_scalar:
                self.multimodal_output[key] = value
            else:
                bucket = self.multimodal_output.setdefault(key, [])
                if not isinstance(bucket, list):
                    bucket = [bucket]
                    self.multimodal_output[key] = bucket
                bucket.append(value)

    def consolidated_multimodal(self, key: str) -> np.ndarray | None:
        """Concatenate accumulated chunks for ``key`` along axis 0."""
        value = self.multimodal_output.get(key)
        if value is None:
            return None
        if isinstance(value, list):
            if not value:
                return None
            return np.concatenate([np.asarray(v) for v in value], axis=0)
        return np.asarray(value)
