"""Per-stage / per-request statistics.

Counterpart of the reference metrics package (reference
vllm_omni/metrics/stats.py:17-109 StageStats / StageRequestStats /
RequestE2EStats and the OrchestratorAggregator summary tables logged at
request end, omni_base.py:156-170).
"""

from __future__ import annotations

import dataclasses
import time


@dataclasses.dataclass
class StageStats:
    """One request's numbers inside one stage."""

    stage_id: int
    tokens_in: int = 0
    tokens_out: int = 0
    start_time: float = 0.0
    first_output_time: float = 0.0
    finish_time: float = 0.0

    @property
    def gen_time_s(self) -> float:
        if not self.finish_time or not self.start_time:
            return 0.0
        return self.finish_time - self.start_time


@dataclasses.dataclass
class RequestE2EStats:
    request_id: str
    arrival_time: float = dataclasses.field(default_factory=time.time)
    finish_time: float = 0.0
    # time-to-first-packet of the FINAL modality (audio TTFP for TTS)
    first_final_output_time: float = 0.0
    stages: dict[int, StageStats] = dataclasses.field(default_factory=dict)
    transfer_bytes: int = 0

    def stage(self, stage_id: int) -> StageStats:
        if stage_id not in self.stages:
            self.stages[stage_id] = StageStats(
                stage_id, start_time=time.time()
            )
        return self.stages[stage_id]

    @property
    def e2e_s(self) -> float:
        if not self.finish_time:
            return 0.0
        return self.finish_time - self.arrival_time

    @property
    def ttfp_s(self) -> float:
        """Time to first final-stage packet (the reference's headline
        async-chunk metric, async_chunk_design.md)."""
        if not self.first_final_output_time:
            return 0.0
        return self.first_final_output_time - self.arrival_time


class OrchestratorAggregator:
    def __init__(self) -> None:
        self.requests: dict[str, RequestE2EStats] = {}
        self.finished: list[RequestE2EStats] = []

    def on_request(self, request_id: str) -> RequestE2EStats:
        st = RequestE2EStats(request_id)
        self.requests[request_id] = st
        return st

    def get(self, request_id: str) -> RequestE2EStats | None:
        return self.requests.get(request_id)

    def on_finish(self, request_id: str) -> None:
        st = self.requests.pop(request_id, None)
        if st is not None:
            st.finish_time = st.finish_time or time.time()
            self.finished.append(st)

    def summary_table(self) -> str:
        rows = [
            f"{'request':<20}{'e2e_s':>8}{'ttfp_s':>8}"
            f"{'stages(tok_in/tok_out)':>32}"
        ]
        for st in self.finished[-20:]:
            stages = " ".join(
                f"s{sid}:{s.tokens_in}/{s.tokens_out}"
                for sid, s in sorted(st.stages.items())
            )
            rows.append(
                f"{st.request_id:<20}{st.e2e_s:>8.3f}{st.ttfp_s:>8.3f}"
                f"{stages:>32}"
            )
        return "\n".join(rows)
