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


def prometheus_text(agg: "OrchestratorAggregator") -> str:
    """Render the aggregator as Prometheus text exposition (the
    reference inherits vLLM's /metrics endpoint; this is the TPU
    engine's equivalent surface)."""
    finished = agg.finished
    lines = [
        "# HELP omni_requests_running Requests currently in flight",
        "# TYPE omni_requests_running gauge",
        f"omni_requests_running {len(agg.requests)}",
        "# HELP omni_requests_finished_total Finished requests",
        "# TYPE omni_requests_finished_total counter",
        f"omni_requests_finished_total {len(finished)}",
    ]
    if finished:
        e2e = sorted(st.e2e_s for st in finished)
        ttfp = sorted(st.ttfp_s for st in finished if st.ttfp_s > 0)

        def q(xs, f):
            return xs[min(int(len(xs) * f), len(xs) - 1)] if xs else 0.0

        lines += [
            "# HELP omni_e2e_seconds Request end-to-end latency",
            "# TYPE omni_e2e_seconds summary",
            f'omni_e2e_seconds{{quantile="0.5"}} {q(e2e, 0.5):.6f}',
            f'omni_e2e_seconds{{quantile="0.9"}} {q(e2e, 0.9):.6f}',
            f'omni_e2e_seconds{{quantile="0.99"}} {q(e2e, 0.99):.6f}',
            f"omni_e2e_seconds_sum {sum(e2e):.6f}",
            f"omni_e2e_seconds_count {len(e2e)}",
        ]
        if ttfp:
            lines += [
                "# HELP omni_ttfp_seconds Time to first final output",
                "# TYPE omni_ttfp_seconds summary",
                f'omni_ttfp_seconds{{quantile="0.5"}} {q(ttfp, 0.5):.6f}',
                f'omni_ttfp_seconds{{quantile="0.9"}} {q(ttfp, 0.9):.6f}',
                f"omni_ttfp_seconds_sum {sum(ttfp):.6f}",
                f"omni_ttfp_seconds_count {len(ttfp)}",
            ]
        tok_out: dict[int, int] = {}
        tok_in: dict[int, int] = {}
        for st in finished:
            for sid, stage in st.stages.items():
                tok_out[sid] = tok_out.get(sid, 0) + stage.tokens_out
                tok_in[sid] = tok_in.get(sid, 0) + stage.tokens_in
        lines += [
            "# HELP omni_stage_tokens_total Tokens through each stage",
            "# TYPE omni_stage_tokens_total counter",
        ]
        for sid in sorted(tok_out):
            lines.append(
                f'omni_stage_tokens_total{{stage="{sid}",direction="out"}} '
                f"{tok_out[sid]}"
            )
            lines.append(
                f'omni_stage_tokens_total{{stage="{sid}",direction="in"}} '
                f"{tok_in[sid]}"
            )
    return "\n".join(lines) + "\n"
