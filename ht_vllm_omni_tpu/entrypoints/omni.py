"""Offline synchronous multi-stage API.

Counterpart of the reference's Omni (reference vllm_omni/entrypoints/
omni.py:24): construct a pipeline (from a pipeline.yaml or injected stage
handles) and run prompts to completion, returning final-stage outputs
(with intermediate comprehension-stage text attached).
"""

from __future__ import annotations

import logging
from typing import Any, Sequence

from ht_vllm_omni_tpu.config.stage_config import (
    PipelineConfig,
    load_pipeline_config,
)
from ht_vllm_omni_tpu.engine.orchestrator import (
    PipelineOrchestrator,
    StageHandle,
)
from ht_vllm_omni_tpu.outputs import OmniRequestOutput
from ht_vllm_omni_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class Omni:
    def __init__(
        self,
        pipeline: PipelineConfig | str | dict | None = None,
        stages: Sequence[StageHandle] | None = None,
        model: str | None = None,
    ) -> None:
        if stages is None:
            from ht_vllm_omni_tpu.engine.stage_factory import build_stages

            if pipeline is None and model is not None:
                from ht_vllm_omni_tpu.config.stage_config import (
                    builtin_pipeline_path,
                )

                pipeline = builtin_pipeline_path(model)
            if not isinstance(pipeline, PipelineConfig):
                pipeline = load_pipeline_config(pipeline)
            stages = build_stages(pipeline, model_path=model)
        elif not isinstance(pipeline, PipelineConfig):
            pipeline = (
                load_pipeline_config(pipeline)
                if pipeline is not None
                else _implicit_pipeline(stages)
            )
        self.pipeline = pipeline
        self.orchestrator = PipelineOrchestrator(pipeline, stages)

    def generate(
        self,
        prompts: Sequence[Any],
        sampling_params_list: (
            SamplingParams | Sequence[SamplingParams] | None
        ) = None,
        py_generator: bool = False,
    ):
        """Run prompts through the whole pipeline.

        Default: returns one final output per prompt (multimodal tensors
        consolidated).  With ``py_generator=True`` (reference
        vllm_omni/entrypoints/omni.py:61,144-172) returns an iterator
        that yields every final-stage OmniRequestOutput as it is
        produced — incremental token/audio chunks included — so offline
        callers can stream without the async engine.
        """
        order = [
            self.orchestrator.add_request(p, sampling_params_list)
            for p in prompts
        ]
        if py_generator:
            return self._generate_stream()
        finals: dict[str, OmniRequestOutput] = {}
        while self.orchestrator.has_unfinished():
            for out in self.orchestrator.step():
                # the orchestrator accumulates multimodal streams, so each
                # final-stage event already carries the cumulative tensors
                if out.final_output and out.finished:
                    finals[out.request_id] = out
        return [finals[rid] for rid in order]

    def _generate_stream(self):
        while self.orchestrator.has_unfinished():
            for out in self.orchestrator.step():
                if out.final_output:
                    yield out

    def abort(self, request_id: str) -> None:
        self.orchestrator.abort_request(request_id)


def _implicit_pipeline(stages: Sequence[StageHandle]) -> PipelineConfig:
    return PipelineConfig(
        model_type="custom", stages=[h.config for h in stages]
    )
