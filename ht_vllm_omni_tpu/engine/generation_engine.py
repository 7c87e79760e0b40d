"""Engine for non-AR "generation" stages (codec decoders, vocoders).

Counterpart of the reference's OmniGenerationScheduler +
GPUGenerationModelRunner pair (reference
vllm_omni/core/sched/omni_generation_scheduler.py:28,
vllm_omni/worker/gpu_generation_model_runner.py:46): a request's whole
prompt is consumed in one forward pass (no sampling, no KV), the model
emits multimodal tensors, and the request finishes.  With async-chunk the
request is fed chunk-by-chunk and emits one tensor chunk per feed
(WAITING_FOR_CHUNK parking happens in the orchestrator's chunk adapter).
"""

from __future__ import annotations

import dataclasses
import time
from collections import deque
from typing import Any, Protocol

import numpy as np

from ht_vllm_omni_tpu.core.request import Request, RequestStatus
from ht_vllm_omni_tpu.outputs import CompletionOutput, OmniRequestOutput
from ht_vllm_omni_tpu.sampling_params import SamplingParams


class GenerationModel(Protocol):
    """A one-shot stage model.

    Called with the request's token ids / embeds / payload; returns a dict
    of modality -> np.ndarray outputs (e.g. {"audio": [T]}), or per-chunk
    outputs when fed incrementally (the model keeps no cross-request
    state; chunk context is passed back in via ``state``).
    """

    def __call__(
        self,
        token_ids: list[int] | None,
        prompt_embeds: np.ndarray | None,
        additional_information: dict[str, Any],
        state: dict[str, Any],
    ) -> dict[str, Any]: ...


@dataclasses.dataclass
class _GenRequest:
    request: Request
    state: dict[str, Any] = dataclasses.field(default_factory=dict)
    # queued (chunk_payload, final) pairs not yet consumed by step()
    pending: deque = dataclasses.field(default_factory=deque)


class GenerationEngine:
    def __init__(
        self,
        model: GenerationModel,
        max_batch_size: int = 1,
    ) -> None:
        self.model = model
        self.max_batch_size = max_batch_size
        self.waiting: deque[_GenRequest] = deque()
        self.requests: dict[str, _GenRequest] = {}

    def add_request(
        self,
        prompt,
        sampling_params: SamplingParams | None = None,
        request_id: str | None = None,
    ) -> str:
        from ht_vllm_omni_tpu.inputs import as_prompt

        p = as_prompt(prompt)
        request_id = request_id or f"gen-{len(self.requests)}"
        req = Request(
            request_id=request_id,
            prompt_token_ids=list(p.token_ids or []),
            sampling_params=sampling_params or SamplingParams(),
            prompt_embeds=p.embeds,
            additional_information=dict(p.additional_information),
            arrival_time=time.time(),
        )
        gr = _GenRequest(req)
        self.requests[request_id] = gr
        self.waiting.append(gr)
        return request_id

    def feed_chunk(
        self, request_id: str, chunk: dict[str, Any], final: bool
    ) -> None:
        """async-chunk path: queue an incoming chunk payload; step()
        consumes them in order (several chunks may land between steps)."""
        gr = self.requests.get(request_id)
        if gr is None:
            return
        gr.pending.append((chunk, final))
        gr.request.status = RequestStatus.WAITING
        if gr not in self.waiting:
            self.waiting.append(gr)

    def park_for_chunk(self, request_id: str) -> None:
        gr = self.requests.get(request_id)
        if gr is not None:
            gr.request.status = RequestStatus.WAITING_FOR_CHUNK

    def abort_request(self, request_id: str) -> None:
        gr = self.requests.pop(request_id, None)
        if gr is not None and gr in self.waiting:
            self.waiting.remove(gr)

    def has_unfinished_requests(self) -> bool:
        return any(
            gr.request.status
            in (RequestStatus.WAITING, RequestStatus.WAITING_FOR_CHUNK)
            for gr in self.requests.values()
        ) or bool(self.waiting)

    def step(self) -> list[OmniRequestOutput]:
        outputs: list[OmniRequestOutput] = []
        work: list[_GenRequest] = []
        while self.waiting and len(work) < self.max_batch_size:
            gr = self.waiting.popleft()
            req = gr.request
            if req.status == RequestStatus.WAITING_FOR_CHUNK:
                continue
            if gr.pending:
                chunk, final_flag = gr.pending.popleft()
                req.prompt_token_ids = list(chunk.get("token_ids") or [])
                req.prompt_embeds = chunk.get("prompt_embeds")
                req.additional_information.update(
                    chunk.get("additional_information") or {}
                )
                gr.state["final_chunk"] = final_flag
                gr.state["chunk_index"] = (
                    gr.state.get("chunk_index", -1) + 1
                )
            work.append(gr)

        # batched decode across requests when the model supports it
        # (reference's code2wav batching — bs-64 cut its E2E 13.5->9.5 s;
        # here one vmapped vocoder dispatch replaces per-request calls)
        results: list[tuple[dict, str | None]] | None = None
        run_batch = getattr(self.model, "run_batch", None)
        if run_batch is not None and len(work) > 1:
            try:
                results = [
                    (t, None)
                    for t in run_batch(
                        [
                            (
                                gr.request.prompt_token_ids or None,
                                gr.request.prompt_embeds,
                                gr.request.additional_information,
                                gr.state,
                            )
                            for gr in work
                        ]
                    )
                ]
            except Exception:  # per-item fallback keeps error isolation
                results = None
        if results is None:
            results = []
            for gr in work:
                req = gr.request
                try:
                    results.append((
                        self.model(
                            req.prompt_token_ids or None,
                            req.prompt_embeds,
                            req.additional_information,
                            gr.state,
                        ),
                        None,
                    ))
                except Exception as e:  # surfaced; stage survives
                    results.append(({}, f"{type(e).__name__}: {e}"))

        for gr, (tensors, error) in zip(work, results):
            req = gr.request
            chunked = "chunk_index" in gr.state
            final = (not chunked) or gr.state.get("final_chunk", False)
            if final or error:
                req.status = (
                    RequestStatus.FINISHED_ERROR
                    if error
                    else RequestStatus.FINISHED_STOPPED
                )
                self.requests.pop(req.request_id, None)
            elif gr.pending:
                req.status = RequestStatus.WAITING
                self.waiting.append(gr)  # more queued chunks to run
            else:
                req.status = RequestStatus.WAITING_FOR_CHUNK
            out = OmniRequestOutput(
                request_id=req.request_id,
                finished=bool(final or error),
                error=error,
                outputs=[
                    CompletionOutput(
                        index=0,
                        token_ids=[],
                        finish_reason="stop" if final else None,
                    )
                ],
            )
            out.merge_multimodal(tensors)
            outputs.append(out)
        return outputs
