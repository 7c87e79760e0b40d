"""Diffusion engine: request queue + denoise execution.

Counterpart of the reference DiffusionEngine + RequestScheduler (reference
vllm_omni/diffusion/diffusion_engine.py:55, diffusion/sched/): requests
queue FIFO, one runs at a time (reference _max_batch_size=1,
base_scheduler.py:16); step-wise execution yields streaming progress.
Duck-types the stage-engine interface so the orchestrator can pump it.
"""

from __future__ import annotations

import dataclasses
import logging
import time
from collections import deque
from typing import Any

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt, as_prompt
from ht_vllm_omni_tpu.outputs import CompletionOutput, OmniRequestOutput

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class _DiffRequest:
    request_id: str
    prompt: OmniPrompt
    params: DiffusionSamplingParams
    state: dict = dataclasses.field(default_factory=dict)
    arrival: float = dataclasses.field(default_factory=time.time)


def sampling_from_prompt(
    prompt: OmniPrompt, defaults: DiffusionSamplingParams | None = None
) -> DiffusionSamplingParams:
    """Build denoise params from request payload (API server passes size /
    steps / guidance via additional_information)."""
    info = prompt.additional_information or {}
    sp = defaults or DiffusionSamplingParams()
    size = info.get("size")
    if isinstance(size, str) and "x" in size:
        w, h = size.lower().split("x")
        sp = dataclasses.replace(sp, width=int(w), height=int(h))
    if info.get("num_inference_steps"):
        sp = dataclasses.replace(
            sp, num_inference_steps=int(info["num_inference_steps"])
        )
    if info.get("guidance_scale") is not None:
        sp = dataclasses.replace(
            sp, guidance_scale=float(info["guidance_scale"])
        )
    if info.get("seed") is not None:
        sp = dataclasses.replace(sp, seed=int(info["seed"]))
    if info.get("stream_every"):
        sp = dataclasses.replace(sp, stream_every=int(info["stream_every"]))
    return sp


class DiffusionEngine:
    def __init__(
        self,
        config: OmniDiffusionConfig,
        pipeline: Any | None = None,
        default_params: DiffusionSamplingParams | None = None,
    ) -> None:
        self.config = config
        # served multichip execution (reference DiffusionWorker.init_device
        # -> init_distributed_environment + initialize_model_parallel,
        # diffusion/worker/diffusion_worker.py:100-144): build the
        # cfg x sp x tp mesh from the config's parallel sizes so EVERY
        # request through this engine runs in-mesh
        self.parallel = None
        if config.parallel.world_size // config.parallel.data_parallel_size > 1:
            from ht_vllm_omni_tpu.diffusion.parallel import build_context

            self.parallel = build_context(
                config.parallel,
                fsdp_weights=getattr(config.parallel, "fsdp_weights", False),
            )
        if pipeline is None:
            from ht_vllm_omni_tpu.diffusion.registry import create_pipeline

            pipeline = create_pipeline(config, parallel=self.parallel)
        self.pipeline = pipeline
        self.default_params = default_params or DiffusionSamplingParams()
        self.waiting: deque[_DiffRequest] = deque()
        self.requests: dict[str, _DiffRequest] = {}

    # ------------------------------------------------ stage-engine duck type
    def add_request(
        self, prompt, sampling_params=None, request_id: str | None = None
    ) -> str:
        p = as_prompt(prompt)
        request_id = request_id or f"diff-{len(self.requests)}"
        if isinstance(sampling_params, DiffusionSamplingParams):
            sp = sampling_params
        else:
            sp = sampling_from_prompt(p, self.default_params)
        req = _DiffRequest(request_id, p, sp)
        self.requests[request_id] = req
        self.waiting.append(req)
        return request_id

    def generate_batch(
        self,
        prompts: list,
        sampling_params=None,
    ) -> list[OmniRequestOutput]:
        """Batch entrypoint (reference AsyncOmniDiffusion.generate_batch,
        entrypoints/async_omni_diffusion.py:175): text-encoder forwards
        batch across requests in ONE padded trunk dispatch when the
        pipeline supports it; denoising then runs per request (the
        engine's FIFO contract), so per-request seeds produce outputs
        identical to sequential generate calls."""
        ps = [as_prompt(p) for p in prompts]
        sp_list = (
            sampling_params
            if isinstance(sampling_params, (list, tuple))
            else [sampling_params] * len(ps)
        )
        enc = getattr(self.pipeline, "encode_text_batch", None)
        if enc is not None and len(ps) > 1:
            todo = [
                i for i, p in enumerate(ps)
                if p.embeds is None and p.text is not None
            ]
            if len(todo) > 1:
                embeds = enc([ps[i].text for i in todo])
                for i, e in zip(todo, embeds):
                    ps[i] = dataclasses.replace(ps[i], embeds=e)
        ids = [
            self.add_request(p, sp, request_id=f"diffb-{id(ps)}-{i}")
            for i, (p, sp) in enumerate(zip(ps, sp_list))
        ]
        results: dict[str, OmniRequestOutput] = {}
        while self.has_unfinished_requests():
            for out in self.step():
                if out.finished:
                    results[out.request_id] = out
        return [results[i] for i in ids]

    def abort_request(self, request_id: str) -> None:
        req = self.requests.pop(request_id, None)
        if req is not None and req in self.waiting:
            self.waiting.remove(req)

    def has_unfinished_requests(self) -> bool:
        return bool(self.waiting)

    def step(self) -> list[OmniRequestOutput]:
        if not self.waiting:
            return []
        req = self.waiting[0]
        p = req.prompt
        t_begin = time.time()
        try:
            if hasattr(self.pipeline, "generate_prompt"):
                # text-native pipelines (real families run their own
                # tokenizer + text encoder over the raw prompt)
                image, req.state = self.pipeline.generate_prompt(
                    p, req.params, stepwise_state=req.state
                )
            else:
                neg = p.negative_token_ids
                if neg is None and p.negative_text:
                    neg = [ord(c) % 256 for c in p.negative_text]
                token_ids = p.token_ids
                if token_ids is None and p.text is not None:
                    token_ids = [ord(c) % 256 for c in p.text]
                image, req.state = self.pipeline.generate(
                    token_ids,
                    req.params,
                    negative_token_ids=neg,
                    prompt_embeds=p.embeds,
                    stepwise_state=req.state,
                )
            error = None
        except Exception as e:
            logger.exception("diffusion request %s failed", req.request_id)
            image, error = None, f"{type(e).__name__}: {e}"
        finished = image is not None or error is not None
        if finished:
            self.waiting.popleft()
            self.requests.pop(req.request_id, None)
        out = OmniRequestOutput(
            request_id=req.request_id,
            finished=finished,
            error=error,
            outputs=[
                CompletionOutput(
                    index=0, token_ids=[],
                    finish_reason="stop" if finished else None,
                )
            ],
        )
        if image is not None:
            if isinstance(image, dict):
                # audio families return {"audio", "sample_rate"} payloads
                out.multimodal_output.update(image)
            else:
                # 4-D output = video frames [F, H, W, 3] (wan_video family)
                key = "video" if getattr(image, "ndim", 3) == 4 else "image"
                out.multimodal_output[key] = image
        out.metrics["denoise_step"] = req.state.get("step", 0)
        # per-pipeline-stage durations (reference
        # diffusion_pipeline_profiler.py stage_durations in outputs)
        durs = req.state.setdefault("_durations", [])
        durs.append(time.time() - t_begin)
        out.metrics["stage_durations"] = {
            "denoise_s": round(sum(durs), 4),
            "calls": len(durs),
            "queue_s": round(t_begin - req.arrival, 4),
        }
        return [out]
