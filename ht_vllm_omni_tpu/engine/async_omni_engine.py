"""Async facade over the pipeline orchestrator for online serving.

Counterpart of the reference AsyncOmniEngine + AsyncOmni (reference
vllm_omni/engine/async_omni_engine.py:202, entrypoints/async_omni.py:40):
a background thread pumps the synchronous orchestrator (the TPU step loop
must not run on the event loop), and per-request asyncio queues deliver
streaming outputs back to server handlers.
"""

from __future__ import annotations

import asyncio
import logging
import threading
import time
from typing import Any, AsyncGenerator, Sequence

from ht_vllm_omni_tpu.config.stage_config import PipelineConfig
from ht_vllm_omni_tpu.engine.orchestrator import (
    PipelineOrchestrator,
    StageHandle,
)
from ht_vllm_omni_tpu.outputs import OmniRequestOutput
from ht_vllm_omni_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


class AsyncOmniEngine:
    def __init__(
        self,
        pipeline: PipelineConfig,
        stages: Sequence[StageHandle],
        idle_sleep_s: float = 0.002,
    ) -> None:
        self.orchestrator = PipelineOrchestrator(pipeline, stages)
        self.pipeline = pipeline
        self._loop: asyncio.AbstractEventLoop | None = None
        self._queues: dict[str, asyncio.Queue] = {}
        self._lock = threading.Lock()
        self._idle_sleep_s = idle_sleep_s
        self._running = True
        self._thread = threading.Thread(
            target=self._pump, name="omni-orchestrator", daemon=True
        )
        self._started = False

    # ------------------------------------------------------------ lifecycle
    def start(self, loop: asyncio.AbstractEventLoop | None = None) -> None:
        if self._started:
            return
        self._loop = loop or asyncio.get_event_loop()
        self._started = True
        self._thread.start()

    def shutdown(self) -> None:
        self._running = False
        if self._started:
            self._thread.join(timeout=5)

    def _pump(self) -> None:
        while self._running:
            try:
                if not self.orchestrator.has_unfinished():
                    time.sleep(self._idle_sleep_s)
                    continue
                for out in self.orchestrator.step():
                    self._deliver(out)
            except Exception:
                logger.exception("orchestrator pump error")
                time.sleep(0.1)

    def _deliver(self, out: OmniRequestOutput) -> None:
        with self._lock:
            queue = self._queues.get(out.request_id)
        if queue is None or self._loop is None:
            return
        self._loop.call_soon_threadsafe(queue.put_nowait, out)

    # ------------------------------------------------------------ serving
    async def generate(
        self,
        prompt: Any,
        sampling_params: SamplingParams | Sequence[SamplingParams] | None = None,
        request_id: str | None = None,
    ) -> AsyncGenerator[OmniRequestOutput, None]:
        """Async stream of pipeline outputs for one request."""
        self.start(asyncio.get_running_loop())
        queue: asyncio.Queue = asyncio.Queue()
        external_id = request_id or f"req-{id(queue):x}-{time.monotonic_ns()}"
        with self._lock:
            self._queues[external_id] = queue
        completed = False
        try:
            self.orchestrator.add_request(
                prompt, sampling_params, request_id=external_id
            )
            while True:
                out = await queue.get()
                yield out
                if out.finished and out.final_output:
                    completed = True
                    break
                if out.error is not None:
                    completed = True
                    break
        finally:
            with self._lock:
                self._queues.pop(external_id, None)
            if not completed:
                # client disconnected mid-stream: abort so the pipeline
                # stops decoding and KV pages / decode slots are released
                try:
                    self.orchestrator.abort_request(external_id)
                except Exception:
                    logger.exception("abort on disconnect failed")

    async def abort(self, request_id: str) -> None:
        self.orchestrator.abort_request(request_id)

    def check_health(self) -> None:
        if not self._thread.is_alive() and self._started:
            raise RuntimeError("orchestrator thread died")


class AsyncOmni:
    """Thin client over AsyncOmniEngine (reference AsyncOmni surface)."""

    def __init__(self, engine: AsyncOmniEngine) -> None:
        self.engine = engine

    async def generate(self, prompt, sampling_params=None, request_id=None):
        async for out in self.engine.generate(
            prompt, sampling_params, request_id
        ):
            yield out

    async def abort(self, request_id: str) -> None:
        await self.engine.abort(request_id)
