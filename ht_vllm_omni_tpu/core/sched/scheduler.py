"""Continuous-batching scheduler for AR stages.

From-scratch TPU-shaped rebuild of the vLLM v1 scheduler semantics the
reference extends (reference vllm_omni/core/sched/omni_ar_scheduler.py:41):
token-budget scheduling with chunked prefill, page allocation on demand,
preempt-by-recompute under memory pressure.  Differences from the CUDA
original: the schedule is shaped for fixed-slot XLA programs — at most
``max_num_seqs`` concurrent sequences, each decode step schedules every
running request (one token each), and prefill chunks are capped so the
runner can bucket them into a handful of compiled shapes.
"""

from __future__ import annotations

import dataclasses
from collections import deque

from ht_vllm_omni_tpu.config import CacheConfig, SchedulerConfig
from ht_vllm_omni_tpu.core.block_pool import NoFreePagesError, PagePool
from ht_vllm_omni_tpu.core.request import Request, RequestStatus
from ht_vllm_omni_tpu.utils import cdiv


@dataclasses.dataclass
class ScheduledWork:
    """One request's work item for this step."""

    request: Request
    # tokens to run this step: >1 => prefill chunk, ==1 => decode (or the
    # final single-token chunk of a prefill)
    num_new_tokens: int
    is_prefill: bool


@dataclasses.dataclass
class SchedulerOutput:
    prefills: list[ScheduledWork]
    decodes: list[ScheduledWork]

    @property
    def num_scheduled_tokens(self) -> int:
        return sum(
            w.num_new_tokens for w in self.prefills + self.decodes
        )

    @property
    def is_empty(self) -> bool:
        return not self.prefills and not self.decodes


class Scheduler:
    """Waiting/running queues + page accounting."""

    def __init__(
        self,
        scheduler_config: SchedulerConfig,
        cache_config: CacheConfig,
        num_pages: int,
        num_groups: int = 1,
        group_fn=None,
    ) -> None:
        """``num_groups``/``group_fn``: with a dp-sharded cache the page
        pool is partitioned per dp group (see core/block_pool.py) and
        ``group_fn(request)`` — typically the runner's slot->dp-owner map —
        picks the group a request allocates from, assigned once at every
        waiting->running admission."""
        self.config = scheduler_config
        self.cache_config = cache_config
        self.page_size = cache_config.page_size
        self.pool = PagePool(num_pages, num_groups)
        self._group_fn = group_fn or (lambda req: 0)
        self.prefix_cache = None
        if scheduler_config.enable_prefix_caching:
            from ht_vllm_omni_tpu.core.prefix_cache import PrefixCache

            self.prefix_cache = PrefixCache(self.pool, self.page_size)
        self.waiting: deque[Request] = deque()
        self.running: list[Request] = []
        self.requests: dict[str, Request] = {}
        self.finished: list[Request] = []
        # preemptions since the last step_plan (engine releases their slots)
        self.newly_preempted: list[Request] = []

    # ------------------------------------------------------------- queue ops
    def add_request(self, request: Request) -> None:
        if request.num_prompt_tokens + request.sampling_params.max_tokens > (
            self.config.max_model_len
        ):
            request.sampling_params.max_tokens = max(
                1, self.config.max_model_len - request.num_prompt_tokens
            )
        self.requests[request.request_id] = request
        self.waiting.append(request)

    def admit_running_with_kv(self, request: Request, horizon: int) -> None:
        """Admit a request whose prompt KV arrives pre-computed (PD
        disaggregation import): allocate pages covering the prompt +
        horizon and place it straight into running (prefill-complete)."""
        needed = cdiv(
            min(
                request.num_prompt_tokens + max(horizon, 1),
                self.config.max_model_len,
            ),
            self.page_size,
        )
        request.pool_group = self._group_fn(request)
        request.page_ids = self.pool.allocate(needed, request.pool_group)
        request.num_computed_tokens = request.num_prompt_tokens
        request.status = RequestStatus.RUNNING
        self.requests[request.request_id] = request
        self.running.append(request)

    def abort_request(self, request_id: str) -> None:
        req = self.requests.get(request_id)
        if req is None or req.status.finished:
            return
        self._finish(req, RequestStatus.FINISHED_ABORTED)

    def has_unfinished(self) -> bool:
        return bool(self.waiting or self.running)

    # ------------------------------------------------------------- schedule
    def schedule(self) -> SchedulerOutput:
        budget = self.config.max_num_batched_tokens
        decodes: list[ScheduledWork] = []
        prefills: list[ScheduledWork] = []

        # 1) running requests.  Requests mid-prefill continue their chunks;
        #    fully-prefilled requests decode one token.
        for req in list(self.running):
            if req.status != RequestStatus.RUNNING:
                continue  # preempted by an earlier request's page demand
            if req.prefill_done:
                num_new = 1
            else:
                num_new = min(
                    req.num_prompt_tokens - req.num_computed_tokens,
                    self.config.effective_prefill_chunk,
                    max(budget, 1),
                )
            if not self._ensure_pages(req, req.num_computed_tokens + num_new):
                continue  # req was preempted (or others were; retry next step)
            budget -= num_new
            work = ScheduledWork(req, num_new, not req.prefill_done)
            (prefills if work.is_prefill else decodes).append(work)
            if budget <= 0:
                break

        # 2) admit waiting requests.
        while (
            self.waiting
            and budget > 0
            and len(self.running) < self.config.max_num_seqs
        ):
            req = self.waiting[0]
            if req.status == RequestStatus.WAITING_FOR_CHUNK:
                break  # parked until its upstream chunk arrives
            num_new = min(
                req.num_prompt_tokens - req.num_computed_tokens,
                self.config.effective_prefill_chunk,
                budget,
            )
            if num_new <= 0:
                break
            req.pool_group = self._group_fn(req)
            needed = cdiv(
                req.num_computed_tokens + num_new, self.page_size
            ) - len(req.page_ids)
            if needed > self.pool.free_in_group(req.pool_group):
                break  # don't preempt running work to admit new work
            if needed:
                req.page_ids.extend(
                    self.pool.allocate(needed, req.pool_group)
                )
            self.waiting.popleft()
            req.status = RequestStatus.RUNNING
            self.running.append(req)
            budget -= num_new
            prefills.append(ScheduledWork(req, num_new, True))

        return SchedulerOutput(prefills=prefills, decodes=decodes)

    def _ensure_pages(self, req: Request, target_tokens: int) -> bool:
        """Grow req's page list to cover target_tokens; preempt on pressure.

        Returns False if ``req`` itself got preempted.
        """
        # decode-horizon look-ahead must never allocate past the model-len
        # cap: the runner's per-slot block table is exactly
        # cdiv(max_model_len, page_size) wide, and _check_stop finishes
        # the request at max_model_len anyway
        target_tokens = min(target_tokens, self.config.max_model_len)
        g = req.pool_group
        needed = cdiv(target_tokens, self.page_size) - len(req.page_ids)
        if needed <= 0:
            return True
        free = self.pool.free_in_group(g)
        if self.prefix_cache is not None and needed > free:
            self.prefix_cache.evict(needed - free, group=g)
        while needed > self.pool.free_in_group(g):
            # preempt from the back, same pool group only — freeing pages
            # from another dp group's partition would not help this request
            victim = next(
                (
                    r
                    for r in reversed(self.running)
                    if r.pool_group == g
                ),
                req,
            )
            self._preempt(victim)
            if victim is req:
                return False
        try:
            req.page_ids.extend(self.pool.allocate(needed, g))
        except NoFreePagesError:
            self._preempt(req)
            return False
        return True

    def _preempt(self, req: Request) -> None:
        self.running.remove(req)
        self.pool.free(req.page_ids)
        req.page_ids = []
        # recompute-style preemption: prompt grows by emitted tokens and
        # everything is prefetched again on resume.
        req.prompt_token_ids = req.all_token_ids
        req.output_token_ids = []
        req.num_computed_tokens = 0
        req.num_preemptions += 1
        req.status = RequestStatus.PREEMPTED
        self.waiting.appendleft(req)
        self.newly_preempted.append(req)

    # ------------------------------------------- horizon (multi-step) API
    def step_plan(
        self, horizon: int
    ) -> tuple[list[tuple[Request, int, int]], list[Request]]:
        """Plan one engine iteration with a K-token decode horizon.

        Returns (prefill_works, decode_reqs):
        - prefill_works: (request, start, num_tokens) prompt chunks to run
          now — a whole prompt when it fits the chunk budget, otherwise
          successive chunked-prefill pieces (paged context attention);
        - decode_reqs: running prefill-complete requests whose pages now
          cover num_computed + horizon (preempting from the back on
          pressure).
        """
        self.newly_preempted = []
        chunk_cap = self.config.effective_prefill_chunk
        decode_reqs: list[Request] = []
        prefill_works: list[tuple[Request, int, int]] = []
        budget = self.config.max_num_batched_tokens

        for req in list(self.running):
            if req.status != RequestStatus.RUNNING:
                continue
            if req.prefill_done:
                if self._ensure_pages(
                    req, req.num_computed_tokens + horizon
                ):
                    decode_reqs.append(req)
            else:
                # continue a chunked prefill
                num = min(
                    req.num_prompt_tokens - req.num_computed_tokens,
                    chunk_cap,
                    max(budget, 1),
                )
                target = req.num_computed_tokens + num
                if target >= req.num_prompt_tokens:
                    target = req.num_prompt_tokens + horizon
                if self._ensure_pages(req, target):
                    prefill_works.append(
                        (req, req.num_computed_tokens, num)
                    )
                    budget -= num

        while (
            self.waiting
            and budget > 0
            and len(self.running) < self.config.max_num_seqs
        ):
            req = self.waiting[0]
            if req.status == RequestStatus.WAITING_FOR_CHUNK:
                break
            req.pool_group = self._group_fn(req)
            g = req.pool_group
            if (
                self.prefix_cache is not None
                and req.num_computed_tokens == 0
                and not req.page_ids
                and self._prefix_cacheable(req)
            ):
                matched = self.prefix_cache.match(
                    req.prompt_token_ids, group=g
                )
                if matched:
                    req.page_ids = matched
                    req.num_computed_tokens = len(matched) * self.page_size
            remaining = req.num_prompt_tokens - req.num_computed_tokens
            num_new = min(remaining, chunk_cap, budget)
            if num_new < remaining and prefill_works:
                break  # big prompt: wait for a clean slot to chunk through
            target = req.num_computed_tokens + num_new
            if target >= req.num_prompt_tokens:
                target = req.num_prompt_tokens + horizon
            target = min(target, self.config.max_model_len)
            needed = cdiv(target, self.page_size) - len(req.page_ids)
            free = self.pool.free_in_group(g)
            if needed > free and self.prefix_cache is not None:
                self.prefix_cache.evict(needed - free, group=g)
            if needed > self.pool.free_in_group(g):
                break
            if needed > 0:
                req.page_ids.extend(self.pool.allocate(needed, g))
            self.waiting.popleft()
            req.status = RequestStatus.RUNNING
            self.running.append(req)
            budget -= num_new
            prefill_works.append(
                (req, req.num_computed_tokens, num_new)
            )
        return prefill_works, decode_reqs

    @staticmethod
    def _prefix_cacheable(req: Request) -> bool:
        # only pure token prompts are content-addressable
        return (
            req.prompt_embeds is None
            and not req.additional_information.get("mm_embeds")
        )

    def register_prefix(self, req: Request) -> None:
        """Publish a prefill-complete request's prompt pages for reuse."""
        if self.prefix_cache is not None and self._prefix_cacheable(req):
            self.prefix_cache.register(
                req.prompt_token_ids, req.page_ids, group=req.pool_group
            )

    def apply_decoded(
        self, req: Request, tokens: list[int], includes_entry: bool = False
    ) -> RequestStatus | None:
        """Fold a chunk's sampled tokens into ``req``; returns the finish
        status if the request completed.  The device applied the same stop
        rule, so ``tokens`` normally ends exactly at the stop token."""
        finished: RequestStatus | None = None
        accepted = 0
        for token in tokens:
            req.output_token_ids.append(token)
            accepted += 1
            finished = self._check_stop(req, token)
            if finished is not None:
                break
        # One device step ran per accepted token (each step writes the KV
        # of its *input* token) — except a chunk-entry token (prefill
        # sample), which was produced without a decode step.
        req.num_computed_tokens += max(accepted - int(includes_entry), 0)
        if finished is not None:
            self._finish(req, finished)
        return finished

    # --------------------------------------------------- post-step update
    def update_from_output(
        self,
        output: SchedulerOutput,
        sampled: dict[str, int],
    ) -> list[Request]:
        """Apply step results; returns requests that finished this step.

        ``sampled`` maps request_id -> next token for every request whose
        prefill completed this step or that decoded.
        """
        newly_finished: list[Request] = []
        for work in output.prefills + output.decodes:
            req = work.request
            if req.status != RequestStatus.RUNNING:
                continue  # preempted/aborted between schedule and update
            req.num_computed_tokens += work.num_new_tokens
            token = sampled.get(req.request_id)
            if token is None:
                continue  # mid-prefill chunk: nothing sampled yet
            req.output_token_ids.append(token)
            reason = self._check_stop(req, token)
            if reason is not None:
                self._finish(req, reason)
                newly_finished.append(req)
        return newly_finished

    def _check_stop(self, req: Request, token: int) -> RequestStatus | None:
        sp = req.sampling_params
        if req.num_output_tokens >= sp.max_tokens:
            return RequestStatus.FINISHED_LENGTH
        if req.num_tokens >= self.config.max_model_len:
            return RequestStatus.FINISHED_LENGTH
        if req.num_output_tokens >= sp.min_tokens:
            if not sp.ignore_eos and token in sp.stop_token_ids:
                return RequestStatus.FINISHED_STOPPED
        return None

    def _finish(self, req: Request, status: RequestStatus) -> None:
        req.status = status
        if req in self.running:
            self.running.remove(req)
        elif req in self.waiting:
            self.waiting.remove(req)
        if req.page_ids and not req.needs_kv_transfer:
            self.pool.free(req.page_ids)
            req.page_ids = []
        self.finished.append(req)

    def free_transferred(self, request_id: str) -> None:
        """Release pages held for KV extraction (the transfer manager's
        ack; reference kv_extracted_req_ids handling)."""
        req = self.requests.get(request_id)
        if req is not None and req.page_ids:
            self.pool.free(req.page_ids)
            req.page_ids = []

    # decode bookkeeping for the runner: tokens whose KV the runner must
    # write this step live at positions [num_computed, num_computed+n).
