"""Multi-stage pipeline orchestrator (single-controller).

Counterpart of the reference Orchestrator (reference
vllm_omni/engine/orchestrator.py:108), re-shaped for TPU: all stages live
in ONE process sharing one jax runtime (no per-stage EngineCoreProc /
ZMQ), so the "DAG pump" is a plain synchronous step loop — each tick steps
every stage that has work and routes finished stage outputs to downstream
stages (reference _route_output/_forward_to_next_stage semantics).
AsyncOmniEngine wraps this in a background thread for serving.
"""

from __future__ import annotations

import copy
import dataclasses
import itertools
import logging
import os
import time
from typing import Any, Sequence

from ht_vllm_omni_tpu.config.stage_config import PipelineConfig, StageConfig
from ht_vllm_omni_tpu.inputs import OmniPrompt, as_prompt
from ht_vllm_omni_tpu.metrics import OrchestratorAggregator
from ht_vllm_omni_tpu.models.stage_input_processors import (
    resolve,
    resolve_optional,
)
from ht_vllm_omni_tpu.outputs import OmniRequestOutput
from ht_vllm_omni_tpu.sampling_params import SamplingParams

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class StageHandle:
    """A live stage: config + its engine (LLMEngine / GenerationEngine /
    DiffusionEngine adapter)."""

    config: StageConfig
    engine: Any  # duck-typed: add_request / step / has_unfinished_requests

    def has_work(self) -> bool:
        return self.engine.has_unfinished_requests()


@dataclasses.dataclass
class _ChunkEdgeState:
    """Per-request per-chunked-edge streaming progress."""

    sent_tokens: int = 0
    chunk_index: int = 0
    final_sent: bool = False
    next_poll_index: int = 0


@dataclasses.dataclass
class _RequestState:
    external_id: str
    sampling_params: list[SamplingParams | None]
    client_outputs: list[OmniRequestOutput] = dataclasses.field(
        default_factory=list
    )
    finished: bool = False
    start_time: float = dataclasses.field(default_factory=time.time)
    # stage_id -> upstream outputs already forwarded
    forwarded: set = dataclasses.field(default_factory=set)
    # (from_stage, to_stage) -> chunk progress
    chunks: dict = dataclasses.field(default_factory=dict)
    # accumulated multimodal stream for client events (the reference's
    # MultimodalOutputProcessor accumulation, output_processor.py:24)
    mm_accum: dict = dataclasses.field(default_factory=dict)
    # CFG companion tracking (reference CfgCompanionTracker,
    # entrypoints/cfg_companion_tracker.py:24): role -> companion id,
    # completed companion ids, and the parent output deferred while its
    # companions are still decoding.
    companion_roles: dict = dataclasses.field(default_factory=dict)
    companions_done: set = dataclasses.field(default_factory=set)
    deferred: tuple | None = None  # (from_cfg, out)
    deferred_since: float = 0.0


class PipelineOrchestrator:
    def __init__(
        self,
        pipeline: PipelineConfig,
        stages: Sequence[StageHandle],
    ) -> None:
        from ht_vllm_omni_tpu.distributed.connectors import (
            OmniConnectorFactory,
        )

        from ht_vllm_omni_tpu.distributed.kv_transfer import (
            OmniKVTransferManager,
        )

        self.pipeline = pipeline
        self.stages = {h.config.stage_id: h for h in stages}
        self.requests: dict[str, _RequestState] = {}
        self.stats = OrchestratorAggregator()
        self._counter = itertools.count()
        self._final_ids = set(pipeline.final_stage_ids())
        # CFG companions: companion id -> parent external id
        self._companion_to_parent: dict[str, str] = {}
        self._cfg_timeout = float(
            os.environ.get("OMNI_CFG_PENDING_TIMEOUT_S", "120")
        )
        # async-chunk plumbing: chunked edges + their connectors
        self._chunk_edges: dict[int, list] = {}
        self._connectors: dict[str, Any] = {}
        self._default_connector = OmniConnectorFactory.create(
            "InMemoryConnector"
        )
        self._kv_manager = OmniKVTransferManager(self._default_connector)
        for edge in pipeline.edges:
            if edge.window_size and edge.window_size > 0:
                self._chunk_edges.setdefault(edge.from_stage, []).append(edge)
                if edge.connector and edge.connector not in self._connectors:
                    spec = pipeline.connectors[edge.connector]
                    self._connectors[edge.connector] = (
                        OmniConnectorFactory.create(spec.name, **spec.extra)
                    )

    def _edge_connector(self, edge) -> Any:
        if edge.connector is None:
            return self._default_connector
        return self._connectors[edge.connector]

    def _edge_left_context(self, edge) -> int:
        if edge.connector is not None:
            spec = self.pipeline.connectors[edge.connector]
            return int(spec.extra.get("codec_left_context_frames", 0))
        return 0

    # ------------------------------------------------------------- intake
    def add_request(
        self,
        prompt: str | list[int] | OmniPrompt,
        sampling_params: SamplingParams | Sequence[SamplingParams] | None = None,
        request_id: str | None = None,
    ) -> str:
        external_id = request_id or f"omni-{next(self._counter)}"
        n = len(self.stages)
        if sampling_params is None or isinstance(
            sampling_params, SamplingParams
        ):
            sp_list: list[SamplingParams | None] = [sampling_params] * n
        else:
            sp_list = list(sampling_params) + [None] * (
                n - len(sampling_params)
            )
        state = _RequestState(external_id, sp_list)
        self.requests[external_id] = state
        self.stats.on_request(external_id)
        stage0 = self.stages[0]
        stage0.engine.add_request(
            as_prompt(prompt),
            self._stage_sampling_params(stage0.config, sp_list[0]),
            request_id=self._internal_id(external_id, 0),
        )
        self._expand_cfg_companions(state, stage0, prompt, sp_list[0])
        # async-chunk: pre-arm downstream stages so their requests exist,
        # parked, before the first chunk lands (reference
        # _prewarm_async_chunk_stages, orchestrator.py:627-689 — this is
        # what turns TTFP from ~6.5 s into ~0.5 s on Qwen3-Omni).
        for from_sid, edges in self._chunk_edges.items():
            for edge in edges:
                state.chunks[(from_sid, edge.to_stage)] = _ChunkEdgeState()
                target = self.stages[edge.to_stage]
                if hasattr(target.engine, "park_for_chunk"):
                    rid = self._internal_id(external_id, edge.to_stage)
                    target.engine.add_request(
                        OmniPrompt(token_ids=[]),
                        self._stage_sampling_params(
                            target.config, sp_list[edge.to_stage]
                        ),
                        request_id=rid,
                    )
                    target.engine.park_for_chunk(rid)
        return external_id

    # -------------------------------------------------- CFG companions
    def _expand_cfg_companions(
        self, state: _RequestState, stage0: StageHandle, prompt,
        sp0: SamplingParams | None,
    ) -> None:
        """Expand the stage-0 prompt into CFG companion requests
        (reference _enqueue_cfg_companions, async_omni_engine.py:718):
        each companion decodes as a shadow request on stage 0; its KV is
        exported per downstream edge on finish, and the parent's forward
        to the next stage defers until every companion is done."""
        expand = resolve_optional(
            stage0.config.custom_prompt_expand_func
        )
        if expand is None:
            return
        params = self._stage_sampling_params(stage0.config, sp0)
        try:
            expanded = expand(as_prompt(prompt), params)
        except Exception:
            logger.exception(
                "prompt_expand_func failed for req %s", state.external_id
            )
            return
        for ep in expanded or []:
            cid = f"{state.external_id}{ep.request_id_suffix}"
            state.companion_roles[ep.role] = cid
            self._companion_to_parent[cid] = state.external_id
            rid = self._internal_id(cid, 0)
            stage0.engine.add_request(
                as_prompt(ep.prompt), copy.deepcopy(params), request_id=rid
            )
            # hold the companion's pages past finish so its KV can be
            # extracted (reference defers block frees until the transfer
            # acks, omni_ar_scheduler.py:454-479)
            if hasattr(stage0.engine, "scheduler"):
                stage0.engine.scheduler.requests[rid].needs_kv_transfer = (
                    True
                )
        if state.companion_roles:
            logger.info(
                "CFG expansion for req %s: %d companions",
                state.external_id, len(state.companion_roles),
            )

    def _all_companions_done(self, state: _RequestState) -> bool:
        return all(
            cid in state.companions_done
            for cid in state.companion_roles.values()
        )

    def _fail_parent(
        self, state: _RequestState, message: str,
        client_outputs: list[OmniRequestOutput],
    ) -> None:
        """A companion failed (or timed out): the parent cannot run CFG —
        abort it and surface the error (reference on_companion_error,
        cfg_companion_tracker.py:113)."""
        logger.error("req %s: %s", state.external_id, message)
        state.deferred = None
        for sid, handle in self.stages.items():
            handle.engine.abort_request(
                self._internal_id(state.external_id, sid)
            )
        for cid in state.companion_roles.values():
            if cid not in state.companions_done:
                self.stages[0].engine.abort_request(
                    self._internal_id(cid, 0)
                )
            self._companion_to_parent.pop(cid, None)
        state.finished = True
        self.stats.on_finish(state.external_id)
        client_outputs.append(
            OmniRequestOutput(
                request_id=state.external_id, finished=True, error=message
            )
        )

    def _route_companion(
        self, handle: StageHandle, cid: str, parent_id: str,
        out: OmniRequestOutput, client_outputs: list[OmniRequestOutput],
    ) -> None:
        """Companion outputs never reach the client and never forward;
        on finish the branch KV is exported for downstream collection
        (reference _route_output companion arm, orchestrator.py:313-337)."""
        state = self.requests.get(parent_id)
        if state is None or state.finished:
            self._companion_to_parent.pop(cid, None)
            return
        if out.error is not None:
            self._fail_parent(
                state, f"CFG companion {cid} failed: {out.error}",
                client_outputs,
            )
            return
        if not out.finished:
            return
        sid = handle.config.stage_id
        try:
            if hasattr(handle.engine, "scheduler"):
                payload = self._kv_manager.extract(
                    handle.engine, self._internal_id(cid, sid)
                )
                comp = out.outputs[0] if out.outputs else None
                payload.extra = {
                    "token_ids": list(comp.token_ids) if comp else [],
                    "hidden_states": (
                        comp.hidden_states if comp else None
                    ),
                }
                for next_sid in self.pipeline.downstream_of(sid):
                    self._kv_manager.put(sid, next_sid, cid, payload)
        except Exception as e:
            self._fail_parent(
                state, f"CFG KV extract failed for {cid}: {e}",
                client_outputs,
            )
            return
        state.companions_done.add(cid)
        self._companion_to_parent.pop(cid, None)
        if state.deferred is not None and self._all_companions_done(state):
            from_cfg, parent_out = state.deferred
            state.deferred = None
            state.forwarded.add((from_cfg.stage_id,))
            self._forward_to_next_stages(state, from_cfg, parent_out)

    def _check_cfg_timeouts(
        self, client_outputs: list[OmniRequestOutput]
    ) -> None:
        now = time.time()
        for state in list(self.requests.values()):
            if state.deferred is not None and (
                now - state.deferred_since > self._cfg_timeout
            ):
                self._fail_parent(
                    state,
                    "timed out waiting for CFG companions "
                    f"(>{self._cfg_timeout:.0f}s)",
                    client_outputs,
                )

    def abort_request(self, external_id: str) -> None:
        state = self.requests.pop(external_id, None)
        if state is None:
            return
        for sid, handle in self.stages.items():
            handle.engine.abort_request(self._internal_id(external_id, sid))
        for cid in state.companion_roles.values():
            self._companion_to_parent.pop(cid, None)
            self.stages[0].engine.abort_request(self._internal_id(cid, 0))

    def _internal_id(self, external_id: str, stage_id: int) -> str:
        return f"{external_id}/s{stage_id}"

    @staticmethod
    def _external_id(internal_id: str) -> tuple[str, int]:
        base, _, suffix = internal_id.rpartition("/s")
        return base, int(suffix)

    def _stage_sampling_params(
        self, cfg: StageConfig, sp: SamplingParams | None
    ) -> SamplingParams:
        if sp is not None:
            return sp
        defaults = dict(cfg.default_sampling_params)
        defaults.pop("detokenize", None)
        known = {
            f.name for f in dataclasses.fields(SamplingParams)
        }
        kwargs = {k: v for k, v in defaults.items() if k in known}
        if kwargs.get("top_k", 0) in (-1, None):
            kwargs["top_k"] = 0
        params = SamplingParams(**kwargs)
        # non-final AR stages that feed embeds downstream capture hiddens
        if cfg.worker_type == "ar" and not cfg.final_output:
            params.return_hidden_states = True
        return params

    # ------------------------------------------------------------- pump
    def has_unfinished(self) -> bool:
        return any(not s.finished for s in self.requests.values())

    def step(self) -> list[OmniRequestOutput]:
        """One pipeline tick; returns client-facing outputs."""
        client_outputs: list[OmniRequestOutput] = []
        self._check_cfg_timeouts(client_outputs)
        self._poll_pending_chunks()
        for sid in sorted(self.stages):
            handle = self.stages[sid]
            if not handle.has_work():
                continue
            for out in handle.engine.step():
                self._route(handle, out, client_outputs)
        return client_outputs

    # ------------------------------------------------------- async-chunk
    def _chunk_key(self, external_id: str, from_sid: int, index: int) -> str:
        # reference key scheme: {external_req_id}_{stage}_{chunk}
        # (chunk_transfer_adapter.py:131)
        return f"{external_id}_{from_sid}_{index}"

    def _emit_chunks(
        self, state: _RequestState, from_cfg: StageConfig,
        out: OmniRequestOutput,
    ) -> None:
        """Producer side: slice newly decoded tokens into window-sized
        chunks (with left context) and put them on the edge connector."""
        comp = out.outputs[0] if out.outputs else None
        if comp is None:
            return
        tokens = comp.token_ids
        for edge in self._chunk_edges.get(from_cfg.stage_id, []):
            cs: _ChunkEdgeState = state.chunks[
                (from_cfg.stage_id, edge.to_stage)
            ]
            if cs.final_sent:
                continue
            left = self._edge_left_context(edge)
            conn = self._edge_connector(edge)
            fn = resolve(from_cfg.custom_process_next_stage_input_func)
            while True:
                remaining = len(tokens) - cs.sent_tokens
                if remaining >= edge.window_size:
                    take = edge.window_size
                    final = out.finished and (remaining == take)
                elif out.finished and remaining > 0:
                    take = remaining
                    final = True
                elif out.finished and cs.chunk_index > 0:
                    # everything already flushed: empty final marker
                    take = 0
                    final = True
                else:
                    break
                start = max(0, cs.sent_tokens - left)
                stop = cs.sent_tokens + take
                delta = dataclasses.replace(
                    out,
                    outputs=[
                        dataclasses.replace(
                            comp,
                            token_ids=list(tokens[start:stop]),
                            hidden_states=(
                                comp.hidden_states[start:stop]
                                if comp.hidden_states is not None
                                else None
                            ),
                        )
                    ],
                )
                prompt = fn(delta, from_cfg, self.stages[edge.to_stage].config)
                payload = {
                    "token_ids": prompt.token_ids,
                    "prompt_embeds": prompt.embeds,
                    "additional_information": {
                        **prompt.additional_information,
                        "chunk_index": cs.chunk_index,
                        "new_tokens": take,
                        "left_context": cs.sent_tokens - start,
                    },
                    "final": final,
                }
                conn.put(
                    from_cfg.stage_id,
                    edge.to_stage,
                    self._chunk_key(
                        state.external_id, from_cfg.stage_id, cs.chunk_index
                    ),
                    payload,
                )
                cs.sent_tokens += take
                cs.chunk_index += 1
                if final:
                    cs.final_sent = True
                    break

    def _poll_pending_chunks(self) -> None:
        """Consumer side: deliver arrived chunks to parked requests."""
        for state in list(self.requests.values()):
            for (from_sid, to_sid), cs in state.chunks.items():
                edge = self.pipeline.edge(from_sid, to_sid)
                conn = self._edge_connector(edge)
                target = self.stages[to_sid]
                while True:
                    key = self._chunk_key(
                        state.external_id, from_sid, cs.next_poll_index
                    )
                    payload, _ = conn.get(from_sid, to_sid, key)
                    if payload is None:
                        break
                    cs.next_poll_index += 1
                    target.engine.feed_chunk(
                        self._internal_id(state.external_id, to_sid),
                        payload,
                        payload.get("final", False),
                    )

    def _route(
        self,
        handle: StageHandle,
        out: OmniRequestOutput,
        client_outputs: list[OmniRequestOutput],
    ) -> None:
        cfg = handle.config
        external_id, sid = self._external_id(out.request_id)
        parent_id = self._companion_to_parent.get(external_id)
        if parent_id is not None:
            out.request_id = external_id
            self._route_companion(
                handle, external_id, parent_id, out, client_outputs
            )
            return
        state = self.requests.get(external_id)
        if state is None:
            return  # aborted
        out.stage_id = sid
        out.request_id = external_id
        is_final_stage = sid in self._final_ids

        est = self.stats.get(external_id)
        if est is not None:
            ss = est.stage(sid)
            if out.outputs:
                ss.tokens_out = max(ss.tokens_out, len(out.outputs[0].token_ids))
            if is_final_stage and not est.first_final_output_time:
                est.first_final_output_time = time.time()
            if out.finished:
                ss.finish_time = time.time()

        # stream client-facing events: final-stage outputs always;
        # comprehension-stage (thinker) text streams too.  Final-stage
        # multimodal tensors accumulate across events so consumers always
        # see the cumulative stream (list-append; scalars latest-wins).
        if is_final_stage or cfg.is_comprehension:
            out.final_output = is_final_stage
            if is_final_stage and out.multimodal_output:
                acc = state.mm_accum
                for key, val in out.multimodal_output.items():
                    vals = val if isinstance(val, list) else [val]
                    import numpy as _np

                    for v in vals:
                        if _np.isscalar(v) or (
                            isinstance(v, _np.ndarray) and v.ndim == 0
                        ):
                            acc[key] = v
                        else:
                            acc.setdefault(key, [])
                            if not isinstance(acc[key], list):
                                acc[key] = [acc[key]]
                            acc[key].append(v)
                out.multimodal_output = {
                    k: (list(v) if isinstance(v, list) else v)
                    for k, v in acc.items()
                }
            client_outputs.append(out)

        if sid in self._chunk_edges:
            self._emit_chunks(state, cfg, out)

        if out.finished and not is_final_stage and out.error is None:
            key = (sid,)
            if key not in state.forwarded:
                if (
                    sid == 0
                    and state.companion_roles
                    and not self._all_companions_done(state)
                ):
                    # defer until every CFG companion's KV has landed
                    # (reference _deferred_parents, orchestrator.py:360)
                    state.deferred = (cfg, out)
                    state.deferred_since = time.time()
                else:
                    state.forwarded.add(key)
                    self._forward_to_next_stages(state, cfg, out)
        if out.finished and (is_final_stage or out.error is not None):
            state.finished = True
            self.stats.on_finish(external_id)
        if out.error is not None:
            out.finished = True
            state.finished = True
            if out not in client_outputs:
                client_outputs.append(out)

    def _forward_to_next_stages(
        self,
        state: _RequestState,
        from_cfg: StageConfig,
        out: OmniRequestOutput,
    ) -> None:
        chunked_targets = {
            e.to_stage for e in self._chunk_edges.get(from_cfg.stage_id, [])
        }
        for next_sid in self.pipeline.downstream_of(from_cfg.stage_id):
            if next_sid in chunked_targets:
                continue  # fed incrementally via the chunk connector
            next_handle = self.stages[next_sid]
            fn = resolve(from_cfg.custom_process_next_stage_input_func)
            restored = dataclasses.replace(out)
            prompt = fn(restored, from_cfg, next_handle.config)
            if state.companion_roles and from_cfg.stage_id == 0:
                # attach branch ids + (via the model's collect hook) the
                # per-branch KV payloads (reference forward_parent_with_cfg
                # cfg_kv_request_ids, cfg_companion_tracker.py:203, and
                # receive_multi_kv_cache, kv_transfer_manager.py:488)
                prompt.additional_information["cfg_kv_request_ids"] = dict(
                    state.companion_roles
                )
                collect = resolve_optional(
                    next_handle.config.custom_cfg_kv_collect_func
                )
                if collect is not None:
                    prompt.additional_information.update(
                        collect(
                            state.external_id,
                            dict(state.companion_roles),
                            self._kv_manager,
                            from_cfg.stage_id,
                            next_sid,
                        )
                    )
            next_handle.engine.add_request(
                prompt,
                self._stage_sampling_params(
                    next_handle.config, state.sampling_params[next_sid]
                ),
                request_id=self._internal_id(state.external_id, next_sid),
            )
