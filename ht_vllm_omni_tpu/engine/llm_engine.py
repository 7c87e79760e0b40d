"""Synchronous single-stage AR engine with chunked multi-step decode.

TPU-native counterpart of one vLLM EngineCore the reference attaches to per
stage (reference vllm_omni/engine/stage_engine_core_client.py:25 talks ZMQ
to an EngineCoreProc; here the engine is in-process — the single-controller
jax model makes the process-per-stage topology unnecessary on one host).

Each ``step()`` runs: admissions -> prefills -> one K-step decode chunk on
device (a single host sync for K * batch tokens, see
worker/model_runner.py).
"""

from __future__ import annotations

import copy
import itertools
import logging
import time
from typing import Sequence

import numpy as np

from ht_vllm_omni_tpu.config import EngineConfig
from ht_vllm_omni_tpu.core.request import Request
from ht_vllm_omni_tpu.utils import cdiv, next_power_of_2
from ht_vllm_omni_tpu.core.sched.scheduler import Scheduler
from ht_vllm_omni_tpu.inputs import OmniPrompt, as_prompt
from ht_vllm_omni_tpu.outputs import CompletionOutput, OmniRequestOutput
from ht_vllm_omni_tpu.sampling_params import SamplingParams
from ht_vllm_omni_tpu.worker.model_runner import ARModelRunner

logger = logging.getLogger(__name__)


class LLMEngine:
    def __init__(
        self,
        config: EngineConfig,
        params: dict | None = None,
        tokenizer=None,
        decode_horizon: int = 16,
        decode_horizon_max: int | None = None,
    ) -> None:
        self.config = config
        self.decode_horizon = decode_horizon
        # adaptive chunk widening: consecutive decode-only steps double
        # the horizon up to decode_horizon_max (power-of-2 buckets, so
        # at most log2(max/base) extra compiles).  Each decode chunk
        # costs one host sync — ~30 ms on a tunneled TPU — so long
        # generations (TTS talkers) want wide chunks, while the FIRST
        # chunk stays small for time-to-first-audio.  A fresh prefill
        # resets the ramp (streaming consumers get early tokens fast).
        self.decode_horizon_max = decode_horizon_max or decode_horizon
        self._cur_horizon = decode_horizon
        self.runner = ARModelRunner(config, params=params)
        # dp-sharded caches: a request's pages must come from the page
        # partition of the dp group that owns its slot (ids are global;
        # the runner translates to shard-local, core/block_pool.py)
        local_slots = self.runner.max_slots // self.runner.dp
        self.scheduler = Scheduler(
            config.scheduler,
            config.cache,
            self.runner.num_pages,
            num_groups=self.runner.dp,
            group_fn=lambda req: (
                self.runner.slot_for(req.request_id) // local_slots
            ),
        )
        self.tokenizer = tokenizer
        if tokenizer is None and config.model_path is not None:
            try:
                from transformers import AutoTokenizer

                self.tokenizer = AutoTokenizer.from_pretrained(
                    config.model_path
                )
            except Exception as e:  # tokenizer optional: ids API still works
                logger.warning("tokenizer load failed: %s", e)
        self._req_counter = itertools.count()
        # guided decoding (structured outputs): request_id ->
        # {"m": GuidedMatcher, "fed": n_output_tokens_consumed}
        self._guided: dict[str, dict] = {}
        self._guided_engine = None
        # request_id -> (prompt_hidden_device_array, producing-hiddens list)
        self._hidden: dict[str, dict] = {}
        # request_id -> list of per-token logprob dicts (sp.logprobs)
        self._lps: dict[str, list] = {}
        # multimodal perception adapter (encode_image/encode_audio)
        self.mm_encoder = None
        if config.mm_encoder_spec is not None:
            from ht_vllm_omni_tpu.models import mm_registry

            self.mm_encoder = mm_registry.build(
                config.mm_encoder_spec, config.model
            )

    # --------------------------------------------------------------- intake
    def add_request(
        self,
        prompt: str | list[int] | OmniPrompt,
        sampling_params: SamplingParams | None = None,
        request_id: str | None = None,
    ) -> str:
        sampling_params = sampling_params or SamplingParams()
        request_id = request_id or f"req-{next(self._req_counter)}"
        p = as_prompt(prompt)
        mm_capable = (
            self.config.model.image_token_id is not None
            or self.config.model.audio_token_id is not None
        )
        if p.multi_modal_data and mm_capable:
            from ht_vllm_omni_tpu.models.input_processing import (
                default_vision_encoder,
                process_multimodal_prompt,
            )

            p = process_multimodal_prompt(
                p,
                self.config.model,
                encoder=self.mm_encoder or default_vision_encoder,
            )
        if p.embeds is not None:
            # prompt embeds (thinker->talker handoff): token ids are
            # placeholders for length bookkeeping
            token_ids = list(p.token_ids or [0] * len(p.embeds))
        elif p.token_ids is not None:
            token_ids = list(p.token_ids)
        elif p.text is not None:
            if self.tokenizer is None:
                raise ValueError("text prompt but no tokenizer available")
            token_ids = self.tokenizer.encode(p.text)
        else:
            raise ValueError("empty prompt")
        if not sampling_params.ignore_eos:
            for eos in self.config.model.eos_token_ids:
                if eos not in sampling_params.stop_token_ids:
                    sampling_params.stop_token_ids.append(eos)
        req = Request(
            request_id=request_id,
            prompt_token_ids=token_ids,
            sampling_params=sampling_params,
            prompt_embeds=p.embeds,
            additional_information=dict(p.additional_information),
            arrival_time=time.time(),
        )
        if sampling_params.guided_regex or (
            sampling_params.guided_json is not None
        ):
            # compile the grammar BEFORE scheduling: a bad grammar must
            # reject the request, not leave an unconstrained orphan in
            # the queue
            matcher = self._make_matcher(sampling_params)
            self._guided[request_id] = {"m": matcher, "fed": 0}
        self.scheduler.add_request(req)
        return request_id

    def _make_matcher(self, sp):
        """Build the grammar matcher for a guided request (guided/)."""
        if self.tokenizer is None:
            raise ValueError(
                "guided decoding needs a tokenizer (token byte "
                "sequences drive the grammar DFA)"
            )
        if self._guided_engine is None:
            from ht_vllm_omni_tpu.guided import GuidedEngine

            eos_ids = list(self.config.model.eos_token_ids)
            self._guided_engine = GuidedEngine(
                self.tokenizer,
                self.config.model.vocab_size,
                eos_token_id=eos_ids[0] if eos_ids else None,
            )
        if sp.guided_regex:
            return self._guided_engine.matcher_for_regex(sp.guided_regex)
        return self._guided_engine.matcher_for_json(sp.guided_json)

    def add_request_with_kv(
        self,
        token_ids: list[int],
        kv_rows,
        sampling_params: SamplingParams | None = None,
        request_id: str | None = None,
        prequantized: bool = False,
    ) -> str:
        """PD-disaggregation import: ``token_ids`` = prompt + the first
        sampled token; ``kv_rows`` [L, len-1, 2F] are its prompt KV.  The
        request enters decode directly (no prefill pass)."""
        sampling_params = sampling_params or SamplingParams()
        request_id = request_id or f"req-{next(self._req_counter)}"
        if not sampling_params.ignore_eos:
            for eos in self.config.model.eos_token_ids:
                if eos not in sampling_params.stop_token_ids:
                    sampling_params.stop_token_ids.append(eos)
        req = Request(
            request_id=request_id,
            prompt_token_ids=list(token_ids[:-1]),
            sampling_params=sampling_params,
            arrival_time=time.time(),
        )
        req.output_token_ids = [token_ids[-1]]
        self.scheduler.admit_running_with_kv(req, self.decode_horizon)
        self.runner.inject_kv(req, kv_rows, prequantized=prequantized)
        return request_id

    def abort_request(self, request_id: str) -> None:
        self.scheduler.abort_request(request_id)
        self.runner.release_slot(request_id)
        self._hidden.pop(request_id, None)
        self._lps.pop(request_id, None)
        self._guided.pop(request_id, None)

    # --------------------------------------------------- sleep / wake
    def sleep(self, level: int = 1) -> None:
        """Release device memory between bursts (reference
        enable_sleep_mode, diffusion_worker.py:77): level 1 drops the KV
        cache; level 2 additionally offloads weights to host RAM."""
        if self.has_unfinished_requests():
            raise RuntimeError("cannot sleep with unfinished requests")
        import jax
        import jax.numpy as jnp

        runner = self.runner
        self._sleep_kv_shape = (
            runner.kv_cache.shape, runner.kv_cache.dtype
        )
        runner.kv_cache.delete()
        runner.kv_cache = None
        if level >= 2:
            self._host_params = jax.device_get(runner.params)
            for leaf in jax.tree_util.tree_leaves(runner.params):
                leaf.delete()
            runner.params = None
            # fused decode-stack copies are derived from params:
            # free them too, rebuild on wake
            if getattr(runner, "fused_kw", None) is not None:
                for leaf in jax.tree_util.tree_leaves(runner.fused_kw):
                    leaf.delete()
                runner.fused_kw = None
        self._asleep = level

    def wake(self) -> None:
        import jax
        import jax.numpy as jnp

        runner = self.runner
        shape, dtype = self._sleep_kv_shape
        runner.kv_cache = jnp.zeros(shape, dtype)
        if getattr(self, "_asleep", 0) >= 2:
            runner.params = jax.tree_util.tree_map(
                jnp.asarray, self._host_params
            )
            self._host_params = None
            if hasattr(runner, "_build_fused_stack"):
                runner._build_fused_stack()
        self._asleep = 0

    def has_unfinished_requests(self) -> bool:
        return self.scheduler.has_unfinished()

    # --------------------------------------------------------------- step
    def step(self) -> list[OmniRequestOutput]:
        """One engine iteration (prefills + one decode chunk); returns
        streaming deltas for every request that made progress."""
        spec_d = self.config.spec_num_draft
        use_spec = (
            spec_d > 0 and self.runner.mesh is None and not self._guided
        )
        spec_iters = max(1, cdiv(self.decode_horizon, spec_d + 1))
        horizon = (
            spec_iters * (spec_d + 1) if use_spec else self._cur_horizon
        )
        prefill_works, decode_reqs = self.scheduler.step_plan(horizon)
        # shrinking below the reserved horizon is always page-safe;
        # fresh prompts get a base-width first chunk (fast first tokens)
        # and decode-only steps ride the ramp
        if prefill_works:
            run_horizon = self.decode_horizon
            self._cur_horizon = min(
                self.decode_horizon * 2, self.decode_horizon_max
            )
        else:
            run_horizon = self._cur_horizon
            if decode_reqs:
                self._cur_horizon = min(
                    self._cur_horizon * 2, self.decode_horizon_max
                )
        for req in self.scheduler.newly_preempted:
            self.runner.release_slot(req.request_id)

        want_hidden: dict[str, bool] = {}
        want_lp: dict[str, bool] = {}
        prefill_hidden: dict[str, object] = {}
        prefill_lp_hidden: dict[str, object] = {}
        prefills: list[Request] = []
        # cross-request batched prefill: whole token-only prompts with no
        # hidden-state request run as ONE padded dispatch (one kernel per
        # layer over the batch) instead of a dispatch per request
        batchable: list[Request] = []
        if self.runner.mesh is None and self.runner.step_adapter is None:
            batchable = [
                req
                for req, start, num in prefill_works
                if start == 0
                and num == req.num_prompt_tokens
                and req.prompt_embeds is None
                and not req.additional_information.get("mm_embeds")
                and req.additional_information.get("mrope_positions") is None
                and not req.sampling_params.return_hidden_states
                # logprobs needs the prefill hidden row to score the
                # entry token; the batched program doesn't export it
                and not req.sampling_params.logprobs
                and req.request_id not in self._guided
            ]
        batched_ids = (
            {r.request_id for r in batchable} if len(batchable) >= 2 else set()
        )
        if batched_ids:
            self.runner.prefill_batch(batchable)
        for req, start, num in prefill_works:
            whole = start == 0 and num == req.num_prompt_tokens
            gst = self._guided.get(req.request_id)
            gmask = (
                gst["m"].allowed_mask()[None, :] if gst is not None
                else None
            )
            if req.request_id in batched_ids:
                hidden = None
            elif whole:
                hidden = self.runner.prefill(req, guided_mask=gmask)
            else:
                hidden = self.runner.prefill_chunk(
                    req, start, num, guided_mask=gmask
                )
            req.num_computed_tokens = start + num
            if not req.prefill_done:
                continue  # mid-prefill: not active in this decode chunk
            self.scheduler.register_prefix(req)
            prefills.append(req)
            if req.sampling_params.return_hidden_states:
                # producing hidden of the first sampled token = hidden at
                # the prompt's last position: row prompt_len-1 for a whole
                # prefill, row num-1 of the final chunk otherwise
                prefill_hidden[req.request_id] = (
                    hidden, (req.num_prompt_tokens - 1) if whole else num - 1
                )
                want_hidden[req.request_id] = True
            if req.sampling_params.logprobs:
                want_lp[req.request_id] = True
                idx = (req.num_prompt_tokens - 1) if (
                    req.sampling_params.return_hidden_states and whole
                ) else (-1 if not req.sampling_params.return_hidden_states
                        else num - 1)
                prefill_lp_hidden[req.request_id] = (hidden, idx)
        for req in decode_reqs:
            # pages may have grown this step; keep the device-side block
            # tables in lockstep (stale columns corrupt the KV cache)
            self.runner.sync_tables(req)
            if req.sampling_params.return_hidden_states:
                want_hidden[req.request_id] = True
            if req.sampling_params.logprobs:
                want_lp[req.request_id] = True

        active = prefills + decode_reqs
        if not active:
            return []
        # guided decoding: the host advances each request's grammar DFA
        # between tokens, so guided chunks are 1 step wide; the mask for
        # this step needs every token the DEVICE has sampled so far fed
        # into the matcher — for fresh prefills that first token is
        # device-resident, so sync it (one extra d2h for guided prefills)
        guided_active = [
            r for r in active if r.request_id in self._guided
        ]
        guided_mask = None
        if guided_active:
            run_horizon = 1
            toks_dev = None
            guided_mask = {}
            for r in guided_active:
                st = self._guided[r.request_id]
                if r in prefills:
                    if toks_dev is None:
                        toks_dev = np.asarray(self.runner.token_state)
                    slot = self.runner._slot_of.get(r.request_id)
                    if slot is not None:
                        st["m"].advance(int(toks_dev[slot]))
                        st["fed"] += 1
                slot = self.runner._slot_of.get(r.request_id)
                if slot is not None:
                    guided_mask[slot] = st["m"].allowed_mask()
        # spec mode requires greedy everywhere + no hidden collection;
        # otherwise fall back to the normal multi-step chunk
        if (
            use_spec
            and not want_hidden
            and self.runner.step_adapter is None
            and not want_lp
            and all(
                r.sampling_params.temperature == 0.0
                and (r.sampling_params.repetition_penalty or 1.0) == 1.0
                and not r.sampling_params.logit_bias
                and not getattr(r.sampling_params, "presence_penalty", 0)
                and not getattr(r.sampling_params, "frequency_penalty", 0)
                for r in active
            )
        ):
            tokens, hidden = self.runner.spec_decode_chunk(
                spec_iters, spec_d
            )
            chunk_lp = None
        else:
            # never run a chunk longer than the longest request can use
            # (power-of-2 buckets keep the compile count bounded): a
            # max_tokens=2 batch pays for a 1-2-step chunk, not the full
            # serving horizon
            r = self.runner
            if r.h_active.any():
                rem = int(
                    (r.h_limit - r.h_emitted + 1)[r.h_active].max()
                )
                run_horizon = max(
                    min(run_horizon, next_power_of_2(max(rem, 1))), 1
                )
            tokens, hidden, chunk_lp = self.runner.decode_chunk(
                run_horizon, collect_hidden=bool(want_hidden),
                collect_logprobs=bool(want_lp),
                guided_mask=guided_mask,
            )

        outputs: list[OmniRequestOutput] = []
        fresh_ids = {r.request_id for r in prefills}
        if len(prefill_hidden) > 1:
            # ONE d2h for every fresh request's producing hidden row:
            # converting each request's prefill hidden separately costs
            # a full device sync apiece (~30 ms on a tunneled TPU — the
            # dominant cost of multi-stream TTS admission)
            import jax.numpy as jnp

            ids_h = [r for r in prefill_hidden if want_hidden.get(r)]
            if len(ids_h) > 1:
                rows_np = np.asarray(jnp.stack([
                    prefill_hidden[r][0][prefill_hidden[r][1]]
                    for r in ids_h
                ]))
                for i, r in enumerate(ids_h):
                    arr, idx = prefill_hidden[r]
                    prefill_hidden[r] = (arr, idx, rows_np[i])
        for req in active:
            rid = req.request_id
            slot = self.runner._slot_of.get(rid)
            if slot is None:
                continue
            is_fresh = rid in fresh_ids
            toks: list[int] = []
            if is_fresh:
                toks.append(int(tokens[0, slot]))
            for k in range(1, tokens.shape[0]):
                t = int(tokens[k, slot])
                if t < 0:
                    break
                toks.append(t)
            if not toks:
                continue
            prev_n = req.num_output_tokens
            status = self.scheduler.apply_decoded(
                req, toks, includes_entry=is_fresh
            )
            accepted = req.num_output_tokens - prev_n
            if want_hidden.get(rid):
                self._accumulate_hidden(
                    req, slot, accepted, is_fresh,
                    prefill_hidden.get(rid), hidden,
                )
            if want_lp.get(rid):
                self._accumulate_logprobs(
                    req, slot, accepted, is_fresh, toks,
                    prefill_lp_hidden.get(rid), chunk_lp,
                )
            gst = self._guided.get(rid)
            if gst is not None:
                # feed newly accepted tokens into the grammar DFA
                out_ids = req.output_token_ids
                for t in out_ids[gst["fed"]:]:
                    gst["m"].advance(int(t))
                gst["fed"] = len(out_ids)
            finished = status is not None
            if finished:
                self.runner.release_slot(rid)
                self._guided.pop(rid, None)
            outputs.append(self._make_output(req, finished, accepted))
        return outputs

    def _accumulate_hidden(
        self, req, slot, accepted, is_fresh, p_hidden, chunk_hidden
    ) -> None:
        """Store the producing hidden state of each accepted token.

        Token i's producing hidden is the transformer output at the
        position *before* it: the prefill's last position for the first
        sampled token, chunk step j-1 for the token sampled at step j.
        """
        store = self._hidden.setdefault(
            req.request_id, {"prompt": None, "steps": []}
        )
        rows = []
        if is_fresh and p_hidden is not None:
            arr, last_idx = p_hidden[0], p_hidden[1]
            store["prompt"] = arr
            if len(p_hidden) > 2:  # pre-fetched by the batched d2h
                rows.append(p_hidden[2])
            else:
                rows.append(np.asarray(arr)[last_idx])
        if chunk_hidden is not None:
            n_chunk_rows = accepted - (1 if is_fresh else 0)
            for j in range(max(n_chunk_rows, 0)):
                rows.append(chunk_hidden[j, slot])
        store["steps"].extend(rows)

    def _accumulate_logprobs(
        self, req, slot, accepted, is_fresh, toks, p_lp_hidden, chunk_lp
    ) -> None:
        """Per-token logprobs for accepted tokens (SamplingParams.
        logprobs).  Chunk tokens use the PROCESSED logits they were
        sampled from (penalties/windows applied); the entry token (the
        prefill-sampled one) is scored from the prefill's last hidden
        row against raw logits — noted asymmetry, the prefill program
        does not export its processed logits."""
        store = self._lps.setdefault(req.request_id, [])
        n_top = min(int(req.sampling_params.logprobs or 0), 5)
        k = 0
        if is_fresh:
            entry = {"token_id": toks[0], "logprob": None}
            if p_lp_hidden is not None:
                arr, idx = p_lp_hidden
                lp, ti, tv = self.runner.token_logprob(
                    arr, idx, toks[0]
                )
                entry["logprob"] = float(lp)
                if n_top:
                    entry["top_token_ids"] = [int(x) for x in ti[:n_top]]
                    entry["top_logprobs"] = [float(x) for x in tv[:n_top]]
            store.append(entry)
            k = 1
        if chunk_lp is not None:
            chosen, top_i, top_v = chunk_lp
            for j in range(accepted - k):
                entry = {
                    "token_id": toks[k + j],
                    "logprob": float(chosen[j, slot]),
                }
                if n_top:
                    entry["top_token_ids"] = [
                        int(x) for x in top_i[j, slot, :n_top]
                    ]
                    entry["top_logprobs"] = [
                        float(x) for x in top_v[j, slot, :n_top]
                    ]
                store.append(entry)

    def _make_output(
        self, req: Request, finished: bool, num_new: int
    ) -> OmniRequestOutput:
        hidden = None
        prompt_hidden = None
        store = self._hidden.get(req.request_id)
        if store is not None and store["steps"]:
            # attach the producing hidden of every token so far — streaming
            # consumers (async-chunk talker handoff) slice their delta
            hidden = np.stack(store["steps"])
        if (
            store is not None
            and store["prompt"] is not None
            and getattr(
                req.sampling_params, "return_prompt_hidden_states", False
            )
        ):
            prompt_hidden = np.asarray(store["prompt"])[
                : req.num_prompt_tokens
            ]
        if finished:
            self._hidden.pop(req.request_id, None)
        text = ""
        if finished and self.tokenizer is not None:
            text = self.tokenizer.decode(req.output_token_ids)
        out = OmniRequestOutput(
            request_id=req.request_id,
            prompt_token_ids=req.prompt_token_ids,
            outputs=[
                CompletionOutput(
                    index=0,
                    token_ids=list(req.output_token_ids),
                    text=text,
                    finish_reason=req.status.finish_reason,
                    hidden_states=hidden,
                    prompt_hidden_states=prompt_hidden,
                    logprobs=(
                        list(self._lps[req.request_id])
                        if req.request_id in self._lps
                        else None
                    ),
                )
            ],
            finished=finished,
        )
        if finished:
            self._lps.pop(req.request_id, None)
        out.metrics["num_new_tokens"] = num_new
        return out

    # --------------------------------------------------------------- offline
    def generate(
        self,
        prompts: Sequence[str | list[int] | OmniPrompt],
        sampling_params: SamplingParams | Sequence[SamplingParams] | None = None,
    ) -> list[OmniRequestOutput]:
        if sampling_params is None or isinstance(
            sampling_params, SamplingParams
        ):
            sampling_params = [sampling_params] * len(prompts)
        order: list[str] = []
        for p, sp in zip(prompts, sampling_params):
            order.append(
                self.add_request(p, copy.deepcopy(sp) if sp else None)
            )
        results: dict[str, OmniRequestOutput] = {}
        while self.has_unfinished_requests():
            for out in self.step():
                if out.finished:
                    results[out.request_id] = out
        return [results[rid] for rid in order]
