"""AR model runner: device-resident decode state + multi-step decode.

TPU-native counterpart of the reference's GPUARModelRunner (reference
vllm_omni/worker/gpu_ar_model_runner.py:61), redesigned for XLA + a
high-latency host<->device link:

- All per-slot decode state (last token, position, emitted count, active
  mask, sampling params, stop sets, block tables) lives in small device
  arrays.  The host mirrors it in numpy and pushes the full mirror (~KBs)
  when the scheduler changes it — h2d transfers are cheap; syncs are not.
- ``decode_steps`` runs K decode iterations in one compiled lax.scan:
  slot mappings, EOS/length stopping and sampling all happen on device, so
  there is exactly ONE host sync per K*batch tokens.  This replaces both
  CUDA graphs and the reference's per-step engine-core polling loop.
- Prefill writes its sampled first token directly into the device token
  state; the host learns it from the next chunk's token matrix (row 0),
  so prefill does not force a sync either.

Sampled-token layout returned per chunk: tokens[0] = tokens sampled by
the *previous* call (incl. prefill first tokens); tokens[1..K] = tokens
sampled by steps 0..K-1 of this chunk.
"""

from __future__ import annotations

import dataclasses
import functools
import logging

import jax
import jax.numpy as jnp
import numpy as np

from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ht_vllm_omni_tpu.config import EngineConfig
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.parallel.mesh import (
    DP_AXIS,
    EP_AXIS,
    PP_AXIS,
    TP_AXIS,
    MeshConfig,
    make_mesh,
    param_pspecs,
    validate_tp,
)
from ht_vllm_omni_tpu.models.loader import load_hf_params
from ht_vllm_omni_tpu.ops.kv_cache_update import (
    flush_kv_pages,
    flush_kv_rows,
    flush_kv_rows_donated as flush_kv_rows_donated_entry,
)
from ht_vllm_omni_tpu.sample.sampler import (
    MAX_LOGIT_BIAS,
    MAX_TOP_LOGPROBS,
    apply_presence_frequency,
    SamplingTensors,
    apply_repetition_penalty,
    sample_tokens,
)
from ht_vllm_omni_tpu.utils import cdiv, next_power_of_2

logger = logging.getLogger(__name__)

_PAGES_DEFAULT_CPU = 512
MAX_STOP_TOKENS = 8
_NO_TOKEN = -1



def _allow_vec(sp) -> "np.ndarray":
    """[4 + MAX_STOP] int32: allowed window lo/hi, grid row width +
    end-of-line token (MammothModa2 t2i constraint — 0 width = off),
    then stop ids (-2 pad)."""
    v = np.full(4 + MAX_STOP_TOKENS, -2, np.int32)
    rng = getattr(sp, "allowed_token_range", None) or (0, 0)
    v[0], v[1] = int(rng[0]), int(rng[1])
    v[2] = int(getattr(sp, "grid_row_width", 0) or 0)
    v[3] = int(getattr(sp, "grid_eol_token_id", -1) or -1)
    stops = (sp.stop_token_ids or [])[:MAX_STOP_TOKENS]
    if not sp.ignore_eos:
        v[4 : 4 + len(stops)] = stops
    return v


class SpecDecodeMixin:
    """Greedy speculative decoding for ARModelRunner (Medusa-style).

    TPU-native rework of the reference's MTP/spec-decode glue (reference
    worker/gpu_ar_model_runner.py:25-27,
    qwen3_omni/qwen3_omni_moe_code_predictor_mtp.py): D draft heads
    propose the next D tokens from the last accepted hidden state; every
    outer iteration runs ONE target forward over the current token plus
    the D proposals (queries folded into the attention kernel's batch
    dim, q_per_seq=D+1) and accepts the longest proposal prefix matching
    the target argmax — emitting 1..D+1 tokens per forward.  Emitted
    tokens are target argmaxes by construction, so greedy output equals
    normal decode up to floating-point tie-breaking: the verify forward
    runs the same math through a multi-query attention path, and under
    bf16 a near-tie can argmax differently (f32 runs are exact; trained
    checkpoints rarely tie).  Greedy-only: spec mode is used when every
    active request has temperature 0.

    Proposers (EngineConfig.spec_method): "medusa" draft heads, or
    "ngram" prompt-lookup — a per-slot device token ring is searched
    for the latest prior occurrence of the trailing bigram and the
    tokens that followed it become the proposal (the reference's vLLM
    ngram mode; zero extra weights).  A verify iteration costs ~1.5x a
    plain decode step, so speculation pays when the workload's
    acceptance rate is high (repetitive/code/text with trained
    weights), not on random-weight benchmarks.
    """

    def _spec_heads(self, num_draft: int):
        heads = self.params.get("spec_heads")
        if heads is None:
            # random heads: correctness is acceptance-independent; real
            # checkpoints load trained heads into params["spec_heads"]
            heads = (
                jax.random.normal(
                    jax.random.PRNGKey(self.config.seed + 99),
                    (num_draft, self.arch.hidden_size, self.arch.vocab_size),
                    jnp.float32,
                )
                * 0.02
            ).astype(jnp.dtype(self.arch.dtype))
            self.params["spec_heads"] = heads
        return heads

    SPEC_HIST_LEN = 128  # ngram proposer's per-slot token ring

    def _reset_spec(self, slot: int, req=None) -> None:
        """Invalidate a slot's draft proposals (new/changed sequence)
        and, for the ngram proposer, prime the history ring with the
        request's tokens so prompt-lookup works from the first step."""
        if getattr(self, "spec_proposals", None) is not None:
            self.spec_proposals = self.spec_proposals.at[slot].set(
                _NO_TOKEN
            )
        if self.config.spec_method != "ngram" or (
            self.config.spec_num_draft <= 0
        ):
            return
        hl = self.SPEC_HIST_LEN
        if getattr(self, "spec_history", None) is None:
            self.spec_history = jnp.full(
                (self.max_slots, hl), _NO_TOKEN, jnp.int32
            )
            self.spec_hist_len = jnp.zeros(
                (self.max_slots,), jnp.int32
            )
        tail = []
        if req is not None:
            tail = list(req.prompt_token_ids) + list(
                req.output_token_ids
            )
            tail = tail[-hl:]
        row = np.full((hl,), _NO_TOKEN, np.int32)
        row[: len(tail)] = tail
        self.spec_history = self.spec_history.at[slot].set(
            jnp.asarray(row)
        )
        self.spec_hist_len = self.spec_hist_len.at[slot].set(len(tail))

    def spec_decode_chunk(
        self, num_iters: int, num_draft: int
    ) -> tuple[np.ndarray, None]:
        """Run num_iters speculative iterations (up to
        num_iters*(num_draft+1) tokens per slot); one host sync.

        Returns (tokens [1 + num_iters*(D+1), S], None) in the same
        layout decode_chunk uses: row 0 = entry tokens, later rows are
        this chunk's emissions COMPACTED per slot (-1 padded at the
        end)."""
        assert self.mesh is None, "spec decode is single-mesh (v1)"
        q = num_draft + 1
        s = self.max_slots
        use_ngram = self.config.spec_method == "ngram"
        if (
            getattr(self, "spec_proposals", None) is None
            or self.spec_proposals.shape != (s, num_draft)
        ):
            self.spec_proposals = jnp.full(
                (s, num_draft), _NO_TOKEN, jnp.int32
            )
        if use_ngram and getattr(self, "spec_history", None) is None:
            self.spec_history = jnp.full(
                (s, self.SPEC_HIST_LEN), _NO_TOKEN, jnp.int32
            )
            self.spec_hist_len = jnp.zeros((s,), jnp.int32)
        if use_ngram:
            heads = jnp.zeros((1, 1, 1), jnp.float32)  # unused
            history, hist_len = self.spec_history, self.spec_hist_len
        else:
            heads = self._spec_heads(num_draft)
            history = jnp.zeros((s, 1), jnp.int32)  # unused
            hist_len = jnp.zeros((s,), jnp.int32)
        key = ("spec", num_iters, num_draft, use_ngram)
        fn = self._decode_fns.get(key)
        if fn is None:
            prog = functools.partial(
                self._spec_program,
                self.arch,
                num_iters,
                num_draft,
                self.page_size,
                self.kv_scales,
                use_ngram,
            )
            fn = jax.jit(prog, donate_argnums=(2, 3, 4, 5, 6))
            self._decode_fns[key] = fn

        if self.h_active.any():
            live = int(self.h_positions[self.h_active].max()) + (
                num_iters * q
            )
        else:
            live = 1
        width = min(
            max(next_power_of_2(cdiv(max(live, 1), self.page_size)), 1),
            self.max_pages_per_seq,
        )
        int_state = np.empty((self._NUM_INT_ROWS, s), np.int32)
        int_state[self._ROW_POS] = self.h_positions
        int_state[self._ROW_ACTIVE] = self.h_active
        int_state[self._ROW_FRESH] = self.h_fresh
        int_state[self._ROW_EMITTED] = self.h_emitted
        int_state[self._ROW_LIMIT] = self.h_limit
        int_state[self._ROW_MIN_TOKENS] = self.h_min_tokens
        int_state[self._ROW_ROPE_DELTA] = self.h_rope_delta
        int_state[self._ROW_TOP_K] = self.h_top_k
        int_state[self._ROW_ALLOW_LO] = self.h_allow_lo
        int_state[self._ROW_ALLOW_HI] = self.h_allow_hi
        int_state[self._ROW_GRID_W] = self.h_grid_w
        int_state[self._ROW_GRID_EOL] = self.h_grid_eol
        int_state[self._ROW_STOPS :] = self.h_stops.T
        (
            self.kv_cache,
            self.token_state,
            self.spec_proposals,
            new_history,
            new_hist_len,
            packed,
        ) = fn(
            self.params,
            heads,
            self.kv_cache,
            self.token_state,
            self.spec_proposals,
            history,
            hist_len,
            int_state,
            np.ascontiguousarray(self.h_tables[:, :width]),
        )
        if use_ngram:
            self.spec_history = new_history
            self.spec_hist_len = new_hist_len
        host = np.asarray(packed)  # single sync
        rows = 1 + num_iters * q
        raw = host[:rows]
        # compact per-slot: spec iterations leave -1 gaps between blocks
        tokens = np.full_like(raw, _NO_TOKEN)
        tokens[0] = raw[0]
        body = raw[1:]
        for slot in range(s):
            col = body[:, slot]
            vals = col[col >= 0]
            tokens[1 : 1 + len(vals), slot] = vals
        self.h_positions = host[rows].copy()
        self.h_active = host[rows + 1].astype(bool)
        self.h_emitted = host[rows + 2].copy()
        self.h_fresh[:] = False
        return tokens, None

    @staticmethod
    def _spec_program(
        cfg,
        num_iters: int,
        num_draft: int,
        page_size: int,
        kv_scales,
        use_ngram: bool,
        params,
        spec_heads,  # [D, H, V] (medusa) or dummy (ngram)
        kv_cache,  # donated
        token_state,  # [S]
        proposals,  # [S, D] draft tokens for the upcoming positions
        history,  # [S, HLEN] int32 token ring (ngram) or dummy
        hist_len,  # [S] int32 absolute token count in the ring
        int_state,  # packed host mirrors (see _decode_program)
        block_tables,  # [S, P]
    ):
        R = ARModelRunner
        positions = int_state[R._ROW_POS]
        active = int_state[R._ROW_ACTIVE].astype(bool)
        fresh = int_state[R._ROW_FRESH].astype(bool)
        emitted = int_state[R._ROW_EMITTED]
        limit = int_state[R._ROW_LIMIT]
        min_tokens = int_state[R._ROW_MIN_TOKENS]
        allow_lo = int_state[R._ROW_ALLOW_LO]
        allow_hi = int_state[R._ROW_ALLOW_HI]
        stops = int_state[R._ROW_STOPS :].T
        s = token_state.shape[0]
        q = num_draft + 1

        entry_stop = ARModelRunner._stop_mask(
            token_state, emitted, stops, min_tokens, limit
        )
        active = jnp.logical_and(
            active, jnp.logical_not(jnp.logical_and(fresh, entry_stop))
        )
        seq_lens0 = jnp.where(active, positions, 0)
        pos0 = positions
        true_f = cfg.num_key_value_heads * cfg.head_dim
        rows_per_slot = num_iters * q
        fresh_buf = jnp.zeros(
            (kv_cache.shape[0], s * rows_per_slot, 2 * true_f),
            params["embed"].dtype,
        )
        sl = jnp.arange(s)

        hlen_ring = history.shape[1]
        if use_ngram:
            # fresh slots carry a prefill-sampled entry token the scan
            # never re-emits — append it so the ring tracks the full
            # stream (non-fresh entries were appended by their own
            # emitting chunk / the reset priming)
            add = jnp.logical_and(fresh, active)
            sl0 = jnp.arange(s)
            idx0 = hist_len % hlen_ring
            history = history.at[sl0, idx0].set(
                jnp.where(add, token_state, history[sl0, idx0])
            )
            hist_len = hist_len + add.astype(jnp.int32)

        def iter_step(carry, _):
            (token_state, proposals, history, hist_len, pos, act, emit,
             cnt, fresh_buf) = carry
            q_tokens = jnp.concatenate(
                [token_state[:, None], proposals], axis=1
            )  # [S, Q]
            x = qwen2.embed_tokens(
                params, jnp.maximum(q_tokens, 0)
            ).reshape(s * q, -1)
            pos_rows = (
                pos[:, None] + jnp.arange(q, dtype=jnp.int32)[None]
            ).reshape(-1)
            spec_gen_mask = (
                (jnp.maximum(q_tokens, 0) >= cfg.gen_vocab_start)
                .reshape(s * q)
                if cfg.use_gen_mlp else None
            )
            hidden, fresh_buf = qwen2.spec_verify_forward(
                cfg, params, kv_cache, fresh_buf, x, pos_rows, cnt,
                block_tables, seq_lens0, gen_mask=spec_gen_mask,
                page_size=page_size, q_per_seq=q,
                rows_per_slot=rows_per_slot, kv_scales=kv_scales,
            )
            logits = qwen2.compute_logits(cfg, params, hidden)
            # logits is [s*q, V]: window rows repeat per-slot q times
            logits = R._window_logits(
                logits.reshape(-1, logits.shape[-1]),
                jnp.repeat(allow_lo, q),
                jnp.repeat(allow_hi, q),
                jnp.repeat(stops, q, axis=0),
            ).reshape(logits.shape)
            targets = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            targets = targets.reshape(s, q)
            # prefix acceptance: proposal j matches target at row j-1
            acc = jnp.cumprod(
                (proposals == targets[:, :num_draft]).astype(jnp.int32),
                axis=1,
            )
            n_acc = jnp.sum(acc, axis=1)  # [S] in 0..D

            y_out = jnp.full((s, q), _NO_TOKEN, jnp.int32)
            cont = act
            fired = jnp.zeros((s,), bool)
            n_new = jnp.zeros((s,), jnp.int32)
            for k in range(q):
                can = jnp.logical_and(cont, k <= n_acc)
                tok = jnp.where(can, targets[:, k], _NO_TOKEN)
                n_new = n_new + can.astype(jnp.int32)
                e_after = emit + n_new
                stop = jnp.logical_and(
                    can,
                    ARModelRunner._stop_mask(
                        tok, e_after, stops, min_tokens, limit
                    ),
                )
                fired = jnp.logical_or(fired, stop)
                y_out = y_out.at[:, k].set(tok)
                cont = jnp.logical_and(can, jnp.logical_not(stop))

            new_act = jnp.logical_and(act, jnp.logical_not(fired))
            last = jnp.clip(n_new - 1, 0, q - 1)
            y_last = y_out[sl, last]
            token_state = jnp.where(n_new > 0, y_last, token_state)
            if use_ngram:
                # append this iteration's accepted tokens to the ring
                wrote = jnp.zeros((s,), jnp.int32)
                for k in range(q):
                    ok = y_out[:, k] >= 0
                    idxk = (hist_len + wrote) % hlen_ring
                    cur = history[sl, idxk]
                    history = history.at[sl, idxk].set(
                        jnp.where(ok, y_out[:, k], cur)
                    )
                    wrote = wrote + ok.astype(jnp.int32)
                hist_len = hist_len + wrote
                # prompt-lookup proposal: find the LATEST prior
                # occurrence of the trailing bigram (prev, cur) in the
                # ring and propose the tokens that followed it
                idxs = jnp.arange(hlen_ring, dtype=jnp.int32)[None]
                hl1 = hist_len[:, None] - 1
                abs_j = hl1 - jnp.where(
                    hist_len[:, None] > 0,
                    (hl1 - idxs) % hlen_ring,
                    0,
                )  # absolute index stored in ring slot j
                lo = jnp.maximum(hist_len[:, None] - hlen_ring, 0)
                valid = (abs_j >= lo) & (abs_j <= hist_len[:, None] - 3)
                prev = history[
                    sl, jnp.maximum(hist_len - 2, 0) % hlen_ring
                ]
                has_hist = hist_len >= 3
                tok_j1 = history[:, (idxs[0] + 1) % hlen_ring]
                match = (
                    valid
                    & (history == prev[:, None])
                    & (tok_j1 == token_state[:, None])
                    & has_hist[:, None]
                )
                best = jnp.max(jnp.where(match, abs_j, -1), axis=1)
                found = best >= 0
                props = []
                for d in range(num_draft):
                    src_idx = (best + 2 + d) % hlen_ring
                    in_range = (best + 2 + d) <= hist_len - 1
                    tok_d = history[sl, src_idx]
                    props.append(
                        jnp.where(
                            found & in_range, tok_d, _NO_TOKEN
                        )
                    )
                new_props = jnp.stack(props, axis=1).astype(jnp.int32)
            else:
                h_sel = hidden.reshape(s, q, -1)[sl, last]
                new_props = jnp.argmax(
                    jnp.einsum(
                        "sh,dhv->sdv",
                        h_sel.astype(jnp.float32),
                        spec_heads.astype(jnp.float32),
                    ),
                    axis=-1,
                ).astype(jnp.int32)
            proposals = jnp.where((n_new > 0)[:, None], new_props, proposals)
            pos = pos + n_new
            emit = emit + n_new
            cnt = cnt + n_new
            return (
                token_state, proposals, history, hist_len, pos, new_act,
                emit, cnt, fresh_buf
            ), y_out

        entry_tokens = token_state
        cnt0 = jnp.zeros((s,), jnp.int32)
        init = (token_state, proposals, history, hist_len, positions,
                active, emitted, cnt0, fresh_buf)
        carry, ys = jax.lax.scan(
            iter_step, init, jnp.arange(num_iters, dtype=jnp.int32)
        )
        (token_state, proposals, history, hist_len, positions, active,
         emitted, cnt, fresh_buf) = carry

        # flush accepted rows (row r of slot s holds position pos0 + r)
        rows_r = jnp.arange(rows_per_slot, dtype=jnp.int32)[None, :]
        posm = pos0[:, None] + rows_r
        page_col = jnp.clip(posm // page_size, 0, block_tables.shape[1] - 1)
        page = jnp.take_along_axis(block_tables, page_col, axis=1)
        written = rows_r < cnt[:, None]
        slots = jnp.where(
            written, page * page_size + posm % page_size, -1
        ).reshape(s * rows_per_slot)
        ksc, vsc = kv_scales if kv_scales is not None else (1.0, 1.0)
        kv_cache = flush_kv_rows(
            kv_cache, fresh_buf, slots,
            true_f=true_f, k_scale=ksc, v_scale=vsc,
        )

        packed = jnp.concatenate(
            [
                entry_tokens[None],
                ys.reshape(num_iters, s, q).transpose(0, 2, 1).reshape(
                    num_iters * q, s
                ),
                positions[None],
                active.astype(jnp.int32)[None],
                emitted[None],
            ],
            axis=0,
        )
        return kv_cache, token_state, proposals, history, hist_len, packed


class ARModelRunner(SpecDecodeMixin):
    """Single-mesh runner for one AR stage."""

    def __init__(
        self,
        config: EngineConfig,
        params: dict | None = None,
        mesh=None,
    ):
        from ht_vllm_omni_tpu.utils.platform import setup_compilation_cache

        setup_compilation_cache()
        self.config = config
        cfg = config.model
        self.arch = cfg

        par = config.parallel
        tp = par.tensor_parallel_size
        dp = par.data_parallel_size
        pp = par.pipeline_parallel_size
        ep = getattr(par, "expert_parallel_size", 1)
        if mesh is None and tp * dp * pp * ep > 1:
            from ht_vllm_omni_tpu.parallel import multihost

            mcfg = MeshConfig(tp, dp, pp, ep)
            if multihost.ensure_initialized(par):
                multihost.validate_host_locality(mcfg)
            mesh = make_mesh(mcfg)
        self.mesh = mesh
        # multi-controller SPMD: host-read outputs (the decode pack /
        # hidden chunk) must be replicated — dp-sharded arrays are not
        # fully addressable on any single process
        self.multihost = jax.process_count() > 1
        if mesh is not None:
            tp = mesh.shape[TP_AXIS]
            dp = mesh.shape[DP_AXIS]
            pp = mesh.shape.get(PP_AXIS, 1)
            ep = mesh.shape.get(EP_AXIS, 1)
            validate_tp(cfg, tp, ep)
        self.tp = tp
        self.dp = dp
        self.pp = pp
        self.ep = ep
        # Expert leaves shard over (ep, tp) whenever the mesh carries a
        # dedicated ep axis (even size 1 — the flattened index reduces
        # to the tp index); dense layers stay ep-replicated.
        self.has_ep = mesh is not None and EP_AXIS in mesh.axis_names
        self.ep_axes = (EP_AXIS, TP_AXIS) if self.has_ep else None
        if pp > 1:
            if cfg.num_hidden_layers % pp:
                raise ValueError(
                    f"layers {cfg.num_hidden_layers} not divisible by "
                    f"pp={pp}"
                )
            if config.scheduler.max_num_seqs % (dp * pp):
                raise ValueError(
                    f"max_num_seqs {config.scheduler.max_num_seqs} must "
                    f"divide into dp*pp={dp * pp} microbatches"
                )
        self.fsdp = par.weight_sharding == "fsdp" and dp > 1
        if self.fsdp and cfg.quantization in ("int4", "awq", "int4-awq"):
            raise NotImplementedError(
                "fsdp weight sharding composes with int8/fp8 (plain "
                "[K, N] leaves gather like bf16) but not the packed "
                "int4/AWQ kernels, whose stacked-weight Pallas path "
                "bypasses the per-layer gather"
            )
        # head counts as seen by each tp shard inside shard_map
        self.local_arch = (
            dataclasses.replace(
                cfg,
                num_attention_heads=cfg.num_attention_heads // tp,
                num_key_value_heads=cfg.num_key_value_heads // tp,
            )
            if mesh is not None
            else cfg
        )
        if params is not None:
            self.params = params
        elif config.model_path is not None:
            self.params = load_hf_params(cfg, config.model_path)
        else:
            logger.warning("no model_path: using random-init weights")
            self.params = qwen2.init_params(
                cfg, jax.random.PRNGKey(config.seed)
            )
        if cfg.quantization is not None:
            from ht_vllm_omni_tpu.quantization import quantize_params

            if mesh is None:
                # fuse qkv / gate|up FIRST so quantization produces 4
                # wide group-scale GEMMs per layer instead of 7 narrow
                # ones (decode GEMMs at tiny row counts are
                # dispatch-bound)
                self.params = qwen2.fuse_params(self.params)
            self.params = quantize_params(
                self.params, cfg.quantization,
                quantize_lm_head=getattr(cfg, "quantize_lm_head", True),
            )
        elif mesh is None:
            # single-mesh bf16/f32 path: pack qkv and gate/up into fused
            # GEMMs (no-op when already suffixed — fuse_params checks)
            self.params = qwen2.fuse_params(self.params)

        self.page_size = config.cache.page_size
        self.num_pages = self._derive_num_pages()
        # the slot axis shards over dp: pages partition into dp groups and
        # each request's pages come from its owner group's range; kernels
        # see shard-LOCAL ids (global - group base) in slot mappings and
        # block tables, while scheduler/extract paths keep GLOBAL ids
        if self.num_pages % self.dp:
            self.num_pages -= self.num_pages % self.dp
        self.pages_per_group = self.num_pages // self.dp
        self.max_slots = config.scheduler.max_num_seqs
        self.max_pages_per_seq = cdiv(
            config.scheduler.max_model_len, self.page_size
        )

        kv_name = config.cache.kv_cache_dtype
        if kv_name in ("fp8", "fp8_e4m3"):
            kv_name = "float8_e4m3fn"
        kv_dt = (
            jnp.dtype(cfg.dtype) if kv_name == "auto" else jnp.dtype(kv_name)
        )
        self.kv_int8 = kv_dt == jnp.int8
        self.kv_fp8 = kv_dt == jnp.dtype(jnp.float8_e4m3fn)
        self.kv_quant = self.kv_int8 or self.kv_fp8
        self.true_f = cfg.num_key_value_heads * cfg.head_dim
        two_f = 2 * self.true_f
        if self.kv_quant:
            # 1-byte rows must cover whole (4,128) tiles: pad to 512 elems
            from ht_vllm_omni_tpu.utils import round_up as _ru

            two_f = _ru(two_f, 512)
        self.kv_scales = (
            (config.cache.kv_scale_k, config.cache.kv_scale_v)
            if self.kv_quant
            else None
        )
        # combined flat-slot layout [L, NP*PS, 2*KVH*D (+pad)]: a token's
        # row is [K_feat || V_feat]; kernels view it paged
        kv_shape = (
            cfg.num_hidden_layers,
            self.num_pages * self.page_size,
            two_f,
        )
        if self.mesh is not None:
            specs = param_pspecs(
                cfg, fsdp=self.fsdp, pp=self.pp > 1, ep=self.has_ep
            )
            self.params = {
                k: jax.device_put(
                    v, NamedSharding(self.mesh, specs[k])
                )
                for k, v in self.params.items()
            }
            self.kv_cache = jax.device_put(
                jnp.zeros(kv_shape, kv_dt),
                NamedSharding(
                    self.mesh,
                    P(
                        PP_AXIS if self.pp > 1 else None,
                        DP_AXIS,
                        TP_AXIS,
                    ),
                ),
            )
        else:
            self.kv_cache = jnp.zeros(kv_shape, kv_dt)

        # per-step decode adapter (worker/step_adapter.py): hooks the
        # compiled decode loop's embedding + head; params ride in
        # self.params under a reserved prefix (replicated under a mesh)
        self.step_adapter = None
        if config.step_adapter_spec:
            from ht_vllm_omni_tpu.worker.step_adapter import (
                PARAM_PREFIX,
                build_step_adapter,
            )

            self.step_adapter = build_step_adapter(
                config.step_adapter_spec, cfg, config.seed
            )
            ap = self.step_adapter.init_params()
            if self.mesh is not None:
                rep = NamedSharding(self.mesh, P())
                ap = {k: jax.device_put(v, rep) for k, v in ap.items()}
            self.params.update(
                {PARAM_PREFIX + k: v for k, v in ap.items()}
            )

        # whole-stack fused decode kernel (ops/fused_stack.py): on a
        # single chip, dense bf16/int8 trunks decode through ONE Pallas
        # program that streams weights HBM->VMEM without per-layer
        # custom-call stalls.  The kernel-layout copies duplicate the
        # trunk, so gate on trunk size; interpret mode (CPU tests) is
        # too slow for it unless explicitly forced.
        self.fused_kw = None
        self._build_fused_stack()

        s = self.max_slots
        self.keys = jax.vmap(jax.random.PRNGKey)(
            jnp.arange(s, dtype=jnp.uint32) + config.seed
        )
        # device-resident decode state, written by prefill/decode programs
        self.token_state = jnp.full((s,), _NO_TOKEN, jnp.int32)
        # adapter aux rows ([S, 1] dummy when no adapter so programs and
        # call sites keep one calling convention; column 0 = valid flag)
        aux_w = (
            self.step_adapter.aux_width
            if self.step_adapter is not None
            else 1
        )
        aux0 = jnp.zeros((s, aux_w), jnp.int32)
        self.aux_state = (
            jax.device_put(
                aux0, NamedSharding(self.mesh, P(DP_AXIS, None))
            )
            if self.mesh is not None
            else aux0
        )
        # per-slot seen-token mask (prompt + generated) feeding the
        # repetition penalty; maintained by the decode scan and seeded
        # at prefill only for penalized requests (sample/sampler.py
        # apply_repetition_penalty — the reference applies HF semantics
        # over prompt AND output ids)
        seen0 = jnp.zeros((s, cfg.vocab_size), bool)
        self.seen_mask = (
            jax.device_put(
                seen0, NamedSharding(self.mesh, P(DP_AXIS, None))
            )
            if self.mesh is not None
            else seen0
        )
        # host mirror of scheduler-owned state (pushed to device when dirty)
        self.h_positions = np.zeros(s, np.int32)
        self.h_active = np.zeros(s, bool)
        self.h_emitted = np.zeros(s, np.int32)
        self.h_limit = np.zeros(s, np.int32)  # max emitted tokens
        self.h_min_tokens = np.zeros(s, np.int32)
        self.h_tables = np.zeros((s, self.max_pages_per_seq), np.int32)
        self.h_stops = np.full((s, MAX_STOP_TOKENS), -2, np.int32)
        self.h_fresh = np.zeros(s, bool)
        # M-RoPE decode offset per slot (max multimodal pos + 1 - seq len)
        self.h_rope_delta = np.zeros(s, np.int32)
        self.h_temp = np.zeros(s, np.float32)
        self.h_top_k = np.zeros(s, np.int32)
        self.h_top_p = np.ones(s, np.float32)
        self.h_rep = np.ones(s, np.float32)  # repetition penalty (1=off)
        self.h_allow_lo = np.zeros(s, np.int32)  # [lo, hi) sampling window
        self.h_allow_hi = np.zeros(s, np.int32)  # hi <= lo => full vocab
        self.h_grid_w = np.zeros(s, np.int32)  # t2i grid row width
        self.h_grid_eol = np.full(s, -1, np.int32)  # t2i grid EOL token
        # OpenAI logit_bias rows (sample/sampler.py MAX_LOGIT_BIAS;
        # padding id is a positive OOB so the scatter drops it)
        from ht_vllm_omni_tpu.sample.sampler import MAX_LOGIT_BIAS

        self.h_bias_ids = np.full(
            (s, MAX_LOGIT_BIAS), 1 << 30, np.int32
        )
        self.h_bias_val = np.zeros((s, MAX_LOGIT_BIAS), np.float32)
        # min_p / OpenAI presence+frequency penalties (f32_state rows)
        self.h_min_p = np.zeros(s, np.float32)
        self.h_presence = np.zeros(s, np.float32)
        self.h_freq = np.zeros(s, np.float32)
        # per-slot output-token counts for the frequency penalty
        # (lazy [S, V] int32; single-mesh only)
        self.freq_counts = None

        self._free_slots = list(range(s - 1, -1, -1))
        self._slot_of: dict[str, int] = {}

        self._decode_fns: dict[tuple, object] = {}
        self._tlp_fn = None
        self._prefill_fns: dict[tuple[int, bool], object] = {}

    def _build_fused_stack(self) -> None:
        """(Re)build the fused decode-stack weight copies — OPT-IN via
        HT_FUSED_STACK=1.

        The whole-stack kernel measured ~40% slower than the scanned
        decode path on v5e (ops/fused_stack.py module note: XLA's own
        weight streaming already saturates the chip's practical DMA
        bandwidth), so it is never enabled by default.  Scope when
        forced: no mesh (single chip), dense bf16/int8 trunk, trunk
        bytes within HT_FUSED_STACK_MAX_BYTES (default 2 GiB — the
        kernel-layout copy duplicates the trunk in HBM)."""
        import os

        self.fused_kw = None
        env = os.environ.get("HT_FUSED_STACK", "")
        if env != "1" or self.mesh is not None or self.params is None:
            return
        trunk_keys = (
            "wqkv", "wo", "wgu", "down", "wq", "wk", "wv", "gate", "up"
        )
        trunk_bytes = sum(
            v.size * v.dtype.itemsize
            for k, v in self.params.items()
            if k.split(":", 1)[0] in trunk_keys
        )
        limit = int(
            os.environ.get("HT_FUSED_STACK_MAX_BYTES", 2 << 30)
        )
        if trunk_bytes > limit:
            return
        from ht_vllm_omni_tpu.ops.fused_stack import build_stack_weights

        kw = build_stack_weights(self.arch, self.params)
        if kw is not None:
            kw.pop("int8", None)  # static fact; keep the pytree arrays-only
            self.fused_kw = kw

    # ----------------------------------------------------------- memory
    def _derive_num_pages(self) -> int:
        cache = self.config.cache
        if cache.num_pages is not None:
            return cache.num_pages
        cfg = self.arch
        bytes_per_token = (
            2
            * cfg.num_hidden_layers
            * cfg.num_key_value_heads
            * cfg.head_dim
            * jnp.dtype(cfg.dtype).itemsize
        )
        try:
            stats = jax.local_devices()[0].memory_stats()
            limit = stats["bytes_limit"] * cache.memory_utilization
            free = limit - stats["bytes_in_use"]
        except Exception:
            return _PAGES_DEFAULT_CPU
        pages = int(free // (bytes_per_token * self.page_size))
        return max(pages, 16)

    # ----------------------------------------------------------- slots
    def slot_for(self, request_id: str) -> int:
        slot = self._slot_of.get(request_id)
        if slot is None:
            slot = self._free_slots.pop()
            self._slot_of[request_id] = slot
        return slot

    def token_logprob(self, hidden, row_idx, token):
        """Log-softmax score of ``token`` from one hidden row (the
        prefill-sampled entry token's logprob; raw logits — the chunk
        path scores processed logits instead).  Returns (logprob,
        top_ids [T], top_lps [T])."""
        h = jnp.asarray(hidden)
        if h.ndim == 2:
            idx = row_idx if row_idx >= 0 else h.shape[0] - 1
            h = h[idx]
        fn = self._tlp_fn
        if fn is None:
            fn = self._tlp_fn = jax.jit(
                functools.partial(_token_logprob_prog, self.arch)
            )
        lp, ti, tv = fn(self.params, h, jnp.int32(token))
        return float(lp), np.asarray(ti), np.asarray(tv)

    def release_slot(self, request_id: str) -> None:
        slot = self._slot_of.pop(request_id, None)
        if slot is not None:
            self._free_slots.append(slot)
            self.h_active[slot] = False
            self.h_rep[slot] = 1.0  # stale seen-mask rows become inert

    def _set_rep_penalty(self, slot: int, sp, token_ids) -> None:
        '''Arm the repetition/presence/frequency penalties for a slot.

        Repetition (HF semantics) seeds the seen-mask with the PROMPT
        ids; the OpenAI presence/frequency penalties consider generated
        text only, so they reset the row instead (note: combining
        repetition with presence makes presence see the prompt too —
        they share the seen-mask).  No-op rows never touch the mask.'''
        rep = float(getattr(sp, "repetition_penalty", 1.0) or 1.0)
        pres = float(getattr(sp, "presence_penalty", 0.0) or 0.0)
        freq = float(getattr(sp, "frequency_penalty", 0.0) or 0.0)
        self.h_rep[slot] = rep
        self.h_min_p[slot] = float(getattr(sp, "min_p", 0.0) or 0.0)
        self.h_presence[slot] = pres
        self.h_freq[slot] = freq
        if freq != 0.0:
            if self.freq_counts is None:
                counts = jnp.zeros(
                    (self.max_slots, self.arch.vocab_size), jnp.int32
                )
                if self.mesh is not None:
                    counts = jax.device_put(
                        counts,
                        NamedSharding(self.mesh, P(DP_AXIS, None)),
                    )
                self.freq_counts = counts
        if self.freq_counts is not None:
            self.freq_counts = self.freq_counts.at[slot].set(0)
        if rep != 1.0 and token_ids:
            bucket = max(next_power_of_2(len(token_ids)), 16)
            ids = np.full(bucket, self.arch.vocab_size, np.int32)  # OOB
            ids[: len(token_ids)] = token_ids
            self.seen_mask = _seed_seen(
                self.seen_mask, jnp.int32(slot), jnp.asarray(ids)
            )
        elif pres != 0.0 or freq != 0.0:
            # presence/frequency read the seen-mask: clear any stale
            # entries a previous occupant of this slot left behind
            self.seen_mask = _seed_seen(
                self.seen_mask, jnp.int32(slot),
                jnp.full((16,), self.arch.vocab_size, jnp.int32),
            )

    # ------------------------------------------------- shared device logic
    @staticmethod
    def _stop_mask(tokens, emitted_after, stops, min_tokens, limit):
        """Device-side finished check for freshly sampled tokens [S]."""
        is_stop = jnp.any(tokens[:, None] == stops, axis=-1)
        is_stop = jnp.logical_and(is_stop, emitted_after >= min_tokens)
        return jnp.logical_or(is_stop, emitted_after >= limit)

    # ----------------------------------------------------------- prefill
    @staticmethod
    def _prefill_program(
        cfg,
        collect_hidden: bool,
        tp_axis,
        ep_axis,
        dp_axis,
        fsdp_axis,
        use_embeds: bool,
        kv_scales,
        adapter,
        page_size: int,
        params,
        kv_cache,
        keys,
        token_state,
        aux_state,  # [S, W] int32 adapter rows ([S, 1] dummy when none)
        token_ids,  # [S_pad] int32, or [S_pad, H] prompt embeds
        positions,  # [S_pad]
        slot_mapping,  # [S_pad] slots in the owner dp-group's local cache
        prompt_len,  # scalar
        slot,  # scalar: local slot id within the owner dp group
        dp_owner,  # scalar: dp group that owns this request
        emitted_before,  # scalar (0 unless resumed)
        temperature,  # [1] etc.
        top_k,
        top_p,
        allow,  # [2 + MAX_STOP] int32: lo, hi, stop ids (-2 pad)
        bias_ids=None,  # [1, MAX_LOGIT_BIAS] int32 (logit_bias)
        bias_val=None,  # [1, MAX_LOGIT_BIAS] f32
        guided_mask=None,  # [1, V] bool (guided decoding)
        min_p=None,  # [1] f32
    ):
        if use_embeds == "embeds":
            x = token_ids.astype(params["embed"].dtype)
        elif use_embeds == "overlay":
            ids, overlay, mask = token_ids
            x = jnp.where(
                mask[:, None],
                overlay.astype(params["embed"].dtype),
                qwen2.embed_tokens(params, ids),
            )
        else:
            x = qwen2.embed_tokens(params, token_ids)
        gen_mask = None
        if cfg.use_gen_mlp:
            ids = token_ids[0] if use_embeds == "overlay" else token_ids
            if ids.ndim == 1:
                gen_mask = ids >= cfg.gen_vocab_start
        hidden, kv_rows = qwen2.prefill(
            cfg, params, x, positions, prompt_len, tp_axis=tp_axis,
            ep_axis=ep_axis, fsdp_axis=fsdp_axis, gen_mask=gen_mask,
        )
        if dp_axis is not None:
            # every dp shard computes the (replicated) forward; only the
            # owner group writes its cache / slot state
            is_owner = jax.lax.axis_index(dp_axis) == dp_owner
            slot_mapping = jnp.where(is_owner, slot_mapping, -1)
        # page-granular writes: whole prompts start page-aligned, so
        # each window lands in one page (flush_kv_pages vs the ~6 GB/s
        # row scatter)
        ksc, vsc = kv_scales if kv_scales is not None else (1.0, 1.0)
        kv_cache = flush_kv_pages(
            kv_cache, kv_rows, slot_mapping, page_size=page_size,
            true_f=cfg.num_key_value_heads * cfg.head_dim,
            k_scale=ksc, v_scale=vsc,
        )
        last = jax.lax.dynamic_index_in_dim(
            hidden, prompt_len - 1, axis=0, keepdims=True
        )
        slot_key = keys[slot]
        new_key, step_key = jax.random.split(slot_key)
        if adapter is None:
            logits = qwen2.compute_logits(cfg, params, last)
            win = ARModelRunner._window_logits(
                logits, allow[0:1], allow[1:2], allow[None, 4:]
            )
            logits = ARModelRunner._grid_logits(
                logits, win, jnp.reshape(emitted_before, (1,)),
                allow[2:3], allow[3:4],
            )
            if guided_mask is not None:
                logits = jnp.where(
                    guided_mask, logits, jnp.float32(-1e30)
                )
            token = sample_tokens(
                logits,
                SamplingTensors(
                    temperature, top_k, top_p, bias_ids, bias_val,
                    min_p,
                ),
                step_key[None],
            )[0]
            new_aux = aux_state
        else:
            tok, aux_row = adapter.head(
                params, last, jnp.reshape(prompt_len - 1, (1,))
            )
            token = tok[0]
            new_aux = aux_state.at[slot].set(aux_row[0])
        new_keys = keys.at[slot].set(new_key)
        new_token_state = token_state.at[slot].set(token)
        if dp_axis is not None:
            keep = is_owner
            keys = jax.tree_util.tree_map(
                lambda new, old: jnp.where(keep, new, old), new_keys, keys
            )
            token_state = jnp.where(keep, new_token_state, token_state)
            aux_state = jnp.where(keep, new_aux, aux_state)
        else:
            keys = new_keys
            token_state = new_token_state
            aux_state = new_aux
        out_hidden = hidden if collect_hidden else last
        return kv_cache, keys, token_state, aux_state, out_hidden

    def _set_logit_bias(self, slot: int, sp) -> None:
        """Load a request's OpenAI logit_bias into the slot's device-fed
        rows (sample/sampler.py applies them inside sample_tokens)."""
        from ht_vllm_omni_tpu.sample.sampler import MAX_LOGIT_BIAS

        self.h_bias_ids[slot] = 1 << 30
        self.h_bias_val[slot] = 0.0
        lb = getattr(sp, "logit_bias", None)
        if not lb:
            return
        items = list(lb.items())[:MAX_LOGIT_BIAS]
        for j, (tok, val) in enumerate(items):
            t = int(tok)
            if t >= 0:
                self.h_bias_ids[slot, j] = t
                self.h_bias_val[slot, j] = float(val)

    def _prefill_fn(
        self, bucket: int, collect_hidden: bool, use_embeds: str = "tokens"
    ):
        key = (bucket, collect_hidden, use_embeds)
        fn = self._prefill_fns.get(key)
        if fn is not None:
            return fn
        if self.mesh is None:
            prog = functools.partial(
                self._prefill_program, self.arch, collect_hidden, None, None,
                None, None, use_embeds, self.kv_scales, self.step_adapter,
                self.page_size,
            )
        else:
            is_pp = self.pp > 1
            if is_pp:
                from ht_vllm_omni_tpu.worker.pp_programs import (
                    prefill_program_pp,
                )

                body = functools.partial(
                    prefill_program_pp,
                    self.local_arch,
                    self.pp,
                    collect_hidden,
                    TP_AXIS,
                    self.ep_axes,
                    DP_AXIS,
                    PP_AXIS,
                    DP_AXIS if self.fsdp else None,
                    use_embeds,
                    self.kv_scales,
                    self.step_adapter,
                    self.page_size,
                )
            else:
                body = functools.partial(
                    self._prefill_program,
                    self.local_arch,
                    collect_hidden,
                    TP_AXIS,
                    self.ep_axes,
                    DP_AXIS,
                    DP_AXIS if self.fsdp else None,
                    use_embeds,
                    self.kv_scales,
                    self.step_adapter,
                    self.page_size,
                )
            pspec = self._param_pspecs(is_pp)
            cache_spec = P(
                PP_AXIS if is_pp else None, DP_AXIS, TP_AXIS
            )
            scalar = P()
            in_specs = (
                pspec,  # params
                cache_spec,  # kv_cache
                P(DP_AXIS, None),  # keys
                P(DP_AXIS),  # token_state
                P(DP_AXIS, None),  # aux_state
                scalar,  # token_ids
                scalar,  # positions
                scalar,  # slot_mapping
                scalar,  # prompt_len
                scalar,  # slot
                scalar,  # dp_owner
                scalar,  # emitted_before
                scalar,  # temperature
                scalar,  # top_k
                scalar,  # top_p
                scalar,  # allow (lo, hi, stop ids)
                scalar,  # bias_ids [1, MAX_LOGIT_BIAS]
                scalar,  # bias_val
                scalar,  # guided_mask [1, V]
                scalar,  # min_p [1]
            )
            out_specs = (
                cache_spec,
                P(DP_AXIS, None),
                P(DP_AXIS),
                P(DP_AXIS, None),  # aux_state
                P(),  # hidden (replicated)
            )
            prog = shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
        fn = jax.jit(prog, donate_argnums=(1, 2, 3, 4))
        self._prefill_fns[key] = fn
        return fn

    def _param_pspecs(self, is_pp: bool) -> dict:
        """Partition specs for the live param dict (step-adapter params
        are replicated)."""
        from ht_vllm_omni_tpu.worker.step_adapter import PARAM_PREFIX

        pspec = {
            k: v
            for k, v in param_pspecs(
                self.arch, fsdp=self.fsdp, pp=is_pp, ep=self.has_ep
            ).items()
            if k in self.params
        }
        pspec.update(
            {k: P() for k in self.params if k.startswith(PARAM_PREFIX)}
        )
        return pspec

    def prefill(self, request, guided_mask=None) -> jax.Array:
        """Run one prompt.  Returns the device hidden-state array (last
        position, or all positions when the request wants hidden states);
        the sampled first token lands in device token_state."""
        req = request
        sp = req.sampling_params
        slot = self.slot_for(req.request_id)
        if sp.seed is not None:
            self.keys = self.keys.at[slot].set(jax.random.PRNGKey(sp.seed))

        mm_segments = req.additional_information.get("mm_embeds")
        if req.prompt_embeds is not None:
            use_embeds = "embeds"
            s = len(req.prompt_embeds)
        else:
            use_embeds = "overlay" if mm_segments else "tokens"
            s = len(req.prompt_token_ids)
        bucket = max(next_power_of_2(s), self.page_size)
        if use_embeds == "embeds":
            ids = np.zeros(
                (bucket, self.arch.hidden_size), np.float32
            )
            ids[:s] = np.asarray(req.prompt_embeds, np.float32)
        elif use_embeds == "overlay":
            tok = np.zeros(bucket, np.int32)
            tok[:s] = req.prompt_token_ids
            overlay = np.zeros((bucket, self.arch.hidden_size), np.float32)
            mask = np.zeros(bucket, bool)
            for seg_start, emb in mm_segments:
                emb = np.asarray(emb, np.float32)
                overlay[seg_start : seg_start + len(emb)] = emb
                mask[seg_start : seg_start + len(emb)] = True
            ids = (tok, overlay, mask)
        else:
            ids = np.zeros(bucket, np.int32)
            ids[:s] = req.prompt_token_ids
        mrope = req.additional_information.get("mrope_positions")
        if mrope is not None and self.arch.mrope_sections:
            positions = np.zeros((3, bucket), np.int32)
            positions[:, :s] = np.asarray(mrope, np.int32)
            tail = np.arange(bucket - s, dtype=np.int32)
            positions[:, s:] = positions[:, s - 1 : s] + 1 + tail
            self.h_rope_delta[slot] = int(
                req.additional_information.get("mrope_delta", 0)
            )
        else:
            positions = np.arange(bucket, dtype=np.int32)
            self.h_rope_delta[slot] = 0
        # with dp sharding, slot/page ids are local to the owning dp group
        local_slots = self.max_slots // self.dp
        dp_owner, local_slot = divmod(slot, local_slots)
        slot_map = np.full(bucket, -1, np.int32)
        pages = (
            np.asarray(req.page_ids, np.int32)
            - dp_owner * self.pages_per_group
        )
        idx = np.arange(s)
        slot_map[:s] = pages[idx // self.page_size] * self.page_size + (
            idx % self.page_size
        )

        st = SamplingTensors.from_params([sp], 1)
        fn = self._prefill_fn(bucket, sp.return_hidden_states, use_embeds)
        (
            self.kv_cache,
            self.keys,
            self.token_state,
            self.aux_state,
            hidden,
        ) = fn(
            self.params,
            self.kv_cache,
            self.keys,
            self.token_state,
            self.aux_state,
            ids,
            positions,
            slot_map,
            np.int32(s),
            np.int32(local_slot),
            np.int32(dp_owner),
            np.int32(req.num_output_tokens),
            st.temperature,
            st.top_k,
            st.top_p,
            _allow_vec(sp),
            # logit_bias / guided masks / min_p: the single-mesh jit
            # specializes per-kwarg (None skips the op); the shard_map
            # variant has fixed arity, so identity fillers ride instead
            *(
                (st.bias_ids, st.bias_val, guided_mask, st.min_p)
                if self.mesh is None
                else (
                    st.bias_ids
                    if st.bias_ids is not None
                    else np.full(
                        (1, MAX_LOGIT_BIAS), 1 << 30, np.int32
                    ),
                    st.bias_val
                    if st.bias_val is not None
                    else np.zeros((1, MAX_LOGIT_BIAS), np.float32),
                    guided_mask
                    if guided_mask is not None
                    else np.ones((1, self.arch.vocab_size), bool),
                    st.min_p
                    if st.min_p is not None
                    else np.zeros((1,), np.float32),
                )
            ),
        )
        # host mirror for the upcoming decode chunks
        self.h_positions[slot] = s  # position of the next (sampled) token
        self.h_active[slot] = True
        self.h_fresh[slot] = True
        self._reset_spec(slot, req)
        self.h_emitted[slot] = req.num_output_tokens + 1
        self.h_limit[slot] = sp.max_tokens
        self.h_min_tokens[slot] = sp.min_tokens
        self.h_tables[slot, : len(req.page_ids)] = pages[: len(req.page_ids)]
        stops = (sp.stop_token_ids or [])[:MAX_STOP_TOKENS]
        self.h_stops[slot] = -2
        self.h_stops[slot, : len(stops)] = stops
        if sp.ignore_eos:
            self.h_stops[slot] = -2
        self.h_temp[slot] = sp.temperature
        self.h_top_k[slot] = sp.top_k if sp.top_k > 0 else 64
        self.h_top_p[slot] = sp.top_p
        self._set_rep_penalty(slot, sp, req.prompt_token_ids)
        rng = getattr(sp, "allowed_token_range", None) or (0, 0)
        self.h_allow_lo[slot], self.h_allow_hi[slot] = rng
        self.h_grid_w[slot] = int(getattr(sp, "grid_row_width", 0) or 0)
        self.h_grid_eol[slot] = int(
            getattr(sp, "grid_eol_token_id", -1) or -1
        )
        self._set_logit_bias(slot, sp)
        return hidden

    @staticmethod
    def _prefill_batch_program(
        cfg,
        page_size: int,
        kv_scales,
        params,
        kv_cache,
        keys,
        token_state,
        token_ids,  # [B, T] int32
        positions,  # [B, T]
        slot_mapping,  # [B, T] cache rows (-1 = padding)
        lengths,  # [B]
        slots,  # [B]
        num_out,  # [B] prior output tokens (0 for fresh prompts)
        temperature,  # [B]
        top_k,  # [B]
        top_p,  # [B]
        allow,  # [B, 2 + MAX_STOP] int32
        bias_ids=None,  # [B, MAX_LOGIT_BIAS] int32
        bias_val=None,  # [B, MAX_LOGIT_BIAS] f32
        min_p=None,  # [B] f32
    ):
        x = qwen2.embed_tokens(params, token_ids)
        gen_mask = (
            token_ids >= cfg.gen_vocab_start if cfg.use_gen_mlp else None
        )
        hidden, kv_rows = qwen2.prefill_batch(
            cfg, params, x, positions, lengths, gen_mask=gen_mask,
        )
        ksc, vsc = kv_scales if kv_scales is not None else (1.0, 1.0)
        nl = kv_rows.shape[0]
        kv_cache = flush_kv_pages(
            kv_cache,
            kv_rows.reshape(nl, -1, kv_rows.shape[-1]),
            slot_mapping.reshape(-1),
            page_size=page_size,
            true_f=cfg.num_key_value_heads * cfg.head_dim,
            k_scale=ksc, v_scale=vsc,
        )
        last = jnp.take_along_axis(
            hidden, (lengths - 1)[:, None, None], axis=1
        )[:, 0]
        logits = qwen2.compute_logits(cfg, params, last)
        win = ARModelRunner._window_logits(
            logits, allow[:, 0], allow[:, 1], allow[:, 4:]
        )
        logits = ARModelRunner._grid_logits(
            logits, win, num_out, allow[:, 2], allow[:, 3]
        )
        slot_keys = keys[slots]
        splits = jax.vmap(lambda k: jax.random.split(k, 2))(slot_keys)
        toks = sample_tokens(
            logits,
            SamplingTensors(
                temperature, top_k, top_p, bias_ids, bias_val, min_p
            ),
            splits[:, 1],
        )
        keys = keys.at[slots].set(splits[:, 0])
        token_state = token_state.at[slots].set(toks)
        return kv_cache, keys, token_state

    def prefill_batch(self, requests) -> None:
        """Run several whole prompts in ONE device dispatch (padded to a
        shared power-of-2 bucket).  Eligibility is the caller's job:
        token-ids prompts only, no multimodal overlay, no M-RoPE, no
        hidden-state collection, single-mesh runner.  Sampled first
        tokens land in device token_state, exactly like prefill()."""
        bsz = len(requests)
        s_max = max(len(r.prompt_token_ids) for r in requests)
        bucket = max(next_power_of_2(s_max), self.page_size)
        ids = np.zeros((bsz, bucket), np.int32)
        positions = np.tile(
            np.arange(bucket, dtype=np.int32)[None], (bsz, 1)
        )
        slot_map = np.full((bsz, bucket), -1, np.int32)
        slots = np.zeros(bsz, np.int32)
        lengths = np.zeros(bsz, np.int32)
        num_out = np.zeros(bsz, np.int32)
        for i, req in enumerate(requests):
            sp = req.sampling_params
            slot = self.slot_for(req.request_id)
            if sp.seed is not None:
                self.keys = self.keys.at[slot].set(
                    jax.random.PRNGKey(sp.seed)
                )
            s = len(req.prompt_token_ids)
            ids[i, :s] = req.prompt_token_ids
            pages = self._local_pages(slot, req.page_ids)
            idx = np.arange(s)
            slot_map[i, :s] = pages[idx // self.page_size] * (
                self.page_size
            ) + idx % self.page_size
            slots[i] = slot
            lengths[i] = s
            num_out[i] = req.num_output_tokens
        st = SamplingTensors.from_params(
            [r.sampling_params for r in requests], bsz
        )
        fn = self._prefill_fns.get(("batch", bsz, bucket))
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    self._prefill_batch_program, self.arch,
                    self.page_size, self.kv_scales,
                ),
                donate_argnums=(1, 2, 3),
            )
            self._prefill_fns[("batch", bsz, bucket)] = fn
        self.kv_cache, self.keys, self.token_state = fn(
            self.params, self.kv_cache, self.keys, self.token_state,
            ids, positions, slot_map, lengths, slots, num_out,
            st.temperature, st.top_k, st.top_p,
            np.stack([_allow_vec(r.sampling_params) for r in requests]),
            *(
                (st.bias_ids, st.bias_val, st.min_p)
                if self.mesh is None else ()
            ),
        )
        for i, req in enumerate(requests):
            sp = req.sampling_params
            slot = int(slots[i])
            s = int(lengths[i])
            self.h_rope_delta[slot] = 0
            self.h_positions[slot] = s
            self.h_active[slot] = True
            self.h_fresh[slot] = True
            self._reset_spec(slot, req)
            self.h_emitted[slot] = req.num_output_tokens + 1
            self.h_limit[slot] = sp.max_tokens
            self.h_min_tokens[slot] = sp.min_tokens
            pages = self._local_pages(slot, req.page_ids)
            self.h_tables[slot, : len(req.page_ids)] = pages
            stops = (sp.stop_token_ids or [])[:MAX_STOP_TOKENS]
            self.h_stops[slot] = -2
            if not sp.ignore_eos:
                self.h_stops[slot, : len(stops)] = stops
            self.h_temp[slot] = sp.temperature
            self.h_top_k[slot] = sp.top_k if sp.top_k > 0 else 64
            self.h_top_p[slot] = sp.top_p
            self._set_rep_penalty(slot, sp, req.prompt_token_ids)
            rng = getattr(sp, "allowed_token_range", None) or (0, 0)
            self.h_allow_lo[slot], self.h_allow_hi[slot] = rng
            self.h_grid_w[slot] = int(
                getattr(sp, "grid_row_width", 0) or 0
            )
            self.h_grid_eol[slot] = int(
                getattr(sp, "grid_eol_token_id", -1) or -1
            )
            self._set_logit_bias(slot, sp)

    def _local_pages(self, slot: int, page_ids) -> np.ndarray:
        """Translate a request's global page ids to its dp shard's local
        ids (identity at dp=1)."""
        dp_owner = slot // (self.max_slots // self.dp)
        return (
            np.asarray(page_ids, np.int32)
            - dp_owner * self.pages_per_group
        )

    def sync_tables(self, request) -> None:
        """Refresh a slot's block table from the request's current page
        list.  MUST run every step for decoding requests: the scheduler
        grows page_ids on demand (_ensure_pages) and a stale table column
        silently redirects KV writes/reads of the newly covered
        positions to whatever page id the row held (usually 0)."""
        slot = self._slot_of.get(request.request_id)
        if slot is None:
            return
        self.h_tables[slot, : len(request.page_ids)] = self._local_pages(
            slot, request.page_ids
        )

    @staticmethod
    def _prefill_chunk_program(
        cfg,
        tp_axis,
        ep_axis,
        page_size: int,
        kv_scales,
        adapter,
        params,
        kv_cache,
        keys,
        token_state,
        aux_state,  # [S, W] int32 adapter rows ([S, 1] dummy when none)
        token_ids,  # [T_pad] int32 (or [T_pad, H] embeds — rank keyed)
        positions,  # [T_pad]
        slot_mapping,  # [T_pad] chunk rows' cache slots
        ctx_len,  # scalar
        page_table,  # [P]
        valid_len,  # scalar
        is_final,  # scalar bool: last chunk of the prompt -> sample
        slot,  # scalar
        temperature,
        top_k,
        top_p,
        allow,  # [2 + MAX_STOP] int32
        bias_ids=None,  # [1, MAX_LOGIT_BIAS] int32
        bias_val=None,  # [1, MAX_LOGIT_BIAS] f32
        guided_mask=None,  # [1, V] bool (guided decoding)
        min_p=None,  # [1] f32
    ):
        if token_ids.ndim == 2:
            x = token_ids.astype(params["embed"].dtype)
            gen_mask = None
        else:
            x = qwen2.embed_tokens(params, token_ids)
            gen_mask = (
                token_ids >= cfg.gen_vocab_start
                if cfg.use_gen_mlp else None
            )
        hidden, kv_rows = qwen2.prefill_chunk(
            cfg, params, kv_cache, x, positions, ctx_len, page_table,
            valid_len, page_size=page_size, tp_axis=tp_axis,
            ep_axis=ep_axis, kv_scales=kv_scales, gen_mask=gen_mask,
        )
        ksc, vsc = kv_scales if kv_scales is not None else (1.0, 1.0)
        kv_cache = flush_kv_rows(
            kv_cache, kv_rows, slot_mapping,
            true_f=cfg.num_key_value_heads * cfg.head_dim,
            k_scale=ksc, v_scale=vsc,
        )
        last = jax.lax.dynamic_index_in_dim(
            hidden, valid_len - 1, axis=0, keepdims=True
        )
        slot_key = keys[slot]
        new_key, step_key = jax.random.split(slot_key)
        if adapter is None:
            logits = qwen2.compute_logits(cfg, params, last)
            win = ARModelRunner._window_logits(
                logits, allow[0:1], allow[1:2], allow[None, 4:]
            )
            logits = ARModelRunner._grid_logits(
                logits, win, jnp.zeros((1,), jnp.int32),
                allow[2:3], allow[3:4],
            )
            if guided_mask is not None:
                logits = jnp.where(
                    guided_mask, logits, jnp.float32(-1e30)
                )
            token = sample_tokens(
                logits,
                SamplingTensors(
                    temperature, top_k, top_p, bias_ids, bias_val,
                    min_p,
                ),
                step_key[None],
            )[0]
            new_aux = aux_state
        else:
            tok, aux_row = adapter.head(
                params, last, jnp.reshape(ctx_len + valid_len - 1, (1,))
            )
            token = tok[0]
            new_aux = aux_state.at[slot].set(aux_row[0])
        # only the final chunk samples + advances the slot PRNG
        keys = jnp.where(is_final, keys.at[slot].set(new_key), keys)
        token_state = jnp.where(
            is_final, token_state.at[slot].set(token), token_state
        )
        aux_state = jnp.where(is_final, new_aux, aux_state)
        return kv_cache, keys, token_state, aux_state, hidden

    def _prefill_chunk_fn(self, bucket: int, use_embeds: bool):
        key = ("chunk", bucket, use_embeds)
        fn = self._prefill_fns.get(key)
        if fn is None:
            fn = jax.jit(
                functools.partial(
                    self._prefill_chunk_program, self.arch, None, None,
                    self.page_size, self.kv_scales, self.step_adapter,
                ),
                donate_argnums=(1, 2, 3, 4),
            )
            self._prefill_fns[key] = fn
        return fn

    def prefill_chunk(
        self, request, start: int, num_tokens: int, guided_mask=None
    ):
        """Run prompt tokens [start, start+num) against context pages
        [0, start).  Returns the device hidden array for the chunk."""
        req = request
        sp = req.sampling_params
        slot = self.slot_for(req.request_id)
        if start == 0 and sp.seed is not None:
            self.keys = self.keys.at[slot].set(jax.random.PRNGKey(sp.seed))

        is_final = start + num_tokens >= req.num_prompt_tokens
        use_embeds = req.prompt_embeds is not None
        bucket = max(next_power_of_2(num_tokens), 16)
        if use_embeds:
            ids = np.zeros((bucket, self.arch.hidden_size), np.float32)
            ids[:num_tokens] = np.asarray(
                req.prompt_embeds[start : start + num_tokens], np.float32
            )
        else:
            ids = np.zeros(bucket, np.int32)
            ids[:num_tokens] = req.prompt_token_ids[
                start : start + num_tokens
            ]
        positions = start + np.arange(bucket, dtype=np.int32)
        slot_map = np.full(bucket, -1, np.int32)
        pages = np.asarray(req.page_ids, np.int32)
        idx = start + np.arange(num_tokens)
        slot_map[:num_tokens] = pages[idx // self.page_size] * (
            self.page_size
        ) + idx % self.page_size
        table = np.zeros(self.max_pages_per_seq, np.int32)
        table[: len(pages)] = pages

        st = SamplingTensors.from_params([sp], 1)
        fn = self._prefill_chunk_fn(bucket, use_embeds)
        (self.kv_cache, self.keys, self.token_state, self.aux_state,
         hidden) = fn(
            self.params,
            self.kv_cache,
            self.keys,
            self.token_state,
            self.aux_state,
            ids,
            positions,
            slot_map,
            np.int32(start),
            table,
            np.int32(num_tokens),
            np.bool_(is_final),
            np.int32(slot),
            st.temperature,
            st.top_k,
            st.top_p,
            _allow_vec(sp),
            *(
                (st.bias_ids, st.bias_val, guided_mask, st.min_p)
                if self.mesh is None else ()
            ),
        )
        if is_final:
            s = req.num_prompt_tokens
            self.h_positions[slot] = s
            self.h_active[slot] = True
            self.h_fresh[slot] = True
            self._reset_spec(slot, req)
            self.h_emitted[slot] = req.num_output_tokens + 1
            self.h_limit[slot] = sp.max_tokens
            self.h_min_tokens[slot] = sp.min_tokens
            # chunked prefill ran in global semantics (no shard_map); the
            # decode program's tables are shard-local
            self.h_tables[slot, : len(req.page_ids)] = self._local_pages(
                slot, req.page_ids
            )
            stops = (sp.stop_token_ids or [])[:MAX_STOP_TOKENS]
            self.h_stops[slot] = -2
            self.h_stops[slot, : len(stops)] = stops
            if sp.ignore_eos:
                self.h_stops[slot] = -2
            self.h_rope_delta[slot] = 0
            self.h_temp[slot] = sp.temperature
            self.h_top_k[slot] = sp.top_k if sp.top_k > 0 else 64
            self.h_top_p[slot] = sp.top_p
            self._set_rep_penalty(slot, sp, req.prompt_token_ids)
            rng = getattr(sp, "allowed_token_range", None) or (0, 0)
            self.h_allow_lo[slot], self.h_allow_hi[slot] = rng
            self.h_grid_w[slot] = int(
                getattr(sp, "grid_row_width", 0) or 0
            )
            self.h_grid_eol[slot] = int(
                getattr(sp, "grid_eol_token_id", -1) or -1
            )
            self._set_logit_bias(slot, sp)
        return hidden

    def inject_kv(self, request, kv_rows, prequantized: bool = False) -> None:
        """Populate a slot for a request whose prompt KV was transferred
        from another stage (distributed/kv_transfer.py): flush the rows
        into this cache and prime the decode state — no prefill pass."""
        import jax.numpy as jnp

        req = request
        sp = req.sampling_params
        slot = self.slot_for(req.request_id)
        if sp.seed is not None:
            self.keys = self.keys.at[slot].set(jax.random.PRNGKey(sp.seed))
        n = req.num_prompt_tokens  # rows cover the whole prompt
        idx = np.arange(n)
        pages = np.asarray(req.page_ids, np.int32)
        slots = pages[idx // self.page_size] * self.page_size + (
            idx % self.page_size
        )
        ksc, vsc = self.kv_scales if self.kv_scales else (1.0, 1.0)
        self.kv_cache = flush_kv_rows_donated_entry(
            self.kv_cache, jnp.asarray(kv_rows),
            jnp.asarray(slots, jnp.int32),
            true_f=self.true_f, k_scale=ksc, v_scale=vsc,
            prequantized=prequantized,
        )
        last = req.output_token_ids[-1] if req.output_token_ids else (
            req.prompt_token_ids[-1]
        )
        self.token_state = self.token_state.at[slot].set(jnp.int32(last))
        if self.step_adapter is not None:
            # no adapter feedback rode along with the KV payload: clear
            # the row so decode falls back to plain token embedding
            self.aux_state = self.aux_state.at[slot].set(0)
        self.h_positions[slot] = n
        self.h_active[slot] = True
        self.h_fresh[slot] = False
        self._reset_spec(slot, req)
        self.h_emitted[slot] = req.num_output_tokens
        self.h_limit[slot] = sp.max_tokens
        self.h_min_tokens[slot] = sp.min_tokens
        # the donated flush above ran in global semantics; decode tables
        # are shard-local
        self.h_tables[slot, : len(req.page_ids)] = self._local_pages(
            slot, req.page_ids
        )
        stops = (sp.stop_token_ids or [])[:MAX_STOP_TOKENS]
        self.h_stops[slot] = -2
        self.h_stops[slot, : len(stops)] = stops
        if sp.ignore_eos:
            self.h_stops[slot] = -2
        self.h_temp[slot] = sp.temperature
        self.h_top_k[slot] = sp.top_k if sp.top_k > 0 else 64
        self.h_top_p[slot] = sp.top_p
        self._set_rep_penalty(slot, sp, req.prompt_token_ids)
        rng = getattr(sp, "allowed_token_range", None) or (0, 0)
        self.h_allow_lo[slot], self.h_allow_hi[slot] = rng
        self.h_grid_w[slot] = int(getattr(sp, "grid_row_width", 0) or 0)
        self.h_grid_eol[slot] = int(
            getattr(sp, "grid_eol_token_id", -1) or -1
        )
        self._set_logit_bias(slot, sp)

    # ----------------------------------------------------------- decode
    # int_state row indices (host mirrors packed into ONE h2d transfer —
    # each separate numpy argument costs a full round trip on a tunneled
    # TPU link, ~1-2 ms apiece)
    _ROW_POS = 0
    _ROW_ACTIVE = 1
    _ROW_FRESH = 2
    _ROW_EMITTED = 3
    _ROW_LIMIT = 4
    _ROW_MIN_TOKENS = 5
    _ROW_ROPE_DELTA = 6
    _ROW_TOP_K = 7
    _ROW_ALLOW_LO = 8
    _ROW_ALLOW_HI = 9  # hi <= lo disables the window (full vocab)
    _ROW_GRID_W = 10  # t2i AR-grid row width (0 = off)
    _ROW_GRID_EOL = 11  # forced end-of-line token at column grid_w
    _ROW_STOPS = 12  # .. _ROW_STOPS + MAX_STOP_TOKENS
    _NUM_INT_ROWS = 12 + MAX_STOP_TOKENS

    @staticmethod
    def _window_mask(allow_lo, allow_hi, stops, v):
        """[S, V] bool allow-mask for _window_logits — split out so the
        decode scan can hoist it (it is loop-invariant, but fused
        recomputation cost ~60 us/step on a 152k vocab)."""
        idx = jnp.arange(v, dtype=jnp.int32)[None]
        on = allow_hi > allow_lo
        ok = (idx >= allow_lo[:, None]) & (idx < allow_hi[:, None])
        if stops is not None:
            ok = ok | (idx[:, None, :] == stops[:, :, None]).any(axis=1)
        return ok | jnp.logical_not(on)[:, None]

    @staticmethod
    def _window_logits(logits, allow_lo, allow_hi, stops, mask=None):
        """Constrain sampling to per-slot [lo, hi) token windows plus the
        slot's stop tokens (the reference's constant semantic logit mask,
        fish_speech_slow_ar.py:_semantic_allowed_mask; hi<=lo = off)."""
        if mask is None:
            mask = ARModelRunner._window_mask(
                allow_lo, allow_hi, stops, logits.shape[-1]
            )
        return jnp.where(mask, logits, jnp.float32(-1e30))

    @staticmethod
    def _grid_logits(raw, windowed, emitted, grid_w, grid_eol):
        """MammothModa2 t2i AR-grid constraint (reference
        mammoth_moda2.py:589 _apply_t2i_token_constraints): rows of
        ``grid_w`` tokens end in a forced end-of-line token.  At column
        grid_w only the EOL token survives (from the RAW logits — the
        vocab window excludes it); intra-row the windowed logits apply
        with EOL forbidden.  grid_w == 0 disables."""
        v = raw.shape[-1]
        idx = jnp.arange(v, dtype=jnp.int32)[None]
        on = grid_w > 0
        col = emitted % jnp.maximum(grid_w + 1, 1)
        at_eol = on & (col == grid_w)
        is_eol = idx == grid_eol[:, None]
        eol_only = jnp.where(is_eol, raw, jnp.float32(-1e30))
        intra = jnp.where(
            on[:, None] & is_eol, jnp.float32(-1e30), windowed
        )
        return jnp.where(at_eol[:, None], eol_only, intra)

    @staticmethod
    def _decode_program(
        cfg,
        num_steps: int,
        page_size: int,
        collect_hidden: bool,
        collect_logprobs: bool,
        plain_sampling: bool,
        all_greedy: bool,
        tp_axis,
        ep_axis,
        fsdp_axis,
        kv_scales,
        adapter,
        params,
        kv_cache,  # [L, NSLOTS, 2F] donated; read in-scan, flushed once
        keys,
        token_state,  # [S]
        aux_state,  # [S, W] int32 adapter rows ([S, 1] dummy when none)
        int_state,  # [_NUM_INT_ROWS, S] packed int32 host mirrors
        f32_state,  # [3, S] temperature, top_p, repetition_penalty
        block_tables,  # [S, P]
        seen_mask,  # [S, V] bool donated — repetition-penalty history
        fused_kw=None,  # fused decode-stack weights (single chip only)
        bias_ids=None,  # [S, MAX_LOGIT_BIAS] int32 (logit_bias)
        bias_val=None,  # [S, MAX_LOGIT_BIAS] f32
        guided_slots=None,  # [G] int32 slot ids (s = padding sentinel)
        guided_rows=None,  # [G, V] bool — 1-step guided chunks only
        freq_counts=None,  # [S, V] int32 output-token counts (kwarg ->
        # NOT donated; XLA allocates a fresh output each chunk)
    ):
        R = ARModelRunner
        positions = int_state[R._ROW_POS]
        active = int_state[R._ROW_ACTIVE].astype(bool)
        fresh = int_state[R._ROW_FRESH].astype(bool)
        emitted = int_state[R._ROW_EMITTED]
        limit = int_state[R._ROW_LIMIT]
        min_tokens = int_state[R._ROW_MIN_TOKENS]
        grid_w = int_state[R._ROW_GRID_W]
        grid_eol = int_state[R._ROW_GRID_EOL]
        rope_delta = int_state[R._ROW_ROPE_DELTA]
        top_k = int_state[R._ROW_TOP_K]
        allow_lo = int_state[R._ROW_ALLOW_LO]
        allow_hi = int_state[R._ROW_ALLOW_HI]
        stops = int_state[R._ROW_STOPS :].T  # [S, MAX_STOP]
        temperature = f32_state[0]
        top_p = f32_state[1]
        rep_penalty = f32_state[2]
        min_p = f32_state[3] if f32_state.shape[0] > 3 else None
        presence = f32_state[4] if f32_state.shape[0] > 4 else None
        frequency = f32_state[5] if f32_state.shape[0] > 5 else None
        s = token_state.shape[0]
        if guided_slots is not None:
            # the shard_map variant ships per-dp-shard rows as
            # [1, G] / [1, G, V] (slot ids already dp-local); the
            # single-chip path passes [G] / [G, V] directly
            guided_slots = guided_slots.reshape(-1)
            guided_rows = guided_rows.reshape(
                -1, guided_rows.shape[-1]
            )
        st = SamplingTensors(
            temperature, top_k, top_p, bias_ids, bias_val, min_p
        )
        # prefill-sampled tokens were never stop-checked on device; fold
        # that check in before the first step (only for fresh slots, so a
        # min_tokens-suppressed EOS from an earlier chunk is not re-judged).
        entry_stop = ARModelRunner._stop_mask(
            token_state, emitted, stops, min_tokens, limit
        )
        active = jnp.logical_and(
            active, jnp.logical_not(jnp.logical_and(fresh, entry_stop))
        )
        # the prefill-sampled ENTRY token never passed through the scan's
        # seen update: mark it now so repetition/presence penalties see
        # the first generated token too (idempotent for resumed chunks;
        # counts increment only for FRESH slots — resumed entries were
        # counted when their chunk sampled them)
        if not plain_sampling:
            entry_mark = jnp.where(
                jnp.logical_and(active, token_state >= 0),
                token_state,
                cfg.vocab_size,
            )
            seen_mask = seen_mask.at[
                jnp.arange(s), entry_mark
            ].set(True, mode="drop")
            if freq_counts is not None:
                freq_counts = freq_counts.at[
                    jnp.arange(s),
                    jnp.where(fresh, entry_mark, cfg.vocab_size),
                ].add(1, mode="drop")

        # hoist the (loop-invariant) vocab window mask out of the scan:
        # fused per-step recomputation costs ~60 us on a 152k vocab.
        # plain_sampling (no slot arms penalties / windows / grids, the
        # common text-serving case — decode_chunk checks the host
        # mirrors) skips the whole [S, V] mask/penalty surface: no mask
        # stream, no seen-mask traffic, raw logits straight to the
        # sampler (~40-80 us/step on a 152k vocab)
        win_mask = (
            R._window_mask(allow_lo, allow_hi, stops, cfg.vocab_size)
            if adapter is None and not plain_sampling
            else None
        )

        use_counts = freq_counts is not None

        def step(carry, j):
            if use_counts:
                (keys, tokens, pos, act, emit, kv_cache, seen, aux,
                 counts) = carry
            else:
                keys, tokens, pos, act, emit, kv_cache, seen, aux = carry
                counts = None
            if adapter is None:
                x = qwen2.embed_tokens(params, jnp.maximum(tokens, 0))
            else:
                x = adapter.embed(params, jnp.maximum(tokens, 0), aux)
            gen_mask = (
                jnp.maximum(tokens, 0) >= cfg.gen_vocab_start
                if cfg.use_gen_mlp else None
            )
            if (
                fused_kw is not None
                and tp_axis is None
                and fsdp_axis is None
                and gen_mask is None
                and x.dtype == jnp.bfloat16
            ):
                # whole-stack fused decode (ops/fused_stack.py): one
                # Pallas program per step streams the trunk weights
                from ht_vllm_omni_tpu.models.layers import rope_cos_sin
                from ht_vllm_omni_tpu.ops.fused_stack import (
                    fused_decode_stack,
                )

                cos, sin = rope_cos_sin(
                    pos + rope_delta, cfg.rotary_dim, cfg.rope_theta
                )
                page_col = jnp.clip(
                    pos // page_size, 0, block_tables.shape[1] - 1
                )
                pg = jnp.take_along_axis(
                    block_tables, page_col[:, None], axis=1
                )[:, 0]
                rows_wr = jnp.where(
                    act, pg * page_size + pos % page_size, -1
                )
                past = jnp.where(act, pos, 0)
                ks_, vs_ = (
                    kv_scales if kv_scales is not None else (1.0, 1.0)
                )
                hidden, kv_cache = fused_decode_stack(
                    fused_kw, kv_cache, x, cos, sin, rows_wr, past,
                    block_tables,
                    page_size=page_size,
                    eps=cfg.rms_norm_eps,
                    sm_scale=cfg.head_dim ** -0.5,
                    qh=cfg.num_attention_heads,
                    kvh=cfg.num_key_value_heads,
                    d=cfg.head_dim,
                    inter=cfg.intermediate_size,
                    has_bias="bqkv" in fused_kw,
                    has_qknorm="q_norm" in fused_kw,
                    int8="scale_k" in fused_kw,
                    k_scale=ks_,
                    v_scale=vs_,
                )
            else:
                hidden, kv_cache = qwen2.decode_direct(
                    cfg, params, kv_cache, x, pos, act, block_tables,
                    page_size=page_size,
                    tp_axis=tp_axis, ep_axis=ep_axis,
                    fsdp_axis=fsdp_axis,
                    rope_delta=rope_delta, kv_scales=kv_scales,
                    gen_mask=gen_mask,
                )
            keys, step_keys = _split_keys(keys)
            if adapter is None:
                logits = qwen2.compute_logits(cfg, params, hidden)
                if not plain_sampling:
                    logits = apply_repetition_penalty(
                        logits, seen, rep_penalty
                    )
                    if presence is not None:
                        logits = apply_presence_frequency(
                            logits, seen, presence, counts,
                            frequency if counts is not None else None,
                        )
                    win = R._window_logits(
                        logits, allow_lo, allow_hi, stops, mask=win_mask
                    )
                    logits = R._grid_logits(
                        logits, win, emit, grid_w, grid_eol
                    )
                if guided_rows is not None:
                    # valid for exactly one step (the host re-derives
                    # the DFA mask between tokens; decode_chunk asserts
                    # num_steps == 1 when guided).  Only the guided
                    # slots' rows ride host->device; the scatter
                    # rebuilds the full mask on device (padding slot
                    # ids are positive OOB -> dropped)
                    gm = jnp.ones(
                        (s, logits.shape[-1]), bool
                    ).at[guided_slots].set(guided_rows, mode="drop")
                    logits = jnp.where(gm, logits, jnp.float32(-1e30))
                if all_greedy:
                    # every active slot samples at temperature 0: one
                    # exact argmax, no candidate-pool machinery
                    # (identical tokens — sample_tokens' greedy branch
                    # is the same argmax)
                    from ht_vllm_omni_tpu.sample.sampler import (
                        apply_logit_bias,
                    )

                    sampled = jnp.argmax(
                        apply_logit_bias(
                            logits, st.bias_ids, st.bias_val
                        ),
                        axis=-1,
                    ).astype(jnp.int32)
                else:
                    sampled = sample_tokens(logits, st, step_keys)
                # record the sampled token (inactive rows scatter OOB);
                # plain_sampling skips it — no slot will ever read seen
                if not plain_sampling:
                    seen = seen.at[
                        jnp.arange(s),
                        jnp.where(act, sampled, cfg.vocab_size),
                    ].set(True, mode="drop")
                if use_counts:
                    counts = counts.at[
                        jnp.arange(s),
                        jnp.where(act, sampled, cfg.vocab_size),
                    ].add(1, mode="drop")
                if collect_logprobs:
                    # log-softmax over the PROCESSED logits (what was
                    # actually sampled from, reference logprobs mode)
                    lse = jax.nn.logsumexp(logits, axis=-1)
                    lp = jnp.take_along_axis(
                        logits,
                        jnp.maximum(sampled, 0)[:, None],
                        axis=-1,
                    )[:, 0] - lse
                    top_v, top_i = jax.lax.top_k(logits, MAX_TOP_LOGPROBS)
                    top_v = top_v - lse[:, None]
            else:
                sampled, aux_new = adapter.head(params, hidden, pos)
                aux = jnp.where(act[:, None], aux_new, aux)
            if collect_logprobs and adapter is not None:
                lp = jnp.zeros((s,), jnp.float32)
                top_v = jnp.zeros((s, MAX_TOP_LOGPROBS), jnp.float32)
                top_i = jnp.zeros((s, MAX_TOP_LOGPROBS), jnp.int32)
            sampled = jnp.where(act, sampled, _NO_TOKEN)
            emit = emit + act.astype(jnp.int32)
            stop = ARModelRunner._stop_mask(
                sampled, emit, stops, min_tokens, limit
            )
            new_act = jnp.logical_and(act, jnp.logical_not(stop))
            pos = pos + act.astype(jnp.int32)
            out = (sampled, hidden) if collect_hidden else (sampled,)
            if collect_logprobs:
                out = out + (lp, top_i.astype(jnp.int32), top_v)
            new_carry = (
                keys, sampled, pos, new_act, emit, kv_cache, seen, aux,
            )
            if use_counts:
                new_carry = new_carry + (counts,)
            return new_carry, out

        entry_tokens = token_state
        init = (keys, token_state, positions, active, emitted, kv_cache,
                seen_mask, aux_state)
        if use_counts:
            init = init + (freq_counts,)
        carry, outs = jax.lax.scan(
            step, init, jnp.arange(num_steps, dtype=jnp.int32)
        )
        (keys, token_state, positions, active, emitted, kv_cache,
         seen_mask, aux_state) = carry[:8]
        freq_counts = carry[8] if use_counts else None

        # Pack every host-bound scalar array into ONE int32 matrix so the
        # host pays a single d2h sync (~30 ms on a tunneled TPU) per chunk:
        # rows 0..K = tokens (row 0 = entry/prefill tokens the host hasn't
        # seen); then positions, active, emitted.
        packed = jnp.concatenate(
            [
                entry_tokens[None],
                outs[0],
                positions[None],
                active.astype(jnp.int32)[None],
                emitted[None],
            ],
            axis=0,
        )
        ret = (kv_cache, keys, token_state, aux_state, packed)
        if collect_hidden:
            ret = ret + (outs[1],)
        if collect_logprobs:
            ret = ret + tuple(outs[-3:])
        ret = ret + (seen_mask,)
        if use_counts:
            ret = ret + (freq_counts,)
        return ret

    def _decode_fn(
        self, num_steps: int, collect_hidden: bool,
        collect_logprobs: bool = False,
        has_bias: bool = False, has_guided: bool = False,
        use_counts: bool = False, plain: bool = False,
        greedy: bool = False,
    ):
        if self.mesh is None:
            # single-chip extras ride as kwargs on one jitted fn (jit
            # re-specializes per kwarg set); only the shard_map variant
            # needs distinct positional arity per extras combination
            has_bias = has_guided = use_counts = False
        key = (num_steps, collect_hidden, collect_logprobs,
               has_bias, has_guided, use_counts, plain, greedy)
        fn = self._decode_fns.get(key)
        if fn is not None:
            return fn
        if self.mesh is None:
            prog = functools.partial(
                self._decode_program,
                self.arch,
                num_steps,
                self.page_size,
                collect_hidden,
                collect_logprobs,
                plain,
                greedy,
                None,
                None,
                None,
                self.kv_scales,
                self.step_adapter,
            )
        else:
            is_pp = self.pp > 1
            if is_pp:
                from ht_vllm_omni_tpu.worker.pp_programs import (
                    decode_program_pp,
                )

                body = functools.partial(
                    decode_program_pp,
                    self.local_arch,
                    num_steps,
                    self.page_size,
                    self.pp,
                    TP_AXIS,
                    self.ep_axes,
                    PP_AXIS,
                    DP_AXIS if self.fsdp else None,
                    self.kv_scales,
                    ARModelRunner,
                    collect_hidden,
                    collect_logprobs,
                    self.step_adapter,
                )
            else:
                body = functools.partial(
                    self._decode_program,
                    self.local_arch,
                    num_steps,
                    self.page_size,
                    collect_hidden,
                    collect_logprobs,
                    plain,
                    greedy,
                    TP_AXIS,
                    self.ep_axes,
                    DP_AXIS if self.fsdp else None,
                    self.kv_scales,
                    self.step_adapter,
                )
            # optional per-slot sampling extras (logit_bias rows, guided
            # vocab masks, frequency counts) enter the shard_map
            # positionally after seen_mask — dp-sharded like the slot
            # arrays they index (guided rows are pre-localized per dp
            # group host-side, see decode_chunk)
            extra_names: list[str] = []
            extra_specs: list = []
            if has_bias:
                extra_names += ["bias_ids", "bias_val"]
                extra_specs += [P(DP_AXIS, None), P(DP_AXIS, None)]
            if has_guided:
                extra_names += ["guided_slots", "guided_rows"]
                extra_specs += [P(DP_AXIS, None), P(DP_AXIS, None, None)]
            if use_counts:
                extra_names += ["freq_counts"]
                extra_specs += [P(DP_AXIS, None)]
            if extra_names:
                base_body = body

                def body(
                    params, kv_cache, keys, token_state, aux_state,
                    int_state, f32_state, block_tables, seen_mask,
                    *extras,
                ):
                    return base_body(
                        params, kv_cache, keys, token_state, aux_state,
                        int_state, f32_state, block_tables, seen_mask,
                        **dict(zip(extra_names, extras)),
                    )

            pspec = self._param_pspecs(is_pp)
            cache_spec = P(
                PP_AXIS if is_pp else None, DP_AXIS, TP_AXIS
            )
            slotdim = P(DP_AXIS)
            in_specs = (
                pspec,
                cache_spec,  # kv_cache
                P(DP_AXIS, None),  # keys
                slotdim,  # token_state
                P(DP_AXIS, None),  # aux_state
                P(None, DP_AXIS),  # int_state
                P(None, DP_AXIS),  # f32_state
                P(DP_AXIS, None),  # block_tables
                P(DP_AXIS, None),  # seen_mask
                *extra_specs,
            )
            out = [
                cache_spec,  # kv_cache
                P(DP_AXIS, None),  # keys
                slotdim,  # token_state
                P(DP_AXIS, None),  # aux_state
                P(None, DP_AXIS),  # packed
            ]
            if collect_hidden:
                out.append(P(None, DP_AXIS, None))  # hidden [K, S, H]
            if collect_logprobs:
                out.append(P(None, DP_AXIS))  # chosen logprob [K, S]
                out.append(P(None, DP_AXIS, None))  # top ids [K, S, T]
                out.append(P(None, DP_AXIS, None))  # top lps [K, S, T]
            out.append(P(DP_AXIS, None))  # seen_mask
            if use_counts:
                out.append(P(DP_AXIS, None))  # freq_counts
            if self.multihost:
                # host-read outputs must be fully addressable on every
                # process: gather the (tiny) pack + hidden over dp, the
                # only axis that crosses DCN (parallel/multihost.py)
                body = _gather_host_outs(body, collect_hidden)
                out[4] = P()
                if collect_hidden:
                    out[5] = P()
            prog = shard_map(
                body,
                mesh=self.mesh,
                in_specs=in_specs,
                out_specs=tuple(out),
                check_vma=False,
            )
        fn = jax.jit(prog, donate_argnums=(1, 2, 3, 4, 8))
        self._decode_fns[key] = fn
        return fn

    def decode_chunk(
        self, num_steps: int, collect_hidden: bool = False,
        collect_logprobs: bool = False, guided_mask=None,
    ) -> tuple[np.ndarray, np.ndarray | None, tuple | None]:
        """guided_mask: {slot: [V] bool} for active guided requests
        (1-step chunks only); everything else decodes unmasked."""
        """Run K decode steps on device; one host sync total.

        Returns (tokens [K+1, S], hidden [K, S, H]?): row 0 holds the
        tokens that sat in device token_state at entry (prefill-sampled
        tokens the host has not seen yet); rows 1..K are this chunk's
        samples.  hidden row j is the hidden state of step j's input
        token."""
        has_bias = bool(self.h_bias_val.any())
        use_counts = (
            self.freq_counts is not None and bool(self.h_freq.any())
        )
        # the common text-serving case: nothing in the batch arms the
        # [S, V]-wide logit surface (penalties / vocab windows / grid /
        # guided) -> compile the plain program that never touches the
        # seen-mask or window streams
        a = self.h_active
        plain = bool(
            guided_mask is None
            and not use_counts
            and (not a.any() or (
                not (self.h_rep[a] != 1.0).any()
                and not self.h_presence[a].any()
                and not (self.h_allow_hi[a] > self.h_allow_lo[a]).any()
                and not self.h_grid_w[a].any()
            ))
        )
        greedy = bool(
            not a.any() or not (self.h_temp[a] > 0.0).any()
        )
        fn = self._decode_fn(
            num_steps, collect_hidden, collect_logprobs,
            has_bias=has_bias, has_guided=guided_mask is not None,
            use_counts=use_counts, plain=plain, greedy=greedy,
        )
        # trim the block-table width to the live-page envelope (bucketed
        # to powers of two so at most log2(P) shapes compile): the paged
        # grid then never iterates dead table columns.  Width must cover
        # positions + num_steps — the end-of-chunk flush derives its
        # write slots from these same (trimmed) tables.
        if self.h_active.any():
            live = int(self.h_positions[self.h_active].max()) + num_steps
        else:
            live = 1
        width = min(
            max(next_power_of_2(cdiv(max(live, 1), self.page_size)), 1),
            self.max_pages_per_seq,
        )
        s = self.max_slots
        int_state = np.empty((self._NUM_INT_ROWS, s), np.int32)
        int_state[self._ROW_POS] = self.h_positions
        int_state[self._ROW_ACTIVE] = self.h_active
        int_state[self._ROW_FRESH] = self.h_fresh
        int_state[self._ROW_EMITTED] = self.h_emitted
        int_state[self._ROW_LIMIT] = self.h_limit
        int_state[self._ROW_MIN_TOKENS] = self.h_min_tokens
        int_state[self._ROW_ROPE_DELTA] = self.h_rope_delta
        int_state[self._ROW_TOP_K] = self.h_top_k
        int_state[self._ROW_ALLOW_LO] = self.h_allow_lo
        int_state[self._ROW_ALLOW_HI] = self.h_allow_hi
        int_state[self._ROW_GRID_W] = self.h_grid_w
        int_state[self._ROW_GRID_EOL] = self.h_grid_eol
        int_state[self._ROW_STOPS :] = self.h_stops.T
        f32_state = np.stack([
            self.h_temp, self.h_top_p, self.h_rep,
            self.h_min_p, self.h_presence, self.h_freq,
        ])
        fused = (
            {"fused_kw": self.fused_kw}
            if self.mesh is None and self.fused_kw is not None
            else {}
        )
        extras: list = []  # positional extras for the shard_map variant
        if has_bias:
            if self.mesh is None:
                fused["bias_ids"] = self.h_bias_ids
                fused["bias_val"] = self.h_bias_val
            else:
                extras += [self.h_bias_ids, self.h_bias_val]
        if guided_mask is not None:
            assert num_steps == 1, (
                "guided chunks are 1 step wide (the host advances the "
                "grammar DFA between tokens)"
            )
            g = len(guided_mask)
            gpad = max(next_power_of_2(g), 1)
            if self.mesh is None:
                slots_arr = np.full(gpad, self.max_slots, np.int32)
                rows_arr = np.ones(
                    (gpad, self.arch.vocab_size), bool
                )
                for i, (sl, row) in enumerate(guided_mask.items()):
                    slots_arr[i] = sl
                    rows_arr[i] = row
                fused["guided_slots"] = slots_arr
                fused["guided_rows"] = rows_arr
            else:
                # per-dp-group rows with LOCAL slot ids: shard g sees
                # [1, G]/[1, G, V]; other groups' entries stay at the
                # local-OOB sentinel so their scatter drops them
                local_slots = self.max_slots // self.dp
                slots_arr = np.full(
                    (self.dp, gpad), local_slots, np.int32
                )
                rows_arr = np.ones(
                    (self.dp, gpad, self.arch.vocab_size), bool
                )
                for i, (sl, row) in enumerate(guided_mask.items()):
                    grp, loc = divmod(sl, local_slots)
                    slots_arr[grp, i] = loc
                    rows_arr[grp, i] = row
                extras += [slots_arr, rows_arr]
        if use_counts:
            if self.mesh is None:
                fused["freq_counts"] = self.freq_counts
            else:
                extras += [self.freq_counts]
        res = fn(
            self.params,
            self.kv_cache,
            self.keys,
            self.token_state,
            self.aux_state,
            int_state,
            f32_state,
            np.ascontiguousarray(self.h_tables[:, :width]),
            self.seen_mask,
            *extras,
            **fused,
        )
        (self.kv_cache, self.keys, self.token_state, self.aux_state,
         packed) = res[:5]
        if use_counts:
            self.freq_counts = res[-1]
            self.seen_mask = res[-2]
        else:
            self.seen_mask = res[-1]
        host = np.asarray(packed)  # [K+4, S]; the single sync point
        hidden = np.asarray(res[5]) if collect_hidden else None
        logprobs = None
        if collect_logprobs:
            base = 6 if collect_hidden else 5
            logprobs = (
                np.asarray(res[base]),       # chosen [K, S]
                np.asarray(res[base + 1]),   # top ids [K, S, T]
                np.asarray(res[base + 2]),   # top lps [K, S, T]
            )
        tokens = host[: num_steps + 1]
        # device mirrors advance exactly as the host would recompute them;
        # keep numpy mirrors in lockstep without further syncs
        self.h_positions = host[num_steps + 1].copy()
        self.h_active = host[num_steps + 2].astype(bool)
        self.h_emitted = host[num_steps + 3].copy()
        self.h_fresh[:] = False
        return tokens, hidden, logprobs


def _split_keys(keys):
    splits = jax.vmap(lambda k: jax.random.split(k, 2))(keys)
    return splits[:, 0], splits[:, 1]


def _token_logprob_prog(cfg, params, hidden_row, token):
    logits = qwen2.compute_logits(cfg, params, hidden_row[None])[0]
    lse = jax.nn.logsumexp(logits)
    top_v, top_i = jax.lax.top_k(logits, MAX_TOP_LOGPROBS)
    return logits[token] - lse, top_i.astype(jnp.int32), top_v - lse


@functools.partial(jax.jit, donate_argnums=(0,))
def _seed_seen(mask, slot, token_ids):
    """Reset a slot's seen-token row and mark its prompt ids (padding
    is vocab_size -> dropped)."""
    mask = mask.at[slot].set(False)
    return mask.at[slot, token_ids].set(True, mode="drop")


def _gather_host_outs(body, collect_hidden):
    """Multi-host decode: all_gather the host-read outputs (packed
    [K+4, S_local] and optional hidden [K, S_local, H]) over dp so every
    process holds the full arrays (dp is the cross-DCN axis)."""

    def run(*args):
        out = body(*args)
        packed = jax.lax.all_gather(out[4], DP_AXIS, axis=1, tiled=True)
        out = out[:4] + (packed,) + out[5:]
        if collect_hidden:
            hid = jax.lax.all_gather(
                out[5], DP_AXIS, axis=1, tiled=True
            )
            out = out[:5] + (hid,)
        return out

    return run


