"""Pipeline-parallel (pp) shard_map program bodies for the AR runner.

TPU-native replacement of the reference's pipeline-parallel process
groups (reference vllm_omni/diffusion/distributed/group_coordinator.py:548
and vLLM's PP worker ranks): layers shard over the mesh's pp axis
(parallel/mesh.py param_pspecs(pp=True); the KV cache's layer axis
shards the same way) and activations move stage-to-stage with a single
ring ``ppermute`` per round — ICI traffic, no host involvement.

Decode uses a rotating-microbatch schedule: the dp-local slot range
splits into pp microbatches; microbatch m enters stage 0 at round
t*pp + m for its decode step t, so at any round every stage is busy with
a different microbatch — steady-state utilization approaches 100% over a
K-step chunk (total rounds K*pp + pp - 1).  Sampling happens on the last
stage; the sampled token rides the ring's wrap-around edge back to stage
0 as the microbatch's next-step input.

Prefill uses a simple ring wave (the true activation propagates one
stage per round; each stage keeps its own layers' KV rows when the wave
passes).  Stages recompute redundantly off the wave — acceptable for the
one-shot prompt pass; chunked prefill pipelines chunks naturally.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.models.layers import rms_norm
from ht_vllm_omni_tpu.sample.sampler import (
    MAX_TOP_LOGPROBS,
    SamplingTensors,
    apply_presence_frequency,
    apply_repetition_penalty,
    sample_tokens,
)

_NO_TOKEN = -1


def _ring(pp_axis: str, pp: int, *arrays):
    perm = [(i, (i + 1) % pp) for i in range(pp)]
    return tuple(
        jax.lax.ppermute(a, pp_axis, perm) for a in arrays
    )


def _bcast_from(val, pp_axis: str, src_pred):
    """Broadcast ``val`` from the stage where src_pred is True (exactly
    one stage) to every pp stage via masked psum."""
    zero = jnp.zeros_like(val)
    return jax.lax.psum(jnp.where(src_pred, val, zero), pp_axis)


def decode_program_pp(
    cfg,
    num_steps: int,
    page_size: int,
    pp: int,
    tp_axis,
    ep_axis,
    pp_axis,
    fsdp_axis,
    kv_scales,
    runner_cls,
    collect_hidden,
    collect_logprobs,
    adapter,
    params,
    kv_cache,  # [L/pp, NSLOTS_local, 2F_local] donated
    keys,  # [S_l, 2]
    token_state,  # [S_l]
    aux_state,  # [S_l, W] int32 step-adapter rows ([S_l, 1] when none)
    int_state,  # [_NUM_INT_ROWS, S_l]
    f32_state,  # [3, S_l] temperature, top_p, repetition_penalty
    block_tables,  # [S_l, P]
    seen_mask,  # [S_l, V] bool — repetition-penalty history
    bias_ids=None,  # [S_l, MAX_LOGIT_BIAS] int32 (logit_bias)
    bias_val=None,  # [S_l, MAX_LOGIT_BIAS] f32
    guided_slots=None,  # [1, G] int32 dp-local slot ids (s_l = pad)
    guided_rows=None,  # [1, G, V] bool — 1-step guided chunks only
    freq_counts=None,  # [S_l, V] int32 output-token counts
):
    """Per-shard body (shard_map over (dp, pp, tp)); same in/out
    signature as ARModelRunner._decode_program.  With collect_hidden the
    per-step hidden states exist only on the LAST pp stage (it owns the
    final layers + norm), so they are gathered there per round and
    broadcast to all pp shards at the end — this is what lets
    thinker->talker pipelines (return_hidden_states) run under pp>1.
    Step adapters (worker/step_adapter.py) run their head on the last
    stage too; the aux row rides the microbatch ring back to stage 0,
    whose adapter embed consumes it next step.

    Sampling extras (logit_bias, guided vocab masks, frequency counts,
    logprobs) apply where the logits live — the LAST pp stage; their
    updated state / collected streams broadcast to all pp shards at the
    end like the token stream (reference serves these regardless of
    parallel config — upstream vLLM v1 samples on the final PP rank)."""
    R = runner_cls
    p = jax.lax.axis_index(pp_axis)
    positions = int_state[R._ROW_POS]
    active = int_state[R._ROW_ACTIVE].astype(bool)
    fresh = int_state[R._ROW_FRESH].astype(bool)
    emitted = int_state[R._ROW_EMITTED]
    limit = int_state[R._ROW_LIMIT]
    min_tokens = int_state[R._ROW_MIN_TOKENS]
    rope_delta = int_state[R._ROW_ROPE_DELTA]
    top_k = int_state[R._ROW_TOP_K]
    allow_lo = int_state[R._ROW_ALLOW_LO]
    allow_hi = int_state[R._ROW_ALLOW_HI]
    stops = int_state[R._ROW_STOPS :].T  # [S_l, MAX_STOP]
    temperature = f32_state[0]
    top_p = f32_state[1]
    rep_penalty = f32_state[2]
    min_p = f32_state[3] if f32_state.shape[0] > 3 else None
    presence = f32_state[4] if f32_state.shape[0] > 4 else None
    frequency = f32_state[5] if f32_state.shape[0] > 5 else None

    s_l = token_state.shape[0]
    s_mb = s_l // pp
    k_steps = num_steps
    h_dim = params["embed"].shape[1]
    l_local = kv_cache.shape[0]
    true_f = cfg.num_key_value_heads * cfg.head_dim
    dt = params["embed"].dtype
    use_counts = freq_counts is not None

    entry_stop = R._stop_mask(token_state, emitted, stops, min_tokens, limit)
    active0 = jnp.logical_and(
        active, jnp.logical_not(jnp.logical_and(fresh, entry_stop))
    )
    seq_lens0 = jnp.where(active0, positions, 0)
    pos0 = positions
    entry_tokens = token_state

    # prefill-sampled entry tokens never passed the loop's seen update:
    # mark them so repetition/presence/frequency penalties see the first
    # generated token too (mirrors _decode_program; idempotent for
    # resumed chunks — counts increment only for FRESH slots)
    entry_mark = jnp.where(
        jnp.logical_and(active0, token_state >= 0),
        token_state, cfg.vocab_size,
    )
    seen_mask = seen_mask.at[
        jnp.arange(s_l), entry_mark
    ].set(True, mode="drop")
    if use_counts:
        freq_counts = freq_counts.at[
            jnp.arange(s_l),
            jnp.where(fresh, entry_mark, cfg.vocab_size),
        ].add(1, mode="drop")

    if guided_slots is not None:
        # [1, G]/[1, G, V] per-dp-shard rows with dp-LOCAL slot ids;
        # scatter onto the full mask (padding slot ids drop)
        guided_slots = guided_slots.reshape(-1)
        guided_rows = guided_rows.reshape(-1, guided_rows.shape[-1])
        guided_full = jnp.ones(
            (s_l, guided_rows.shape[-1]), bool
        ).at[guided_slots].set(guided_rows, mode="drop")

    def sl1(a, off):
        return jax.lax.dynamic_slice_in_dim(a, off, s_mb, axis=0)

    def up1(a, v, off):
        return jax.lax.dynamic_update_slice_in_dim(a, v, off, axis=0)

    rounds = k_steps * pp + pp - 1

    def round_body(r, carry):
        (keys, kv_cache, seen, counts, tokens_out, hidden_out, lp_out,
         ti_out, tv_out, fin_tok, fin_pos, fin_act, fin_emit, fin_aux,
         bh, btok, bpos, bact, bemit, baux) = carry
        m = jnp.mod(r - p, pp)
        t_raw = (r - p) // pp
        valid = jnp.logical_and(r >= p, t_raw < k_steps)
        t = jnp.clip(t_raw, 0, k_steps - 1)
        off = m * s_mb

        is_entry = jnp.logical_and(p == 0, t == 0)
        tok_in = jnp.where(is_entry, sl1(entry_tokens, off), btok)
        pos_in = jnp.where(is_entry, sl1(pos0, off), bpos)
        act_in = jnp.where(is_entry, sl1(active0, off), bact)
        emit_in = jnp.where(is_entry, sl1(emitted, off), bemit)
        aux_in = jnp.where(is_entry, sl1(aux_state, off), baux)
        act_eff = jnp.logical_and(act_in, valid)

        if adapter is None:
            x = qwen2.embed_tokens(params, jnp.maximum(tok_in, 0))
        else:
            x = adapter.embed(params, jnp.maximum(tok_in, 0), aux_in)
        h_in = jnp.where(p == 0, x, bh).astype(dt)

        tables_m = jax.lax.dynamic_slice(
            block_tables, (off, 0), (s_mb, block_tables.shape[1])
        )
        rdelta_m = sl1(rope_delta, off)

        # direct paged-cache writes: act_eff is False on warm-up/drain
        # rounds, so their rows scatter out-of-bounds (dropped) and never
        # overwrite a microbatch's valid KV
        hidden, kv_cache = qwen2.decode_direct(
            cfg, params, kv_cache, h_in, pos_in, act_eff, tables_m,
            page_size=page_size,
            tp_axis=tp_axis, ep_axis=ep_axis, fsdp_axis=fsdp_axis,
            final_norm=False,
            rope_delta=rdelta_m, kv_scales=kv_scales,
        )

        # ---- last stage: norm + head (logits sample or adapter)
        hn = rms_norm(hidden, params["norm_f"], cfg.rms_norm_eps)
        keys_m = sl1(keys, off)
        splits = jax.vmap(lambda kk: jax.random.split(kk, 2))(keys_m)
        keys_m_new, step_keys = splits[:, 0], splits[:, 1]
        if adapter is None:
            logits = qwen2.compute_logits(cfg, params, hn)
            seen_m = jax.lax.dynamic_slice(
                seen, (off, 0), (s_mb, seen.shape[1])
            )
            logits = apply_repetition_penalty(
                logits, seen_m, sl1(rep_penalty, off)
            )
            if presence is not None:
                counts_m = (
                    jax.lax.dynamic_slice(
                        counts, (off, 0), (s_mb, counts.shape[1])
                    )
                    if use_counts else None
                )
                logits = apply_presence_frequency(
                    logits, seen_m, sl1(presence, off), counts_m,
                    sl1(frequency, off) if use_counts else None,
                )
            logits = R._window_logits(
                logits, sl1(allow_lo, off), sl1(allow_hi, off),
                sl1(stops, off),
            )
            if guided_slots is not None:
                gm = jax.lax.dynamic_slice(
                    guided_full, (off, 0), (s_mb, guided_full.shape[1])
                )
                logits = jnp.where(gm, logits, jnp.float32(-1e30))
            st = SamplingTensors(
                sl1(temperature, off), sl1(top_k, off), sl1(top_p, off),
                bias_ids=(
                    jax.lax.dynamic_slice(
                        bias_ids, (off, 0), (s_mb, bias_ids.shape[1])
                    )
                    if bias_ids is not None else None
                ),
                bias_val=(
                    jax.lax.dynamic_slice(
                        bias_val, (off, 0), (s_mb, bias_val.shape[1])
                    )
                    if bias_val is not None else None
                ),
                min_p=sl1(min_p, off) if min_p is not None else None,
            )
            sampled = sample_tokens(logits, st, step_keys)
            if collect_logprobs:
                # over the PROCESSED logits (post-penalties/window/mask
                # but pre-bias — bias applies inside sample_tokens;
                # matches _decode_program which also computes over the
                # pre-bias processed logits)
                lse = jax.nn.logsumexp(logits, axis=-1)
                lp_m = jnp.take_along_axis(
                    logits, jnp.maximum(sampled, 0)[:, None], axis=-1
                )[:, 0] - lse
                tv_m, ti_m = jax.lax.top_k(logits, MAX_TOP_LOGPROBS)
                tv_m = tv_m - lse[:, None]
            cols = jnp.where(
                jnp.logical_and(act_eff, p == pp - 1),
                sampled, seen.shape[1],
            )
            seen = seen.at[
                off + jnp.arange(s_mb), cols
            ].set(True, mode="drop")
            if use_counts:
                counts = counts.at[
                    off + jnp.arange(s_mb), cols
                ].add(1, mode="drop")
            aux_new = aux_in
        else:
            sampled, aux_new = adapter.head(params, hn, pos_in)
            aux_new = jnp.where(act_eff[:, None], aux_new, aux_in)
            if collect_logprobs:
                lp_m = jnp.zeros((s_mb,), jnp.float32)
                tv_m = jnp.zeros((s_mb, MAX_TOP_LOGPROBS), jnp.float32)
                ti_m = jnp.zeros((s_mb, MAX_TOP_LOGPROBS), jnp.int32)
        sampled = jnp.where(act_eff, sampled, _NO_TOKEN)
        emit_new = emit_in + act_eff.astype(jnp.int32)
        stop = R._stop_mask(
            sampled, emit_new, sl1(stops, off), sl1(min_tokens, off),
            sl1(limit, off),
        )
        act_new = jnp.logical_and(act_eff, jnp.logical_not(stop))
        pos_new = pos_in + act_eff.astype(jnp.int32)

        is_last = p == pp - 1
        do = jnp.logical_and(is_last, valid)
        keys = jnp.where(do, up1(keys, keys_m_new, off), keys)
        row = jax.lax.dynamic_slice(tokens_out, (t, off), (1, s_mb))
        row = jnp.where(do, sampled[None, :], row)
        tokens_out = jax.lax.dynamic_update_slice(tokens_out, row, (t, off))
        if collect_hidden:
            hrow = jax.lax.dynamic_slice(
                hidden_out, (t, off, 0), (1, s_mb, h_dim)
            )
            hrow = jnp.where(do, hn[None], hrow)
            hidden_out = jax.lax.dynamic_update_slice(
                hidden_out, hrow, (t, off, 0)
            )
        if collect_logprobs:
            lrow = jax.lax.dynamic_slice(lp_out, (t, off), (1, s_mb))
            lp_out = jax.lax.dynamic_update_slice(
                lp_out, jnp.where(do, lp_m[None], lrow), (t, off)
            )
            irow = jax.lax.dynamic_slice(
                ti_out, (t, off, 0), (1, s_mb, MAX_TOP_LOGPROBS)
            )
            ti_out = jax.lax.dynamic_update_slice(
                ti_out, jnp.where(do, ti_m[None], irow), (t, off, 0)
            )
            vrow = jax.lax.dynamic_slice(
                tv_out, (t, off, 0), (1, s_mb, MAX_TOP_LOGPROBS)
            )
            tv_out = jax.lax.dynamic_update_slice(
                tv_out, jnp.where(do, tv_m[None], vrow), (t, off, 0)
            )
        fin = jnp.logical_and(do, t == k_steps - 1)
        fin_tok = jnp.where(fin, up1(fin_tok, sampled, off), fin_tok)
        fin_pos = jnp.where(fin, up1(fin_pos, pos_new, off), fin_pos)
        fin_act = jnp.where(fin, up1(fin_act, act_new, off), fin_act)
        fin_emit = jnp.where(fin, up1(fin_emit, emit_new, off), fin_emit)
        fin_aux = jnp.where(
            fin,
            jax.lax.dynamic_update_slice(fin_aux, aux_new, (off, 0)),
            fin_aux,
        )

        # ---- ring handoff (stage pp-1 wraps to stage 0 with the token)
        bh_o = hidden
        btok_o = jnp.where(is_last, sampled, tok_in)
        bpos_o = jnp.where(is_last, pos_new, pos_in)
        bact_o = jnp.where(is_last, act_new, act_in)
        bemit_o = jnp.where(is_last, emit_new, emit_in)
        baux_o = jnp.where(is_last, aux_new, aux_in)
        bh, btok, bpos, bact, bemit, baux = _ring(
            pp_axis, pp, bh_o, btok_o, bpos_o, bact_o, bemit_o, baux_o
        )
        return (keys, kv_cache, seen, counts, tokens_out, hidden_out,
                lp_out, ti_out, tv_out, fin_tok, fin_pos, fin_act,
                fin_emit, fin_aux, bh, btok, bpos, bact, bemit, baux)

    aux_w = aux_state.shape[1]
    init = (
        keys,
        kv_cache,
        seen_mask,
        freq_counts if use_counts else jnp.zeros((1, 1), jnp.int32),
        jnp.full((k_steps, s_l), _NO_TOKEN, jnp.int32),
        jnp.zeros((k_steps, s_l, h_dim) if collect_hidden else (1,), dt),
        jnp.zeros((k_steps, s_l) if collect_logprobs else (1,),
                  jnp.float32),
        jnp.zeros(
            (k_steps, s_l, MAX_TOP_LOGPROBS) if collect_logprobs
            else (1,), jnp.int32,
        ),
        jnp.zeros(
            (k_steps, s_l, MAX_TOP_LOGPROBS) if collect_logprobs
            else (1,), jnp.float32,
        ),
        token_state,
        pos0,
        active0,
        emitted,
        aux_state,
        jnp.zeros((s_mb, h_dim), dt),
        jnp.full((s_mb,), _NO_TOKEN, jnp.int32),
        jnp.zeros((s_mb,), jnp.int32),
        jnp.zeros((s_mb,), bool),
        jnp.zeros((s_mb,), jnp.int32),
        jnp.zeros((s_mb, aux_w), jnp.int32),
    )
    (keys, kv_cache, seen_mask, freq_out, tokens_out, hidden_out,
     lp_out, ti_out, tv_out, fin_tok, fin_pos, fin_act, fin_emit,
     fin_aux, *_) = jax.lax.fori_loop(0, rounds, round_body, init)
    # the mask is written on the last pp stage only; align all shards
    seen_mask = _bcast_from(
        seen_mask.astype(jnp.int32), pp_axis, p == pp - 1
    ).astype(bool)
    if use_counts:
        freq_counts = _bcast_from(freq_out, pp_axis, p == pp - 1)
    if collect_logprobs:
        lp_out = _bcast_from(lp_out, pp_axis, p == pp - 1)
        ti_out = _bcast_from(ti_out, pp_axis, p == pp - 1)
        tv_out = _bcast_from(tv_out, pp_axis, p == pp - 1)

    # broadcast the last stage's bookkeeping to every pp shard so the
    # returned (pp-replicated) state agrees everywhere
    is_last = p == pp - 1
    keys = _bcast_from(keys, pp_axis, is_last)
    tokens_out = _bcast_from(tokens_out, pp_axis, is_last)
    if collect_hidden:
        hidden_out = _bcast_from(hidden_out, pp_axis, is_last)
    fin_tok = _bcast_from(fin_tok, pp_axis, is_last)
    fin_pos = _bcast_from(fin_pos, pp_axis, is_last)
    fin_act = _bcast_from(fin_act.astype(jnp.int32), pp_axis, is_last)
    fin_emit = _bcast_from(fin_emit, pp_axis, is_last)
    fin_aux = _bcast_from(fin_aux, pp_axis, is_last)

    packed = jnp.concatenate(
        [
            entry_tokens[None],
            tokens_out,
            fin_pos[None],
            fin_act[None],
            fin_emit[None],
        ],
        axis=0,
    )
    # return order mirrors _decode_program: packed, hidden?, logprobs?,
    # seen, counts?
    ret = (kv_cache, keys, fin_tok, fin_aux, packed)
    if collect_hidden:
        ret = ret + (hidden_out,)
    if collect_logprobs:
        ret = ret + (lp_out, ti_out, tv_out)
    ret = ret + (seen_mask,)
    if use_counts:
        ret = ret + (freq_counts,)
    return ret


def prefill_program_pp(
    cfg,
    pp: int,
    collect_hidden: bool,
    tp_axis,
    ep_axis,
    dp_axis,
    pp_axis,
    fsdp_axis,
    use_embeds,
    kv_scales,
    adapter,
    page_size,
    params,
    kv_cache,
    keys,
    token_state,
    aux_state,  # [S, W] int32 step-adapter rows
    token_ids,
    positions,
    slot_mapping,
    prompt_len,
    slot,
    dp_owner,
    emitted_before,
    temperature,
    top_k,
    top_p,
    allow,  # [2 + MAX_STOP] int32: lo, hi, stop ids (-2 pad)
    bias_ids=None,  # [1, MAX_LOGIT_BIAS] int32 (logit_bias)
    bias_val=None,  # [1, MAX_LOGIT_BIAS] f32
    guided_mask=None,  # [1, V] bool (guided decoding, first token)
    min_p=None,  # [1] f32
):
    """Per-shard prefill body: ring wave over pp stages; each stage keeps
    its local layers' KV rows when the true activation passes through."""
    from ht_vllm_omni_tpu.ops.kv_cache_update import flush_kv_pages

    p = jax.lax.axis_index(pp_axis)
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

    s_pad = x.shape[0]
    l_local = (
        params["ln1"].shape[0]
        if "ln1" in params
        else kv_cache.shape[0]
    )
    true_f = cfg.num_key_value_heads * cfg.head_dim
    f_local = true_f  # cfg is the tp-local arch here

    def rnd(rr, carry):
        h, rows_keep = carry
        h_out, kv_rows = qwen2.prefill(
            cfg, params, h, positions, prompt_len,
            tp_axis=tp_axis, ep_axis=ep_axis, fsdp_axis=fsdp_axis,
            final_norm=False,
        )
        my_turn = (p == rr)[None, None, None]
        rows_keep = jnp.where(my_turn, kv_rows, rows_keep)
        (h,) = _ring(pp_axis, pp, h_out)
        return h, rows_keep

    rows0 = jnp.zeros((l_local, s_pad, 2 * f_local), x.dtype)
    h, rows_keep = jax.lax.fori_loop(0, pp, rnd, (x, rows0))
    # after pp rounds the true final hidden sits on stage 0
    h = rms_norm(h, params["norm_f"], cfg.rms_norm_eps)
    h = _bcast_from(h, pp_axis, p == 0)

    sm = slot_mapping
    if dp_axis is not None:
        is_owner = jax.lax.axis_index(dp_axis) == dp_owner
        sm = jnp.where(is_owner, sm, -1)
    else:
        is_owner = jnp.bool_(True)
    ksc, vsc = kv_scales if kv_scales is not None else (1.0, 1.0)
    kv_cache = flush_kv_pages(
        kv_cache, rows_keep, sm, page_size=page_size, true_f=true_f,
        k_scale=ksc, v_scale=vsc,
    )

    last = jax.lax.dynamic_index_in_dim(
        h, prompt_len - 1, axis=0, keepdims=True
    )
    slot_key = keys[slot]
    new_key, step_key = jax.random.split(slot_key)
    if adapter is None:
        logits = qwen2.compute_logits(cfg, params, last)
        from ht_vllm_omni_tpu.worker.model_runner import ARModelRunner

        logits = ARModelRunner._window_logits(
            logits, allow[0:1], allow[1:2], allow[None, 4:]
        )  # grid constraint (allow[2:4]) is single-mesh-only
        if guided_mask is not None:
            logits = jnp.where(guided_mask, logits, jnp.float32(-1e30))
        token = sample_tokens(
            logits,
            SamplingTensors(
                temperature, top_k, top_p, bias_ids, bias_val, min_p
            ),
            step_key[None],
        )[0]
        new_aux = aux_state
    else:
        # h is broadcast from stage 0 and adapter params are replicated,
        # so every pp stage computes the identical head output
        tok, aux_row = adapter.head(
            params, last, jnp.reshape(prompt_len - 1, (1,))
        )
        token = tok[0]
        new_aux = aux_state.at[slot].set(aux_row[0])
    # every pp stage computed the same (broadcast) outputs with the same
    # key, so the updates below agree across pp without further traffic
    new_keys = keys.at[slot].set(new_key)
    new_token_state = token_state.at[slot].set(token)
    keep = is_owner
    keys = jax.tree_util.tree_map(
        lambda new, old: jnp.where(keep, new, old), new_keys, keys
    )
    token_state = jnp.where(keep, new_token_state, token_state)
    aux_state = jnp.where(keep, new_aux, aux_state)
    out_hidden = h if collect_hidden else last
    return kv_cache, keys, token_state, aux_state, out_hidden
