"""Whole-stack fused decode step: the full L-layer transformer in ONE
Pallas kernel.  **Measured result: does NOT beat the scanned XLA path
on v5e — kept as an opt-in experiment (HT_FUSED_STACK=1), default off.**

Hypothesis: at decode shapes every XLA<->Pallas boundary stalls the
weight prefetch pipeline (the per-layer paged-attention custom call
costs ~11 us/layer in situ vs ~1.5 us standalone), so one mega-program
that streams weights HBM->VMEM through a double-buffered tile ring
should run at the HBM roofline — the TPU analog of the reference's
CUDA graphs (SURVEY §2.9 "CUDA-graph wrappers").

Measurement (v5e, qwen2.5-0.5B shapes, bs8, 24 layers, short context):
  * raw Pallas DMA ring, zero compute:      ~425 GB/s (2 slots),
    ~560 GB/s (4 slots) — the chip's practical DMA ceiling, well under
    the 819 GB/s spec;
  * XLA's own scanned trunk (no attention): ~1.19 ms/step = 603 GB/s
    effective — XLA's weight streaming already matches manual DMA;
  * this kernel (any ring depth/ablation):  ~2.3 ms/step.
So the premise is false on this hardware: XLA leaves no streaming
bandwidth on the table, the only recoverable cost is the ~270 us/step
of attention-launch overhead, and the kernel's own structure costs
more than that.  The scanned decode path (models/qwen2.decode_direct)
is therefore ~the practical roofline and stays the default; this file
remains as a correct, tested, opt-in alternative and as the record of
why the mega-kernel approach loses here.

Scope: dense trunks (Qwen2/2.5/3 shapes — optional qkv bias, optional
q/k RMSNorm, full rotary, SwiGLU MLP) on a single chip, bf16 or
int8-quantized weights (int8 tiles upcast in-register on the MXU
operand path; per-out-channel scales fold into the tile outputs).
MoE / dual-FFN / LoRA / tp>1 fall back to the scanned decode path
(models/qwen2.decode_direct), which stays the source of truth for
semantics — the unit tests pin this kernel against it.

Mosaic constraints shape the body (vector reshapes that split/merge
the lane dim are "unsupported shape cast"; bf16 batched dot_generals
don't lower):
  * q/k/v are extracted from the qkv output with per-head 2-D lane
    slices, roped/normed in 2-D, and round-tripped through small VMEM
    scratch refs (integer-indexed stores/loads change rank, vector
    reshapes never happen);
  * attention is round-batched across sequences with f32 3-D
    dot_generals per kv head (the per-sequence 2-D form lives in
    ops/paged_attention._decode_attn_kernel; this one keeps all S
    sequences in flight per page round);
  * wo / down tiles stay in natural (contraction-major) layout so the
    attention output and MLP activations feed them as 2-D operands.

Weight layout: built once by ``build_stack_weights`` so every DMA is a
uniform [tile_rows, H] slab:

    wqkv_k [L, QKV_pad, H]  out-major rows (y = x . tile^T)
    wo_k   [L, QN_pad,  H]  natural rows = attention-out features
    wgu_k  [L, 2*I_pad, H]  chunk-interleaved out-major rows:
                            [gate_c ; up_c] per I-chunk c
    wdown_k[L, I_pad,   H]  natural rows, same I-chunking as wgu

so the MLP never materializes a [S, 2I] vector: per chunk,
a_c = silu(x@gate_c^T) * (x@up_c^T) feeds the matching down rows.

The paged KV cache is aliased in/out (in-place row writes; the cache
is a scan carry in the caller exactly as with decode_direct).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ht_vllm_omni_tpu.utils import pallas_interpret_mode, round_up

NEG_INF = float("-inf")
_TILE_TARGET = 2432  # rows per weight DMA slab (~4.2 MB bf16 at K=896)


def plan_tiles(qkv_n: int, qn: int, inter: int, d: int) -> tuple:
    """((ntq, rq), (nto, ro), (ntm, rm)) — qkv / wo / MLP-chunk tile
    schedules.  wo rows stay d-aligned (per-head sublane slices) and
    the total DMA-entry count (ntq + nto + 3*ntm) is kept EVEN so the
    2-slot buffer parity is layer-invariant."""

    def stage(n, align, extra=0):
        nt = max(1, -(-n // _TILE_TARGET)) + extra
        rows = round_up(-(-n // nt), align)
        return nt, rows

    ntq, rq = stage(qkv_n, 16)
    nto, ro = stage(qn, d)
    ntm, rm = stage(inter, 16)
    if (ntq + nto + 3 * ntm) % 2:
        ntq, rq = stage(qkv_n, 16, extra=1)
    return (ntq, rq), (nto, ro), (ntm, rm)


def build_stack_weights(cfg, params: dict) -> dict | None:
    """One-time kernel-layout copies of the hot per-layer weights.

    Returns None when the param tree is outside this kernel's scope
    (quantization suffixes other than :q8, LoRA, MoE, dual-FFN,
    post-norms, partial rotary).  The caller keeps the original tree
    for prefill; the duplication is the trunk only (~0.7 GB bf16 on a
    0.5B model) and is gated to single-chip dense configs by the
    runner.
    """
    keys = set(params)
    if any(
        ":" in k and not k.endswith((":q8", ":s8")) for k in keys
    ):
        return None
    if any(k in keys for k in ("router", "dgate", "lora_scale",
                               "post_ln1", "post_ln2")):
        return None
    if getattr(cfg, "rope_interleaved", False):
        return None
    if cfg.rotary_dim != cfg.head_dim:
        return None
    int8 = any(k.endswith(":q8") for k in keys)

    def get(name):
        """(weight [L, in, out], per-out-channel scale [L, out] | None)."""
        if int8:
            if name + ":q8" not in params:
                return None, None
            return params[name + ":q8"], params[name + ":s8"]
        return params.get(name), None

    def cat(names, axis):
        pairs = [get(n) for n in names]
        if any(w is None for w, _ in pairs):
            return None, None
        ws = [w for w, _ in pairs]
        ss = [s for _, s in pairs]
        w = jnp.concatenate(ws, axis=axis) if len(ws) > 1 else ws[0]
        if ss[0] is None:
            return w, None
        return w, (jnp.concatenate(ss, axis=-1) if len(ss) > 1 else ss[0])

    if "wqkv" in keys or "wqkv:q8" in keys:
        wqkv, sqkv = get("wqkv")
    else:
        wqkv, sqkv = cat(("wq", "wk", "wv"), axis=-1)
    if "wgu" in keys or "wgu:q8" in keys:
        wgu, sgu = get("wgu")
    else:
        wgu, sgu = cat(("gate", "up"), axis=-1)
    wo, so = get("wo")
    wdown, sdown = get("down")
    if any(w is None for w in (wqkv, wgu, wo, wdown)):
        return None
    if int8 and any(
        s is None for s in (sqkv, sgu, so, sdown)
    ):
        return None

    d = cfg.head_dim
    qn = cfg.num_attention_heads * d
    f = cfg.num_key_value_heads * d
    h = cfg.hidden_size
    inter = cfg.intermediate_size
    qkv_n = qn + 2 * f
    nl = wqkv.shape[0]
    (ntq, rq), (nto, ro), (ntm, rm) = plan_tiles(qkv_n, qn, inter, d)

    def pad_rows(w, n_pad):
        if w.shape[1] == n_pad:
            return w
        return jnp.pad(w, ((0, 0), (0, n_pad - w.shape[1]), (0, 0)))

    # gate/up chunk-interleaved out-major rows: [gate_c ; up_c] per
    # I-chunk (edge chunks zero-padded — padded rows produce a_c = 0)
    wgu_t = wgu.transpose(0, 2, 1)  # [L, 2I, out-major rows of H]
    gu_blocks = []
    for c in range(ntm):
        g_blk = wgu_t[:, c * rm : (c + 1) * rm]
        u_blk = wgu_t[:, inter + c * rm : inter + (c + 1) * rm]
        g_blk = pad_rows(g_blk, rm)
        u_blk = pad_rows(u_blk, rm)
        gu_blocks += [g_blk, u_blk]
    out = {
        "wqkv_k": pad_rows(wqkv.transpose(0, 2, 1), ntq * rq),
        "wo_k": pad_rows(wo, nto * ro),  # natural [L, QN, H]
        "wgu_k": jnp.concatenate(gu_blocks, axis=1),
        "wdown_k": pad_rows(wdown, ntm * rm),  # natural [L, I, H]
        "ln1": params["ln1"],
        "ln2": params["ln2"],
        "norm_f": params["norm_f"],
        "int8": int8,
    }
    if int8:
        def pad_s(sc, n_pad):  # [L, N] -> [L, n_pad] f32
            sc = sc.astype(jnp.float32)
            if sc.shape[1] == n_pad:
                return sc
            return jnp.pad(sc, ((0, 0), (0, n_pad - sc.shape[1])))

        # per-out-channel scales for the transposed entries (qkv +
        # gate/up chunks) in flat tile-row order; wo/down are natural
        # layout so their out-channel scales apply after accumulation
        s_blocks = [pad_s(sqkv, ntq * rq)]
        for c in range(ntm):
            s_blocks.append(pad_s(sgu[:, c * rm : (c + 1) * rm], rm))
            s_blocks.append(
                pad_s(sgu[:, inter + c * rm : inter + (c + 1) * rm], rm)
            )
        out["scale_k"] = jnp.concatenate(s_blocks, axis=-1)
        out["so_k"] = so.astype(jnp.float32)  # [L, H]
        out["sdown_k"] = sdown.astype(jnp.float32)  # [L, H]
    if "bqkv" in params:
        out["bqkv"] = params["bqkv"]
    elif "bq" in params:
        out["bqkv"] = jnp.concatenate(
            [params["bq"], params["bk"], params["bv"]], axis=-1
        )
    if "q_norm" in params:
        out["q_norm"] = params["q_norm"]
        out["k_norm"] = params["k_norm"]
    return out


def _rms2(x, w_row, eps):
    """2-D RMSNorm: x [S, D] (any float), w_row [1, D] f32 -> f32."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)) * w_row


def _rope2(x, cos, sin):
    """2-D rotary: x [S, D] f32, cos/sin [S, D] f32 -> f32."""
    half = x.shape[-1] // 2
    rot = jnp.concatenate([-x[:, half:], x[:, :half]], axis=-1)
    return x * cos + rot * sin


def _stack_kernel(
    # scalar prefetch
    rows_w_ref,  # [S] int32 cache row for this step's K/V (-1 = skip)
    past_ref,  # [S] int32 past tokens (= position)
    block_tables_ref,  # [S, P] int32
    # VMEM inputs
    x_ref,  # [S, H] bf16
    cos_ref,  # [S, D] f32
    sin_ref,  # [S, D] f32
    past_v_ref,  # [S, 1] int32 (vector copy of past lens)
    ln1_ref,  # [L, H]
    ln2_ref,  # [L, H]
    normf_ref,  # [1, H]
    bqkv_ref,  # [L, QKV_pad] (zeros when absent)
    qn_ref,  # [L, D] q_norm weight (ones when absent)
    kn_ref,  # [L, D]
    scale_ref,  # [L, NTQ*RQ + NTM*2*RM] f32 (int8) or [1, 1]
    so_ref,  # [L, H] f32 (int8) or [1, 1]
    sdown_ref,  # [L, H] f32 (int8) or [1, 1]
    # HBM inputs
    wqkv_ref,  # [L, NTQ*RQ, H]
    wo_ref,  # [L, NTO*RO, H] natural
    wgu_ref,  # [L, NTM*2*RM, H] chunk-interleaved
    wdown_ref,  # [L, NTM*RM, H] natural
    kv_ref,  # [L, NSLOTS, 2Fc] HBM — READ ONLY (past pages)
    # outputs
    rows_out_ref,  # [L, S, 2Fc] this step's K/V rows (caller scatters)
    h_out_ref,  # [S, H] bf16
    # scratch
    wbuf,  # [2, TR, H] weight dtype
    wsem,  # DMA (2,)
    pbuf,  # [2, S, ps, 2Fc]
    psem,  # DMA (2, S)
    qsc,  # [S, KVH, G, D] f32 roped queries
    aosc,  # [S, KVH, G, D] bf16 attention outputs
    *,
    cfg_static: tuple,
):
    (s, h, qh, kvh, d, group, inter, nl, page_size, max_p,
     num_pages, eps, sm_scale, has_bias, has_qknorm, int8,
     k_scale, v_scale, tiles, two_fc) = cfg_static
    f = kvh * d
    qn = qh * d
    qkv_n = qn + 2 * f
    (ntq, rq), (nto, ro), (ntm, rm) = tiles
    n_entries = ntq + nto + 3 * ntm

    # static flat entry schedule in compute order:
    #   qkv tiles (T), wo tiles (N), per MLP chunk: gate (T), up (T),
    #   down (N).  (kind, ref, row0, rows, scale_off | -1)
    entries = []
    soff = 0
    for t in range(ntq):
        entries.append(("T", wqkv_ref, t * rq, rq, soff))
        soff += rq
    for t in range(nto):
        entries.append(("N", wo_ref, t * ro, ro, -1))
    for c in range(ntm):
        entries.append(("T", wgu_ref, (2 * c) * rm, rm, soff))
        soff += rm
        entries.append(("T", wgu_ref, (2 * c + 1) * rm, rm, soff))
        soff += rm
        entries.append(("N", wdown_ref, c * rm, rm, -1))

    def w_dma(e, li, slot):
        _, ref, row0, rows, _ = entries[e]
        return pltpu.make_async_copy(
            ref.at[li, pl.ds(row0, rows), :],
            wbuf.at[slot, pl.ds(0, rows), :],
            wsem.at[slot],
        )

    def matmul_t(x, e, slot, li):
        """x [S, H] . tile^T -> [S, rows] f32 (+ int8 output scales)."""
        _, _, _, rows, so_ = entries[e]
        w = wbuf[slot, pl.ds(0, rows), :]
        if int8:
            w = w.astype(jnp.bfloat16)
        y = jax.lax.dot_general(
            x, w,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if int8 and so_ >= 0:
            y = y * scale_ref[pl.ds(li, 1), pl.ds(so_, rows)]
        return y

    def matmul_n(a, e, slot, row0=0, rows=None):
        """a [S, rows] . tile[row0:row0+rows] -> [S, H] f32 partial
        (natural layout; out-channel scales applied by the caller)."""
        if rows is None:
            rows = entries[e][3]
        w = wbuf[slot, pl.ds(row0, rows), :]
        if int8:
            w = w.astype(jnp.bfloat16)
        return jax.lax.dot_general(
            a, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def page_dma(rbuf, r, li):
        """Issue the S page fetches of round r (clamped to valid)."""
        for b in range(s):
            pcol = jnp.minimum(r, max_p - 1)
            page = jnp.clip(block_tables_ref[b, pcol], 0, num_pages - 1)
            pltpu.make_async_copy(
                kv_ref.at[li, pl.ds(page * page_size, page_size), :],
                pbuf.at[rbuf, b],
                psem.at[rbuf, b],
            ).start()

    def page_wait(rbuf, li):
        for b in range(s):
            pltpu.make_async_copy(
                kv_ref.at[li, pl.ds(0, page_size), :],
                pbuf.at[rbuf, b],
                psem.at[rbuf, b],
            ).wait()

    # prologue: first weight tile of layer 0
    w_dma(0, 0, 0).start()

    def layer(li, x):
        # x: [S, H] f32 (bf16-rounded residual stream)
        def slot(e_):
            return e_ % 2

        def nxt(e_):
            """Issue entry e_+1 (next layer's entry 0 after the last;
            n_entries is even so slot parity is layer-invariant)."""
            if e_ + 1 < n_entries:
                w_dma(e_ + 1, li, slot(e_ + 1)).start()
            else:
                @pl.when(li + 1 < nl)
                def _():
                    w_dma(0, li + 1, slot(0)).start()

        n_rounds = jax.lax.div(
            jnp.max(past_v_ref[...]) + page_size - 1, page_size
        )

        # round-0 pages fetch while the qkv tile streams
        @pl.when(n_rounds > 0)
        def _():
            page_dma(0, 0, li)

        # ---- qkv projection
        xn = _rms2(x, ln1_ref[pl.ds(li, 1), :], eps)
        xb = xn.astype(jnp.bfloat16)
        y_parts = []
        for t in range(ntq):
            nxt(t)
            w_dma(t, li, slot(t)).wait()
            y_parts.append(matmul_t(xb, t, slot(t), li))
        y = (
            jnp.concatenate(y_parts, axis=-1) if ntq > 1 else y_parts[0]
        )[:, :qkv_n]
        if has_bias:
            y = y + bqkv_ref[pl.ds(li, 1), pl.ds(0, qkv_n)].astype(
                jnp.float32
            )

        cos = cos_ref[...]
        sin = sin_ref[...]
        qn_row = qn_ref[pl.ds(li, 1), :]
        kn_row = kn_ref[pl.ds(li, 1), :]

        # ---- per-head extraction (2-D lane slices; no vector reshape)
        kfresh = []
        vfresh = []
        for hh in range(kvh):
            kx = y[:, qn + hh * d : qn + (hh + 1) * d].astype(
                jnp.bfloat16
            ).astype(jnp.float32)
            if has_qknorm:
                kx = _rms2(kx.astype(jnp.bfloat16), kn_row, eps)
                kx = kx.astype(jnp.bfloat16).astype(jnp.float32)
            kx = _rope2(kx, cos, sin).astype(jnp.bfloat16)
            vx = y[:, qn + f + hh * d : qn + f + (hh + 1) * d].astype(
                jnp.bfloat16
            )
            # stage this head's K/V columns of this step's cache row
            # (scattered into the paged cache by the caller; the kernel
            # itself never needs them — past-token masking excludes the
            # current row and the fresh fold is in-register)
            kf32 = kx.astype(jnp.float32)
            vf32 = vx.astype(jnp.float32)
            cdt = rows_out_ref.dtype

            def to_cache(v, scale):
                # matches ops/kv_cache_update.quantize_rows exactly
                v = v.astype(jnp.float32) / scale if scale != 1.0 else v
                if cdt == jnp.int8:
                    v = jnp.clip(jnp.round(v.astype(jnp.float32)),
                                 -127, 127)
                elif cdt == jnp.dtype(jnp.float8_e4m3fn):
                    v = jnp.clip(v.astype(jnp.float32), -448.0, 448.0)
                return v.astype(cdt)

            rows_out_ref[li, :, hh * d : (hh + 1) * d] = to_cache(
                kx, k_scale
            )
            rows_out_ref[li, :, f + hh * d : f + (hh + 1) * d] = (
                to_cache(vx, v_scale)
            )
            kfresh.append(kf32)
            vfresh.append(vf32)
        if two_fc != 2 * f:  # int8 alignment padding columns
            rows_out_ref[li, :, 2 * f :] = jnp.zeros(
                (s, two_fc - 2 * f), rows_out_ref.dtype
            )
        for hq in range(qh):
            qx = y[:, hq * d : (hq + 1) * d].astype(
                jnp.bfloat16
            ).astype(jnp.float32)
            if has_qknorm:
                qx = _rms2(qx.astype(jnp.bfloat16), qn_row, eps)
                qx = qx.astype(jnp.bfloat16).astype(jnp.float32)
            qx = _rope2(qx, cos, sin).astype(jnp.bfloat16)
            qsc[:, hq // group, hq % group, :] = qx.astype(jnp.float32)

        # ---- attention over past pages (round-batched, f32 3-D dots)
        past_b = past_v_ref[...][:, :, None]  # [S, 1, 1]

        def round_body(r, carry):
            @pl.when(r + 1 < n_rounds)
            def _():
                page_dma(jax.lax.rem(r + 1, 2), r + 1, li)

            rbuf = jax.lax.rem(r, 2)
            page_wait(rbuf, li)
            new = []
            for hh in range(kvh):
                m, l, acc = carry[hh]
                q_h = qsc[:, hh]  # [S, G, D] f32
                k_h = pbuf[
                    rbuf, :, :, hh * d : (hh + 1) * d
                ].astype(jnp.float32)  # [S, ps, D]
                v_h = pbuf[
                    rbuf, :, :, f + hh * d : f + (hh + 1) * d
                ].astype(jnp.float32)
                sc = jax.lax.dot_general(
                    q_h, k_h,
                    dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [S, G, ps]
                sc = sc * (sm_scale * k_scale)
                pos = r * page_size + jax.lax.broadcasted_iota(
                    jnp.int32, sc.shape, 2
                )
                sc = jnp.where(pos < past_b, sc, NEG_INF)

                m_new = jnp.maximum(
                    m, jnp.max(sc, axis=2, keepdims=True)
                )
                shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
                pexp = jnp.exp(sc - shift)
                alpha = jnp.where(
                    m == NEG_INF, 0.0, jnp.exp(m - shift)
                )
                l2 = alpha * l + jnp.sum(pexp, axis=2, keepdims=True)
                pv = jax.lax.dot_general(
                    pexp, v_h,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )  # [S, G, D]
                new.append((m_new, l2, acc * alpha + pv * v_scale))
            return tuple(new)

        carry0 = tuple(
            (
                jnp.full((s, group, 1), NEG_INF, jnp.float32),
                jnp.zeros((s, group, 1), jnp.float32),
                jnp.zeros((s, group, d), jnp.float32),
            )
            for _ in range(kvh)
        )
        carry = jax.lax.fori_loop(0, n_rounds, round_body, carry0)

        # fresh (current-token) fold — also covers past_len == 0 rows
        for hh in range(kvh):
            m, l, acc = carry[hh]
            q_h = qsc[:, hh]  # [S, G, D]
            kf = kfresh[hh][:, None, :]  # [S, 1, D]
            vf = vfresh[hh][:, None, :]
            s_f = jnp.sum(q_h * kf, axis=2, keepdims=True) * sm_scale
            m2 = jnp.maximum(m, s_f)
            alpha = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - m2))
            p_f = jnp.exp(s_f - m2)
            l2 = alpha * l + p_f
            ao = (acc * alpha + p_f * vf) / l2
            aosc[:, hh] = ao.astype(jnp.bfloat16)

        # ---- o projection (+ residual): per-head 2-D matmuls against
        # d-aligned sublane slices of the natural-layout wo tiles
        delta = jnp.zeros((s, h), jnp.float32)
        for t in range(nto):
            ee = ntq + t
            nxt(ee)
            w_dma(ee, li, slot(ee)).wait()
            h_lo = (t * ro) // d
            h_hi = min(qh, ((t + 1) * ro) // d)
            for hq in range(h_lo, h_hi):
                ao_h = aosc[:, hq // group, hq % group, :]  # [S, D]
                delta = delta + matmul_n(
                    ao_h, ee, slot(ee), row0=hq * d - t * ro, rows=d
                )
        if int8:
            delta = delta * so_ref[pl.ds(li, 1), :]
        x = (
            x.astype(jnp.bfloat16) + delta.astype(jnp.bfloat16)
        ).astype(jnp.float32)

        # ---- MLP (chunk-pipelined gate/up/down; no [S, 2I] vector)
        xn2 = _rms2(x, ln2_ref[pl.ds(li, 1), :], eps).astype(
            jnp.bfloat16
        )
        dacc = jnp.zeros((s, h), jnp.float32)
        for c in range(ntm):
            eg = ntq + nto + 3 * c
            nxt(eg)
            w_dma(eg, li, slot(eg)).wait()
            yg = matmul_t(xn2, eg, slot(eg), li)
            nxt(eg + 1)
            w_dma(eg + 1, li, slot(eg + 1)).wait()
            yu = matmul_t(xn2, eg + 1, slot(eg + 1), li)
            a_c = (jax.nn.silu(yg) * yu).astype(jnp.bfloat16)
            nxt(eg + 2)
            w_dma(eg + 2, li, slot(eg + 2)).wait()
            dacc = dacc + matmul_n(a_c, eg + 2, slot(eg + 2))
        if int8:
            dacc = dacc * sdown_ref[pl.ds(li, 1), :]
        x = (
            x.astype(jnp.bfloat16) + dacc.astype(jnp.bfloat16)
        ).astype(jnp.float32)
        return x

    x = x_ref[...].astype(jnp.float32)
    x = jax.lax.fori_loop(0, nl, layer, x)
    hn = _rms2(x, normf_ref[...], eps)
    h_out_ref[...] = hn.astype(h_out_ref.dtype)


def fused_decode_stack(
    kw: dict,  # kernel-layout weights (build_stack_weights output)
    kv_cache: jax.Array,  # [L, NSLOTS, 2Fc] — donated, returned updated
    x: jax.Array,  # [S, H] bf16 embedded tokens
    cos: jax.Array,  # [S, D] f32
    sin: jax.Array,  # [S, D] f32
    rows_w: jax.Array,  # [S] int32 cache row to write (-1 = inactive)
    past_lens: jax.Array,  # [S] int32 past tokens (= position)
    block_tables: jax.Array,  # [S, P] int32
    *,
    page_size: int,
    eps: float,
    sm_scale: float,
    qh: int,
    kvh: int,
    d: int,
    inter: int,
    has_bias: bool,
    has_qknorm: bool,
    int8: bool = False,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Run the full decode step; returns (hidden [S, H] bf16, kv_cache).

    Not jitted: call inside the decode-step jit/scan (the cache is a
    loop carry there, so the epilogue scatter is in-place), or wrap in
    ``jax.jit(..., donate_argnums=(1,))`` for standalone use."""
    s, h = x.shape
    nl, nslots, two_fc = kv_cache.shape
    f = kvh * d
    group = qh // kvh
    max_p = block_tables.shape[1]
    qn = qh * d
    qkv_n = qn + 2 * f
    num_pages = nslots // page_size

    tiles = plan_tiles(qkv_n, qn, inter, d)
    (ntq, rq), (nto, ro), (ntm, rm) = tiles
    tr = max(rq, ro, rm)

    wdtype = kw["wqkv_k"].dtype
    if int8:
        scale = kw["scale_k"]
        so = kw["so_k"]
        sdown = kw["sdown_k"]
    else:
        scale = jnp.zeros((1, 1), jnp.float32)
        so = scale
        sdown = scale

    bqkv = kw.get("bqkv")
    if bqkv is None:
        bqkv = jnp.zeros((nl, ntq * rq), jnp.bfloat16)
    elif bqkv.shape[1] != ntq * rq:
        bqkv = jnp.pad(bqkv, ((0, 0), (0, ntq * rq - bqkv.shape[1])))
    qn_w = kw.get("q_norm")
    if qn_w is None:
        qn_w = jnp.ones((nl, d), jnp.bfloat16)
        kn_w = qn_w
    else:
        kn_w = kw["k_norm"]

    cfg_static = (
        s, h, qh, kvh, d, group, inter, nl, page_size, max_p,
        num_pages, eps, sm_scale, has_bias, has_qknorm, int8,
        k_scale, v_scale, tiles, two_fc,
    )
    kernel = functools.partial(_stack_kernel, cfg_static=cfg_static)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # past_v
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # ln2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # norm_f
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bqkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q_norm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # k_norm
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # so
            pl.BlockSpec(memory_space=pltpu.VMEM),  # sdown
            pl.BlockSpec(memory_space=pl.ANY),  # wqkv
            pl.BlockSpec(memory_space=pl.ANY),  # wo
            pl.BlockSpec(memory_space=pl.ANY),  # wgu
            pl.BlockSpec(memory_space=pl.ANY),  # wdown
            pl.BlockSpec(memory_space=pl.ANY),  # kv_cache
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # fresh rows
            pl.BlockSpec(memory_space=pltpu.VMEM),  # hidden
        ],
        scratch_shapes=[
            pltpu.VMEM((2, tr, h), wdtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, s, page_size, two_fc), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, s)),
            pltpu.VMEM((s, kvh, group, d), jnp.float32),
            pltpu.VMEM((s, kvh, group, d), jnp.bfloat16),
        ],
    )
    rows_out, hidden = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nl, s, two_fc), kv_cache.dtype),
            jax.ShapeDtypeStruct((s, h), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # whole weight tiles are loaded as vector operands; the
            # default 16 MB scoped-vmem budget is too tight for the
            # 2-slot ring + live tile vectors (v5e has 128 MB VMEM)
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=pallas_interpret_mode(),
    )(
        rows_w.astype(jnp.int32),
        past_lens.astype(jnp.int32),
        block_tables.astype(jnp.int32),
        x,
        cos.astype(jnp.float32),
        sin.astype(jnp.float32),
        past_lens.astype(jnp.int32)[:, None],
        # small per-layer params as f32: Mosaic rejects dynamic
        # (layer-indexed) row reads of sub-word VMEM arrays
        kw["ln1"].astype(jnp.float32),
        kw["ln2"].astype(jnp.float32),
        kw["norm_f"][None, :].astype(jnp.float32),
        bqkv.astype(jnp.float32),
        qn_w.astype(jnp.float32),
        kn_w.astype(jnp.float32),
        scale,
        so,
        sdown,
        kw["wqkv_k"],
        kw["wo_k"],
        kw["wgu_k"],
        kw["wdown_k"],
        kv_cache,
    )
    # scatter this step's rows into the donated cache (in-place XLA
    # scatter, ~1.2 us — models/qwen2.decode_direct's write path).
    # Inactive slots remap to DISTINCT positive out-of-bounds rows:
    # negative indices silently wrap (ops/paged_attention.py:788) and
    # duplicates would force a serializing scatter lowering.
    slots = jnp.where(
        rows_w < 0,
        nslots + jnp.arange(s, dtype=jnp.int32),
        rows_w.astype(jnp.int32),
    )
    kv_out = kv_cache.at[:, slots].set(
        rows_out, mode="drop", unique_indices=True
    )
    return hidden, kv_out
