"""Chunked-prefill attention over the paged cache.

The missing piece between dense prefill and paged decode (reference: vLLM's
chunked-prefill path, which OmniARScheduler relies on for
max_num_batched_tokens budgeting): a chunk of T prompt tokens at positions
[ctx, ctx+T) attends to

  1. the context part — pages holding positions [0, ctx): the Pallas
     kernel here (grid (q_blocks, pages), online softmax partials), and
  2. the self part — causal attention within the chunk: computed densely
     at the jnp level (chunks are capped at a few hundred tokens),

merged by logsumexp (``merge_partials``).  All outputs are UNNORMALIZED
(acc, m, l) in fp32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ht_vllm_omni_tpu.utils import pallas_interpret_mode, round_up

NEG_INF = float("-inf")
_LANES = 128


def _ctx_kernel(
    layer_ref,  # [1] (index maps)
    tables_ref,  # [P] int32 page table of THIS sequence
    ctx_ref,  # [1] int32 context length
    q_ref,  # [BQ, KVH, G_pad, D]
    kv_ref,  # [1, 1, PS, 2F]
    acc_out,  # [BQ, KVH, G_pad, D] f32
    m_out,  # [BQ, KVH, G_pad, LANES] f32
    l_out,
    m_ref,  # scratch [KVH, BQ * G_pad, LANES]
    l_ref,
    acc_ref,  # scratch [KVH, BQ * G_pad, D]
    *,
    sm_scale: float,
    page_size: int,
    kv_heads: int,
    group_pad: int,
    head_dim: int,
    block_q: int,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
):
    del layer_ref, tables_ref
    p = pl.program_id(1)
    num_pages = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    ctx_len = ctx_ref[0]
    page_start = p * page_size
    f = kv_heads * head_dim

    @pl.when(page_start < ctx_len)
    def _compute():
        kv_all = kv_ref[0, 0].astype(jnp.float32)  # [PS, 2F]
        for h in range(kv_heads):
            q_h = q_ref[:, h].astype(jnp.float32)  # [BQ, G_pad, D]
            q_flat = q_h.reshape(block_q * group_pad, head_dim)
            k_h = kv_all[:, h * head_dim : (h + 1) * head_dim]
            s = jax.lax.dot_general(
                q_flat, k_h,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * (sm_scale * k_scale)  # [BQ*G, PS]
            pos = page_start + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            s = jnp.where(pos < ctx_len, s, NEG_INF)

            m_prev = m_ref[h, :, :1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
            shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
            pexp = jnp.exp(s - shift)
            alpha = jnp.where(
                m_prev == NEG_INF, 0.0, jnp.exp(m_prev - shift)
            )
            l_ref[h] = jnp.broadcast_to(
                alpha * l_ref[h, :, :1]
                + jnp.sum(pexp, axis=1, keepdims=True),
                l_ref[h].shape,
            )
            v_h = kv_all[:, f + h * head_dim : f + (h + 1) * head_dim]
            pv = jax.lax.dot_general(
                pexp, v_h,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc_ref[h] = acc_ref[h] * alpha + pv
            m_ref[h] = jnp.broadcast_to(m_new, m_ref[h].shape)

    @pl.when(p == num_pages - 1)
    def _finalize():
        for h in range(kv_heads):
            acc_out[:, h] = acc_ref[h].reshape(
                block_q, group_pad, head_dim
            ) * v_scale
            m_out[:, h] = m_ref[h].reshape(block_q, group_pad, _LANES)
            l_out[:, h] = l_ref[h].reshape(block_q, group_pad, _LANES)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "sm_scale", "block_q", "k_scale",
        "v_scale",
    ),
)
def paged_context_partial(
    q: jax.Array,  # [T, QH, D] chunk queries
    kv_cache: jax.Array,  # [L, NSLOTS, 2F]
    layer: jax.Array,  # scalar
    page_table: jax.Array,  # [P] int32 this sequence's pages
    ctx_len: jax.Array,  # scalar int32
    *,
    page_size: int,
    kv_heads: int,
    sm_scale: float | None = None,
    block_q: int = 128,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
):
    """Unnormalized attention of chunk queries against context pages.

    Returns (acc [T, KVH, G_pad, D] f32, m [T, KVH, G_pad], l ...).
    """
    t, q_heads, head_dim = q.shape
    num_layers, nslots, two_f = kv_cache.shape
    num_pages = nslots // page_size
    group = q_heads // kv_heads
    group_pad = round_up(group, 8)
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    block_q = min(block_q, max(t, 8))
    t_pad = round_up(t, block_q)
    max_pages = page_table.shape[0]

    qg = q.reshape(t, kv_heads, group, head_dim)
    qg = jnp.pad(
        qg, ((0, t_pad - t), (0, 0), (0, group_pad - group), (0, 0))
    )

    kernel = functools.partial(
        _ctx_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_heads=kv_heads,
        group_pad=group_pad,
        head_dim=head_dim,
        block_q=block_q,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid = (t_pad // block_q, max_pages)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (block_q, kv_heads, group_pad, head_dim),
                lambda qi, p, layer_r, tables, ctx: (qi, 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, page_size, two_f),
                lambda qi, p, layer_r, tables, ctx: (
                    layer_r[0], tables[p], 0, 0,
                ),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (block_q, kv_heads, group_pad, head_dim),
                lambda qi, p, layer_r, tables, ctx: (qi, 0, 0, 0),
            ),
            pl.BlockSpec(
                (block_q, kv_heads, group_pad, _LANES),
                lambda qi, p, layer_r, tables, ctx: (qi, 0, 0, 0),
            ),
            pl.BlockSpec(
                (block_q, kv_heads, group_pad, _LANES),
                lambda qi, p, layer_r, tables, ctx: (qi, 0, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM(
                (kv_heads, block_q * group_pad, _LANES), jnp.float32
            ),
            pltpu.VMEM(
                (kv_heads, block_q * group_pad, _LANES), jnp.float32
            ),
            pltpu.VMEM(
                (kv_heads, block_q * group_pad, head_dim), jnp.float32
            ),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (t_pad, kv_heads, group_pad, head_dim), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (t_pad, kv_heads, group_pad, _LANES), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (t_pad, kv_heads, group_pad, _LANES), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        page_table.astype(jnp.int32),
        jnp.asarray(ctx_len, jnp.int32).reshape(1),
        qg,
        kv_cache.reshape(num_layers, num_pages, page_size, two_f),
    )
    return acc[:t], m[:t, ..., 0], l[:t, ..., 0]


def chunk_self_partial(
    q: jax.Array,  # [T, QH, D]
    k: jax.Array,  # [T, KVH, D]
    v: jax.Array,  # [T, KVH, D]
    valid_len: jax.Array,  # scalar: tokens of the chunk that are real
    *,
    kv_heads: int,
    sm_scale: float | None = None,
):
    """Causal self-attention partials within the chunk (dense jnp; chunks
    are small).  Returns (acc [T, KVH, G, D] f32, m, l)."""
    t, q_heads, d = q.shape
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = d**-0.5
    qg = q.reshape(t, kv_heads, group, d).astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    s = jnp.einsum("qhgd,khd->qhgk", qg, kf) * sm_scale  # [T,KVH,G,T]
    q_pos = jnp.arange(t)[:, None, None, None]
    k_pos = jnp.arange(t)[None, None, None, :]
    mask = (k_pos <= q_pos) & (k_pos < valid_len)
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1)
    pexp = jnp.exp(s - m[..., None])
    pexp = jnp.where(mask, pexp, 0.0)
    l = jnp.sum(pexp, axis=-1)
    acc = jnp.einsum("qhgk,khd->qhgd", pexp, vf)
    return acc, m, l


def merge_partials(parts):
    """logsumexp-merge [(acc, m, l), ...] -> normalized [T, KVH, G, D]."""
    accs, ms, ls = zip(*parts)
    m_tot = ms[0]
    for m in ms[1:]:
        m_tot = jnp.maximum(m_tot, m)
    shift = jnp.where(m_tot == NEG_INF, 0.0, m_tot)
    acc_sum = 0.0
    l_sum = 0.0
    for acc, m, l in parts:
        a = jnp.where(m == NEG_INF, 0.0, jnp.exp(m - shift))
        acc_sum = acc_sum + acc * a[..., None]
        l_sum = l_sum + l * a
    denom = jnp.where(l_sum == 0.0, 1.0, l_sum)
    return acc_sum / denom[..., None]
