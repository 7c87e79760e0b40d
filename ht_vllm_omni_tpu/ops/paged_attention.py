"""Pallas TPU paged attention for decode.

TPU-native replacement for vLLM's paged-attention CUDA kernels (the reference
delegates its whole AR decode path to them, SURVEY §2.9).  The KV cache lives
in HBM as pages of shape [page_size, head_dim] per kv head; a per-sequence
block table maps logical pages to physical ones.

Design:
- grid (batch, kv_head, page); the page axis is innermost/"arbitrary" so the
  online-softmax accumulators live in VMEM scratch while Mosaic streams pages
  HBM->VMEM, double-buffered, driven by the scalar-prefetched block table
  (pltpu.PrefetchScalarGridSpec — the index map itself dereferences the block
  table, so only this sequence's pages are fetched).
- all q heads of one kv head (the GQA group) are processed together as the
  sublane axis of the [group, page_size] score tile.
- pages past the sequence length skip compute via pl.when.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ht_vllm_omni_tpu.utils import pallas_interpret_mode, round_up

NEG_INF = float("-inf")
_LANES = 128


def _paged_kernel(
    # scalar prefetch
    block_tables_ref,  # [B, max_pages] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, 1, G, D]
    k_ref,  # [1, 1, page_size, D]
    v_ref,  # [1, 1, page_size, D]
    # outputs
    o_ref,  # [1, 1, G, D]
    # scratch
    m_ref,  # [G, LANES]
    l_ref,  # [G, LANES]
    acc_ref,  # [G, D]
    *,
    sm_scale: float,
    page_size: int,
):
    b = pl.program_id(0)
    p = pl.program_id(2)
    num_pages = pl.num_programs(2)

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[b]
    page_start = p * page_size

    @pl.when(page_start < seq_len)
    def _compute():
        q = q_ref[0, 0].astype(jnp.float32)  # [G, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [P, D]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s * sm_scale  # [G, P]

        pos = page_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < seq_len, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
        pexp = jnp.exp(s - shift)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - shift))

        l_ref[...] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(pexp, axis=1, keepdims=True),
            l_ref.shape,
        )
        v = v_ref[0, 0].astype(jnp.float32)  # [P, D]
        pv = jax.lax.dot_general(
            pexp,
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(p == num_pages - 1)
    def _finalize():
        l = l_ref[:, :1]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale",))
def paged_attention(
    q: jax.Array,  # [B, QH, D] one query token per sequence
    k_pages: jax.Array,  # [KVH, num_pages, page_size, D]
    v_pages: jax.Array,  # [KVH, num_pages, page_size, D]
    block_tables: jax.Array,  # [B, max_pages_per_seq] int32
    seq_lens: jax.Array,  # [B] int32
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """Decode attention over the paged cache; returns [B, QH, D]."""
    batch, q_heads, head_dim = q.shape
    kv_heads, _, page_size, _ = k_pages.shape
    assert q_heads % kv_heads == 0
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    max_pages = block_tables.shape[1]

    # Pad the GQA group to the fp32 sublane tile.
    group_pad = round_up(group, 8)
    qg = q.reshape(batch, kv_heads, group, head_dim)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    kernel = functools.partial(
        _paged_kernel, sm_scale=sm_scale, page_size=page_size
    )
    grid = (batch, kv_heads, max_pages)

    def _kv_index(b, h, p, tables, lens):
        return (h, tables[b, p], 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, group_pad, head_dim),
                lambda b, h, p, tables, lens: (b, h, 0, 0),
            ),
            pl.BlockSpec((1, 1, page_size, head_dim), _kv_index),
            pl.BlockSpec((1, 1, page_size, head_dim), _kv_index),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, group_pad, head_dim),
            lambda b, h, p, tables, lens: (b, h, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((group_pad, _LANES), jnp.float32),
            pltpu.VMEM((group_pad, _LANES), jnp.float32),
            pltpu.VMEM((group_pad, head_dim), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, kv_heads, group_pad, head_dim), q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        qg,
        k_pages.reshape(kv_heads, -1, page_size, head_dim),
        v_pages.reshape(kv_heads, -1, page_size, head_dim),
    )
    return out[:, :, :group, :].reshape(batch, q_heads, head_dim)


def _paged_fused_kernel(
    layer_ref,  # [1] int32 (consumed by index maps)
    block_tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    q_ref,  # [1, KVH * G_pad, D]
    kv_ref,  # [1, 1, page_size, 2F]   (row = [K_feat || V_feat])
    o_ref,  # [1, KVH * G_pad, D]  unnormalized sum(p*V)
    mo_ref,  # [1, KVH * G_pad, LANES]  running max (broadcast)
    lo_ref,  # [1, KVH * G_pad, LANES]  running denom (broadcast)
    m_ref,  # [KVH * G_pad, LANES] scratch
    l_ref,
    acc_ref,  # [KVH * G_pad, D] scratch
    *,
    sm_scale: float,
    page_size: int,
    kv_heads: int,
    group_pad: int,
    head_dim: int,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
):
    """All kv heads of one (sequence, page) in a single program.

    K and V arrive in one block DMA (combined rows); per-head slices are
    static and 128-aligned.  The kv-head loop is a static Python unroll,
    keeping the grid at (batch, pages).  int8 KV caches dequantize with
    per-tensor static scales: k_scale folds into sm_scale (pre-softmax),
    v_scale is linear and applied to the accumulator at finalize.
    """
    del layer_ref
    b = pl.program_id(0)
    p = pl.program_id(1)
    num_pages = pl.num_programs(1)
    f = kv_heads * head_dim

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[b]
    page_start = p * page_size

    @pl.when(page_start < seq_len)
    def _compute():
        q = q_ref[0].astype(jnp.float32)  # [KVH*G, D]
        kv_all = kv_ref[0, 0].astype(jnp.float32)  # [PS, 2F]

        rows = []
        for h in range(kv_heads):
            q_h = q[h * group_pad : (h + 1) * group_pad]  # [G, D]
            k_h = kv_all[:, h * head_dim : (h + 1) * head_dim]  # [PS, D]
            rows.append(
                jax.lax.dot_general(
                    q_h, k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        s = jnp.concatenate(rows, axis=0) * (sm_scale * k_scale)

        pos = page_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < seq_len, s, NEG_INF)

        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
        pexp = jnp.exp(s - shift)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - shift))
        l_ref[...] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(pexp, axis=1, keepdims=True),
            l_ref.shape,
        )
        outs = []
        for h in range(kv_heads):
            p_h = pexp[h * group_pad : (h + 1) * group_pad]  # [G, PS]
            v_h = kv_all[:, f + h * head_dim : f + (h + 1) * head_dim]
            outs.append(
                jax.lax.dot_general(
                    p_h, v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        pv = jnp.concatenate(outs, axis=0)  # [KVH*G, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(p == num_pages - 1)
    def _finalize():
        o_ref[0, ...] = acc_ref[...] * v_scale
        mo_ref[0, ...] = m_ref[...]
        lo_ref[0, ...] = l_ref[...]


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "sm_scale", "k_scale", "v_scale"
    ),
)
def paged_attention_partial(
    q: jax.Array,  # [B, QH, D]
    kv_cache: jax.Array,  # [L, NSLOTS, >=2F] combined (+pad for int8)
    layer: jax.Array,  # scalar int32
    block_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32
    *,
    page_size: int,
    kv_heads: int,
    sm_scale: float | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Decode attention partials over the combined paged cache, one layer.

    Returns UNNORMALIZED (acc [B, KVH, G_pad, D] f32, m [B, KVH, G_pad],
    l [B, KVH, G_pad]) so the caller can logsumexp-merge with the
    in-chunk fresh-token attention before normalising (model_runner
    defers cache writes; see ops/kv_cache_update.py).  Sequences with
    seq_len == 0 yield acc=0, m=-inf, l=0."""
    batch, q_heads, head_dim = q.shape
    num_layers, nslots, two_f = kv_cache.shape
    assert two_f >= 2 * kv_heads * head_dim, (two_f, kv_heads, head_dim)
    num_pages = nslots // page_size
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    max_pages = block_tables.shape[1]

    group_pad = round_up(group, 8)
    qg = q.reshape(batch, kv_heads, group, head_dim)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))
    qg = qg.reshape(batch, kv_heads * group_pad, head_dim)

    kernel = functools.partial(
        _paged_fused_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_heads=kv_heads,
        group_pad=group_pad,
        head_dim=head_dim,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid = (batch, max_pages)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, kv_heads * group_pad, head_dim),
                lambda b, p, layer_r, tables, lens: (b, 0, 0),
            ),
            pl.BlockSpec(
                (1, 1, page_size, two_f),
                lambda b, p, layer_r, tables, lens: (
                    layer_r[0], tables[b, p], 0, 0,
                ),
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, kv_heads * group_pad, head_dim),
                lambda b, p, layer_r, tables, lens: (b, 0, 0),
            ),
            pl.BlockSpec(
                (1, kv_heads * group_pad, _LANES),
                lambda b, p, layer_r, tables, lens: (b, 0, 0),
            ),
            pl.BlockSpec(
                (1, kv_heads * group_pad, _LANES),
                lambda b, p, layer_r, tables, lens: (b, 0, 0),
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((kv_heads * group_pad, _LANES), jnp.float32),
            pltpu.VMEM((kv_heads * group_pad, _LANES), jnp.float32),
            pltpu.VMEM((kv_heads * group_pad, head_dim), jnp.float32),
        ],
    )
    acc, m, l = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(
                (batch, kv_heads * group_pad, head_dim), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (batch, kv_heads * group_pad, _LANES), jnp.float32
            ),
            jax.ShapeDtypeStruct(
                (batch, kv_heads * group_pad, _LANES), jnp.float32
            ),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        qg,
        kv_cache.reshape(num_layers, num_pages, page_size, two_f),
    )
    acc = acc.reshape(batch, kv_heads, group_pad, head_dim)
    m = m.reshape(batch, kv_heads, group_pad, _LANES)[..., 0]
    l = l.reshape(batch, kv_heads, group_pad, _LANES)[..., 0]
    return acc, m, l


def _paged_fresh_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32 (consumed by index maps too)
    block_tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    fresh_limits_ref,  # [B] int32: per-row fresh-row visibility limit
    # inputs
    q_ref,  # [1, KVH * G_pad, D]
    kv_ref,  # [1, 1, page_size, 2F] (paged rows = [K_feat || V_feat])
    fresh_ref,  # [1, FSUB, 2f] one sub-block of in-chunk rows
    # output
    o_ref,  # [1, KVH * G_pad, D] NORMALIZED attention output
    # scratch
    m_ref,  # [KVH * G_pad, LANES]
    l_ref,
    acc_ref,  # [KVH * G_pad, D]
    *,
    sm_scale: float,
    page_size: int,
    kv_heads: int,
    group_pad: int,
    head_dim: int,
    fsub: int,
    n_paged: int,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
):
    """Fused decode attention: paged context + this chunk's fresh rows.

    Grid is (batch, n_paged + n_fresh_blocks): steps [0, n_paged) stream
    the paged cache — the index map clamps to the sequence's LIVE pages,
    so dead table entries never cost a DMA (revisiting the same block
    index skips the fetch) — and the remaining steps fold the in-chunk
    fresh-KV rows into the same online softmax.  Fresh rows are streamed
    in FSUB-row sub-blocks whose index map clamps to the current decode
    step, so rows not yet written are neither fetched nor computed; the
    in-chunk validity mask is ``row <= fresh_limits[b]`` (a slot's
    written rows are a prefix — ``active`` is monotone within a chunk,
    and inactive slots' outputs are discarded by the caller).  With
    ``q_per_seq > 1`` several query rows share one sequence (row b reads
    fresh block b // q_per_seq) with their own per-row limits — this is
    how speculative-decode verification runs D+1 queries per slot in a
    single kernel call.

    This one kernel subsumes paged_attention_partial + the per-layer
    logsumexp merge the model previously did in XLA ops.  int8 caches
    dequantize in-kernel via static per-tensor scales: k_scale folds into
    the score scale, v_scale into the paged pv accumulation; fresh rows
    are model-precision (scale 1).
    """
    del layer_ref
    b = pl.program_id(0)
    p = pl.program_id(1)
    n_total = pl.num_programs(1)
    f = kv_heads * head_dim
    limit = fresh_limits_ref[b]

    @pl.when(p == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    seq_len = seq_lens_ref[b]
    page_start = p * page_size

    def _scores(q, k_rows, scale):
        rows = []
        for h in range(kv_heads):
            q_h = q[h * group_pad : (h + 1) * group_pad]
            k_h = k_rows[:, h * head_dim : (h + 1) * head_dim]
            rows.append(
                jax.lax.dot_general(
                    q_h, k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        return jnp.concatenate(rows, axis=0) * scale

    def _online_update(s, v_rows, pv_scale):
        # s [KVH*G, T] f32 scores, v_rows [T, f] f32: one online-softmax
        # accumulation step shared by the paged and fresh paths
        m_prev = m_ref[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
        shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
        pexp = jnp.exp(s - shift)
        alpha = jnp.where(m_prev == NEG_INF, 0.0, jnp.exp(m_prev - shift))
        l_ref[...] = jnp.broadcast_to(
            alpha * l_ref[:, :1] + jnp.sum(pexp, axis=1, keepdims=True),
            l_ref.shape,
        )
        outs = []
        for h in range(kv_heads):
            p_h = pexp[h * group_pad : (h + 1) * group_pad]
            v_h = v_rows[:, h * head_dim : (h + 1) * head_dim]
            outs.append(
                jax.lax.dot_general(
                    p_h, v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        pv = jnp.concatenate(outs, axis=0)
        acc_ref[...] = acc_ref[...] * alpha + pv * pv_scale
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(jnp.logical_and(p < n_paged, page_start < seq_len))
    def _paged():
        q = q_ref[0].astype(jnp.float32)  # [KVH*G, D]
        kv_all = kv_ref[0, 0].astype(jnp.float32)  # [PS, 2F]
        s = _scores(q, kv_all, sm_scale * k_scale)
        pos = page_start + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < seq_len, s, NEG_INF)
        _online_update(s, kv_all[:, f:], v_scale)

    row0 = (p - n_paged) * fsub  # first fresh row of this sub-block

    @pl.when(jnp.logical_and(p >= n_paged, row0 <= limit))
    def _fresh():
        q = q_ref[0].astype(jnp.float32)
        fr = fresh_ref[0].astype(jnp.float32)  # [FSUB, 2f]
        s = _scores(q, fr, sm_scale)  # [KVH*G, FSUB]
        row = row0 + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(row <= limit, s, NEG_INF)
        _online_update(s, fr[:, f:], 1.0)

    @pl.when(p == n_total - 1)
    def _finalize():
        l = l_ref[:, :1]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, ...] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "q_per_seq", "sm_scale",
        "k_scale", "v_scale",
    ),
)
def paged_attention_fresh(
    q: jax.Array,  # [B, QH, D]  (B = seqs * q_per_seq query rows)
    kv_cache: jax.Array,  # [L, NSLOTS, >=2F] combined (+pad for int8)
    layer: jax.Array,  # scalar int32
    fresh: jax.Array,  # [B // q_per_seq, K, 2f] chunk rows (model dtype)
    fresh_limits: jax.Array,  # [B] int32 or scalar: per-row fresh limit
    block_tables: jax.Array,  # [B, P] int32 (pass only LIVE page columns)
    seq_lens: jax.Array,  # [B] int32 — tokens materialised in pages
    *,
    page_size: int,
    kv_heads: int,
    q_per_seq: int = 1,
    sm_scale: float | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Normalized decode attention over paged context + fresh chunk rows.

    Replaces paged_attention_partial + the XLA-side dense merge in the
    decode hot loop (models/qwen2.decode).  Returns [B, QH, D]."""
    batch, q_heads, head_dim = q.shape
    num_layers, nslots, two_f = kv_cache.shape
    chunk_steps = fresh.shape[1]
    fresh_limits = jnp.broadcast_to(
        jnp.asarray(fresh_limits, jnp.int32), (batch,)
    )
    assert two_f >= 2 * kv_heads * head_dim, (two_f, kv_heads, head_dim)
    num_pages = nslots // page_size
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    max_pages = block_tables.shape[1]
    # single fresh block: at decode sizes the whole-buffer DMA is ~7.5us/
    # step — sub-blocking it costs more in grid iterations than it saves
    fsub = chunk_steps
    n_fresh = chunk_steps // fsub

    group_pad = round_up(group, 8)
    qg = q.reshape(batch, kv_heads, group, head_dim)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))
    qg = qg.reshape(batch, kv_heads * group_pad, head_dim)

    kernel = functools.partial(
        _paged_fresh_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_heads=kv_heads,
        group_pad=group_pad,
        head_dim=head_dim,
        fsub=fsub,
        n_paged=max_pages,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid = (batch, max_pages + n_fresh)

    def _kv_index(b, p, layer_r, tables, lens, limits):
        # clamp to the sequence's live pages: iterations past the live
        # range (and the fresh steps) revisit the last live block, which
        # Mosaic recognises and skips the DMA for
        live_hi = jnp.maximum(
            jax.lax.div(lens[b] + page_size - 1, page_size), 1
        ) - 1
        return (layer_r[0], tables[b, jnp.minimum(p, live_hi)], 0, 0)

    def _fresh_index(b, p, layer_r, tables, lens, limits):
        # sub-blocks beyond this row's limit clamp to the last written
        # one (no DMA); paged iterations pin to sub-block 0
        return (
            b // q_per_seq,
            jnp.clip(p - max_pages, 0, limits[b] // fsub),
            0,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, kv_heads * group_pad, head_dim),
                lambda b, p, layer_r, tables, lens, limits: (b, 0, 0),
            ),
            pl.BlockSpec((1, 1, page_size, two_f), _kv_index),
            pl.BlockSpec((1, fsub, fresh.shape[-1]), _fresh_index),
        ],
        out_specs=pl.BlockSpec(
            (1, kv_heads * group_pad, head_dim),
            lambda b, p, layer_r, tables, lens, limits: (b, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((kv_heads * group_pad, _LANES), jnp.float32),
            pltpu.VMEM((kv_heads * group_pad, _LANES), jnp.float32),
            pltpu.VMEM((kv_heads * group_pad, head_dim), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, kv_heads * group_pad, head_dim), q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        fresh_limits,
        qg,
        kv_cache.reshape(num_layers, num_pages, page_size, two_f),
        fresh,
    )
    out = out.reshape(batch, kv_heads, group_pad, head_dim)
    return out[:, :, :group, :].reshape(batch, q_heads, head_dim)


def paged_attention_fresh_dense(
    q: jax.Array,  # [B, QH, D]
    kv_cache: jax.Array,  # [L, NSLOTS, >=2F]
    layer: jax.Array,  # scalar int32
    fresh: jax.Array,  # [B, K, 2f]
    fresh_limits: jax.Array,  # [B] or scalar: fresh-row visibility
    block_tables: jax.Array,  # [B, P]
    seq_lens: jax.Array,  # [B]
    *,
    page_size: int,
    kv_heads: int,
    sm_scale: float | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """XLA gather-then-attend twin of paged_attention_fresh — a full
    reference for the fused kernel's semantics (paged + in-chunk fresh
    rows under one softmax), used by unit tests.  NOT a serving path:
    measured ~2x slower than the kernel even at 4-page envelopes (XLA's
    row gather materializes the context)."""
    batch, q_heads, head_dim = q.shape
    f = kv_heads * head_dim
    ctx = block_tables.shape[1] * page_size
    n_fresh = fresh.shape[1]
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    kv = jax.lax.dynamic_index_in_dim(kv_cache, layer, 0, keepdims=False)
    rows = (
        block_tables.astype(jnp.int32)[:, :, None] * page_size
        + jnp.arange(page_size, dtype=jnp.int32)[None, None]
    ).reshape(batch, ctx)
    paged = jnp.take(kv, rows, axis=0)  # [B, ctx, two_f]
    kp = paged[..., :f].astype(jnp.float32) * k_scale
    vp = paged[..., f : 2 * f].astype(jnp.float32) * v_scale
    kf = fresh[..., :f].astype(jnp.float32)
    vf = fresh[..., f:].astype(jnp.float32)
    k_all = jnp.concatenate([kp, kf], 1).reshape(
        batch, ctx + n_fresh, kv_heads, head_dim
    )
    v_all = jnp.concatenate([vp, vf], 1).reshape(
        batch, ctx + n_fresh, kv_heads, head_dim
    )
    lim = jnp.broadcast_to(
        jnp.asarray(fresh_limits, jnp.int32), (batch,)
    )
    valid = jnp.concatenate(
        [
            jnp.arange(ctx)[None] < seq_lens[:, None],
            jnp.arange(n_fresh)[None] <= lim[:, None],
        ],
        axis=1,
    )  # [B, ctx + K]
    qg = q.reshape(batch, kv_heads, group, head_dim).astype(jnp.float32)
    scores = jnp.einsum("bhgd,bshd->bhgs", qg, k_all) * sm_scale
    scores = jnp.where(valid[:, None, None], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, v_all)
    return out.reshape(batch, q_heads, head_dim).astype(q.dtype)


def paged_attention_fused(
    q: jax.Array,
    kv_cache: jax.Array,
    layer: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    *,
    page_size: int,
    kv_heads: int,
    sm_scale: float | None = None,
) -> jax.Array:
    """Normalized decode attention (no in-chunk fresh tokens)."""
    batch, q_heads, head_dim = q.shape
    group = q_heads // kv_heads
    acc, m, l = paged_attention_partial(
        q, kv_cache, layer, block_tables, seq_lens,
        page_size=page_size, kv_heads=kv_heads, sm_scale=sm_scale,
    )
    denom = jnp.where(l == 0.0, 1.0, l)[..., None]
    out = (acc / denom).astype(q.dtype)
    return out[:, :, :group, :].reshape(batch, q_heads, head_dim)


def paged_attention_reference(
    q: jax.Array,
    k_pages: jax.Array,
    v_pages: jax.Array,
    block_tables: jax.Array,
    seq_lens: jax.Array,
    *,
    sm_scale: float | None = None,
) -> jax.Array:
    """Gather-then-attend jnp reference used by unit tests."""
    batch, q_heads, head_dim = q.shape
    kv_heads, _, page_size, _ = k_pages.shape
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    max_ctx = block_tables.shape[1] * page_size

    # [B, KVH, max_ctx, D]
    k = jnp.take(k_pages, block_tables, axis=1)  # [KVH, B, P, ps, D]
    k = k.transpose(1, 0, 2, 3, 4).reshape(batch, kv_heads, max_ctx, head_dim)
    v = jnp.take(v_pages, block_tables, axis=1)
    v = v.transpose(1, 0, 2, 3, 4).reshape(batch, kv_heads, max_ctx, head_dim)

    qg = q.reshape(batch, kv_heads, group, head_dim).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhkd->bhgk", qg, k.astype(jnp.float32)) * sm_scale
    pos = jnp.arange(max_ctx)[None, None, None, :]
    s = jnp.where(pos < seq_lens[:, None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgk,bhkd->bhgd", p, v.astype(jnp.float32))
    return o.reshape(batch, q_heads, head_dim).astype(q.dtype)


@jax.jit
def write_kv_pages(
    k_pages: jax.Array,  # [KVH, num_pages, page_size, D]
    v_pages: jax.Array,
    new_k: jax.Array,  # [T, KVH, D]
    new_v: jax.Array,  # [T, KVH, D]
    slot_mapping: jax.Array,  # [T] int32: page_idx * page_size + offset
) -> tuple[jax.Array, jax.Array]:
    """Scatter freshly-computed K/V rows into the paged cache.

    ``slot_mapping`` follows vLLM's flat-slot convention.  Padding rows use
    slot -1 and are dropped (scatter with mode='drop').
    """
    kv_heads, num_pages, page_size, head_dim = k_pages.shape
    flat_k = k_pages.reshape(kv_heads, num_pages * page_size, head_dim)
    flat_v = v_pages.reshape(kv_heads, num_pages * page_size, head_dim)
    nk = new_k.astype(k_pages.dtype).transpose(1, 0, 2)  # [KVH, T, D]
    nv = new_v.astype(v_pages.dtype).transpose(1, 0, 2)
    # Negative indices wrap in jnp scatters even under mode="drop"; remap the
    # -1 padding sentinel to an out-of-bounds positive slot so it is dropped.
    num_slots = num_pages * page_size
    slots = jnp.where(slot_mapping < 0, num_slots, slot_mapping)
    flat_k = flat_k.at[:, slots, :].set(nk, mode="drop")
    flat_v = flat_v.at[:, slots, :].set(nv, mode="drop")
    return (
        flat_k.reshape(k_pages.shape),
        flat_v.reshape(v_pages.shape),
    )


def _decode_attn_kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, KVH * G_pad, D] VMEM
    kv_ref,  # [L, num_pages, page_size, 2F] in HBM (pl.ANY)
    # outputs
    o_ref,  # [1, KVH * G_pad, D]
    # scratch
    buf_ref,  # [NBUF, page_size, 2F] VMEM
    sem_ref,  # DMA semaphores (NBUF,)
    *,
    sm_scale: float,
    page_size: int,
    kv_heads: int,
    group_pad: int,
    head_dim: int,
    nbuf: int,
    k_scale: float,
    v_scale: float,
):
    """Decode attention, one grid step per sequence, manual page DMA.

    The BlockSpec-driven twin (_paged_fresh_kernel) pays ~20us/launch in
    grid machinery at decode shapes: its grid is (batch, max_pages+1)
    and every tiny [page_size, 2F] block costs a full grid step.  Here
    the grid is (batch,) and this body streams only the sequence's LIVE
    pages HBM->VMEM itself, nbuf-deep double-buffered, folding each page
    into an online softmax held in vector registers — so per-launch
    overhead is paid once per sequence, not once per page, and dead
    table columns are never touched (the reference's CUDA kernel walks
    live pages the same way, vllm/attention/ops/paged_attn.py)."""
    b = pl.program_id(0)
    li = layer_ref[0]
    seq_len = seq_lens_ref[b]
    n_pages = jax.lax.div(seq_len + page_size - 1, page_size)
    f = kv_heads * head_dim

    def dma(slot, p):
        return pltpu.make_async_copy(
            kv_ref.at[li, block_tables_ref[b, p]],
            buf_ref.at[slot],
            sem_ref.at[slot],
        )

    for i in range(nbuf):

        @pl.when(i < n_pages)
        def _(i=i):
            dma(i, i).start()

    q = q_ref[0].astype(jnp.float32)  # [KVH*G_pad, D]

    def body(p, carry):
        m, l, acc = carry
        slot = jax.lax.rem(p, nbuf)
        dma(slot, p).wait()
        kv = buf_ref[slot].astype(jnp.float32)  # [page_size, 2F]
        rows = []
        for h in range(kv_heads):
            q_h = q[h * group_pad : (h + 1) * group_pad]
            k_h = kv[:, h * head_dim : (h + 1) * head_dim]
            rows.append(
                jax.lax.dot_general(
                    q_h, k_h,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        s = jnp.concatenate(rows, axis=0) * (sm_scale * k_scale)
        pos = p * page_size + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1
        )
        s = jnp.where(pos < seq_len, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        pexp = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = alpha * l + jnp.sum(pexp, axis=1, keepdims=True)
        outs = []
        for h in range(kv_heads):
            p_h = pexp[h * group_pad : (h + 1) * group_pad]
            v_h = kv[:, f + h * head_dim : f + (h + 1) * head_dim]
            outs.append(
                jax.lax.dot_general(
                    p_h, v_h,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        acc = acc * alpha + jnp.concatenate(outs, axis=0) * v_scale

        @pl.when(p + nbuf < n_pages)
        def _():
            dma(slot, p + nbuf).start()

        return m_new, l, acc

    kg = kv_heads * group_pad
    # seq_len >= 1 always at decode (the row written this step), so the
    # loop runs and m/l are well-formed
    m0 = jnp.full((kg, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((kg, 1), jnp.float32)
    acc0 = jnp.zeros((kg, head_dim), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
    denom = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, ...] = (acc / denom).astype(o_ref.dtype)


def _decode_attn_kernel_onegrid(
    # scalar prefetch
    layer_ref,  # [1] int32
    block_tables_ref,  # [B, P] int32
    seq_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [B, KVH * G_pad, D] VMEM
    kv_ref,  # [L, num_pages, page_size, 2F] in HBM (pl.ANY)
    # outputs
    o_ref,  # [B, KVH * G_pad, D]
    # scratch
    buf_ref,  # [B * NBUF, page_size, 2F] VMEM
    sem_ref,  # DMA semaphores (B * NBUF,)
    *,
    sm_scale: float,
    page_size: int,
    kv_heads: int,
    group_pad: int,
    head_dim: int,
    batch: int,
    nbuf: int,
    k_scale: float,
    v_scale: float,
):
    """Whole-batch decode attention in ONE grid step.

    The grid=(batch,) twin (_decode_attn_kernel) pays its fixed cost —
    program setup plus the first page's DMA latency — once per
    SEQUENCE, serially: program b+1 cannot issue its first DMA until
    program b finishes.  Here a single program issues the first ``nbuf``
    page DMAs of EVERY sequence up front (all first-page latencies
    overlap), then folds each sequence's live pages into its online
    softmax, starting page p+nbuf's fetch as page p is consumed.  At
    bs8 / short contexts this roughly halves the per-layer launch cost
    (the per-step fixed cost VERDICT r4 #4 flags)."""
    li = layer_ref[0]
    f = kv_heads * head_dim

    def dma(b, slot, p):
        return pltpu.make_async_copy(
            kv_ref.at[li, block_tables_ref[b, p]],
            buf_ref.at[b * nbuf + slot],
            sem_ref.at[b * nbuf + slot],
        )

    def npages(b):
        return jax.lax.div(seq_lens_ref[b] + page_size - 1, page_size)

    # warm-up: the first nbuf page fetches of EVERY sequence, so their
    # DMA latencies all overlap before any compute begins
    def warm(b, c):
        for i in range(nbuf):

            @pl.when(i < npages(b))
            def _(i=i):
                dma(b, i, i).start()

        return c

    jax.lax.fori_loop(0, batch, warm, 0)

    kg = kv_heads * group_pad

    def seq_body(b, c):
        seq_len = seq_lens_ref[b]
        n_pages = npages(b)
        q = q_ref[b].astype(jnp.float32)  # [KVH*G_pad, D]

        def body(p, carry):
            m, l, acc = carry
            slot = jax.lax.rem(p, nbuf)
            dma(b, slot, p).wait()
            kv = buf_ref[b * nbuf + slot].astype(jnp.float32)
            rows = []
            for h in range(kv_heads):
                q_h = q[h * group_pad : (h + 1) * group_pad]
                k_h = kv[:, h * head_dim : (h + 1) * head_dim]
                rows.append(
                    jax.lax.dot_general(
                        q_h, k_h,
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            s = jnp.concatenate(rows, axis=0) * (sm_scale * k_scale)
            pos = p * page_size + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 1
            )
            s = jnp.where(pos < seq_len, s, NEG_INF)
            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            pexp = jnp.exp(s - m_new)
            alpha = jnp.exp(m - m_new)
            l = alpha * l + jnp.sum(pexp, axis=1, keepdims=True)
            outs = []
            for h in range(kv_heads):
                p_h = pexp[h * group_pad : (h + 1) * group_pad]
                v_h = kv[:, f + h * head_dim : f + (h + 1) * head_dim]
                outs.append(
                    jax.lax.dot_general(
                        p_h, v_h,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                )
            acc = acc * alpha + jnp.concatenate(outs, axis=0) * v_scale

            @pl.when(p + nbuf < n_pages)
            def _():
                dma(b, slot, p + nbuf).start()

            return m_new, l, acc

        m0 = jnp.full((kg, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((kg, 1), jnp.float32)
        acc0 = jnp.zeros((kg, head_dim), jnp.float32)
        m, l, acc = jax.lax.fori_loop(0, n_pages, body, (m0, l0, acc0))
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[b, ...] = (acc / denom).astype(o_ref.dtype)
        return c

    jax.lax.fori_loop(0, batch, seq_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=(
        "page_size", "kv_heads", "sm_scale", "k_scale", "v_scale",
    ),
)
def paged_decode_attention(
    q: jax.Array,  # [B, QH, D]
    kv_cache: jax.Array,  # [L, NSLOTS, 2F] combined [K || V] rows
    layer: jax.Array,  # scalar int32
    block_tables: jax.Array,  # [B, P] int32
    seq_lens: jax.Array,  # [B] int32 — INCLUDES this step's row
    *,
    page_size: int,
    kv_heads: int,
    sm_scale: float | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Normalized decode attention over the paged cache only.

    Pairs with direct-to-page KV writes (models/qwen2.decode scatters
    this step's K/V row into the cache BEFORE attending, so seq_lens
    counts it); replaces paged_attention_fresh + the end-of-chunk flush
    in the decode hot loop."""
    batch, q_heads, head_dim = q.shape
    num_layers, nslots, two_f = kv_cache.shape
    assert two_f >= 2 * kv_heads * head_dim, (two_f, kv_heads, head_dim)
    num_pages = nslots // page_size
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5

    group_pad = round_up(group, 8)
    qg = q.reshape(batch, kv_heads, group, head_dim)
    if group_pad != group:
        qg = jnp.pad(qg, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))
    qg = qg.reshape(batch, kv_heads * group_pad, head_dim)

    # one-grid whole-batch variant: all sequences' first-page DMAs
    # overlap inside a single program — roughly halves the per-launch
    # fixed cost at serving batch sizes.  Falls back to the per-sequence
    # grid when the per-batch buffers would not fit VMEM comfortably.
    nbuf1 = 2
    buf_bytes = (
        batch * nbuf1 * page_size * two_f * kv_cache.dtype.itemsize
    )
    if buf_bytes <= 4 * 1024 * 1024:
        kernel1 = functools.partial(
            _decode_attn_kernel_onegrid,
            sm_scale=sm_scale,
            page_size=page_size,
            kv_heads=kv_heads,
            group_pad=group_pad,
            head_dim=head_dim,
            batch=batch,
            nbuf=nbuf1,
            k_scale=k_scale,
            v_scale=v_scale,
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(1,),
            in_specs=[
                pl.BlockSpec(
                    (batch, kv_heads * group_pad, head_dim),
                    lambda i, layer_r, tables, lens: (0, 0, 0),
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (batch, kv_heads * group_pad, head_dim),
                lambda i, layer_r, tables, lens: (0, 0, 0),
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (batch * nbuf1, page_size, two_f), kv_cache.dtype
                ),
                pltpu.SemaphoreType.DMA((batch * nbuf1,)),
            ],
        )
        out = pl.pallas_call(
            kernel1,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(
                (batch, kv_heads * group_pad, head_dim), q.dtype
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=pallas_interpret_mode(),
        )(
            jnp.asarray(layer, jnp.int32).reshape(1),
            block_tables.astype(jnp.int32),
            seq_lens.astype(jnp.int32),
            qg,
            kv_cache.reshape(num_layers, num_pages, page_size, two_f),
        )
        out = out.reshape(batch, kv_heads, group_pad, head_dim)
        return out[:, :, :group, :].reshape(batch, q_heads, head_dim)

    nbuf = 4
    kernel = functools.partial(
        _decode_attn_kernel,
        sm_scale=sm_scale,
        page_size=page_size,
        kv_heads=kv_heads,
        group_pad=group_pad,
        head_dim=head_dim,
        nbuf=nbuf,
        k_scale=k_scale,
        v_scale=v_scale,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(
                (1, kv_heads * group_pad, head_dim),
                lambda b, layer_r, tables, lens: (b, 0, 0),
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, kv_heads * group_pad, head_dim),
            lambda b, layer_r, tables, lens: (b, 0, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((nbuf, page_size, two_f), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (batch, kv_heads * group_pad, head_dim), q.dtype
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=pallas_interpret_mode(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        block_tables.astype(jnp.int32),
        seq_lens.astype(jnp.int32),
        qg,
        kv_cache.reshape(num_layers, num_pages, page_size, two_f),
    )
    out = out.reshape(batch, kv_heads, group_pad, head_dim)
    return out[:, :, :group, :].reshape(batch, q_heads, head_dim)
