"""Pallas TPU flash attention for prefill.

TPU-native replacement for the flash-attn-2/3 CUDA kernels the reference
depends on (reference vllm_omni/diffusion/attention/backends/flash_attn.py and
the upstream vLLM prefill kernels).  Design:

- grid (batch, q_head, q_block, kv_block); the kv_block axis is innermost and
  "arbitrary" so the online-softmax accumulators persist in VMEM scratch
  across kv blocks while Mosaic double-buffers the K/V HBM->VMEM streams.
- GQA is handled in the index maps (kv head = q head // group) so no
  materialised head-replication of K/V.
- per-sequence valid lengths are scalar-prefetched; fully-masked kv blocks
  skip their compute (the DMA still runs; the scheduler hides it).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ht_vllm_omni_tpu.utils import cdiv, pallas_interpret_mode

NEG_INF = float("-inf")
_LANES = 128


def _flash_kernel(
    # scalar prefetch
    kv_lens_ref,  # [B] int32
    # inputs
    q_ref,  # [1, 1, BQ, D]
    k_ref,  # [1, 1, BK, D]
    v_ref,  # [1, 1, BK, D]
    # outputs
    o_ref,  # [1, 1, BQ, D]
    # scratch
    m_ref,  # [BQ, LANES] f32 running max
    l_ref,  # [BQ, LANES] f32 running denom
    acc_ref,  # [BQ, D] f32 accumulator
    *,
    causal: bool,
    sm_scale: float,
    block_q: int,
    block_k: int,
    q_pos_mod: int | None = None,
    single_k: bool = False,
):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    num_k = pl.num_programs(3)

    if not single_k:
        @pl.when(ki == 0)
        def _init():
            m_ref[...] = jnp.full_like(m_ref, NEG_INF)
            l_ref[...] = jnp.zeros_like(l_ref)
            acc_ref[...] = jnp.zeros_like(acc_ref)

    kv_len = kv_lens_ref[b]
    q_start = qi * block_q
    k_start = ki * block_k

    # A kv block contributes iff it holds any valid key and (when causal) is
    # not strictly above the diagonal for every row of this q block.  In
    # GQA-packed mode (q_pos_mod: group heads ride the q axis, position
    # = row % q_pos_mod) every block reaches position q_pos_mod-1, so
    # the diagonal skip degenerates to the length test.
    in_len = k_start < kv_len
    if causal and q_pos_mod is None:
        relevant = jnp.logical_and(in_len, k_start <= q_start + block_q - 1)
    else:
        relevant = in_len

    @pl.when(relevant)
    def _compute():
        # keep MXU operands in the model dtype (bf16 runs the MXU at
        # full rate; f32 operands would quarter it) — the accumulate is
        # f32 via preferred_element_type
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        if sm_scale != 1.0:  # usually folded into q by the wrapper
            s = s * sm_scale  # [BQ, BK] f32

        # masks from broadcast ROW/COLUMN iotas — full-tile iota + rem
        # materialize [BQ, BK] int ops on the VPU, which is the
        # roofline here (the softmax is elementwise-bound, not MXU)
        k_pos_row = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_k), 1
        )
        mask = k_pos_row < kv_len  # [1, BK]
        if causal:
            q_pos_col = q_start + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, 1), 0
            )
            if q_pos_mod is not None:
                q_pos_col = jax.lax.rem(q_pos_col, q_pos_mod)
            mask = jnp.logical_and(mask, q_pos_col >= k_pos_row)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # [BQ, 1]
        # Out-of-bounds rows of a ragged trailing block may contain garbage
        # (NaN in interpret mode); even with p == 0 there, 0 * NaN = NaN, so
        # zero those V rows explicitly.
        v = v_ref[0, 0]
        v_row = k_start + jax.lax.broadcasted_iota(
            jnp.int32, (block_k, 1), 0
        )
        v = jnp.where(v_row < kv_len, v, jnp.zeros_like(v))

        if single_k:
            # one kv block: plain softmax, no online rescale, no scratch
            shift = jnp.where(m_cur == NEG_INF, 0.0, m_cur)
            p = jnp.exp(s - shift)
            l = jnp.sum(p, axis=1, keepdims=True)
            pv = jax.lax.dot_general(
                p.astype(v.dtype),
                v,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            denom = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0, ...] = (pv / denom).astype(o_ref.dtype)
            return

        m_prev = m_ref[:, :1]  # [BQ, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        # Rows that are entirely masked keep m=-inf; exp(-inf - -inf) is nan,
        # so guard the shift.
        shift = jnp.where(m_new == NEG_INF, 0.0, m_new)
        p = jnp.exp(s - shift)  # [BQ, BK]
        alpha = jnp.where(
            m_prev == NEG_INF, 0.0, jnp.exp(m_prev - shift)
        )  # [BQ, 1]

        l_prev = l_ref[:, :1]
        l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)

    if single_k:
        # fully-masked q rows (kv_len == 0) never enter _compute: zero
        # the output so they stay defined
        @pl.when(jnp.logical_not(relevant))
        def _zero():
            o_ref[0, 0, ...] = jnp.zeros_like(o_ref[0, 0])
        return

    @pl.when(ki == num_k - 1)
    def _finalize():
        l = l_ref[:, :1]
        denom = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0, ...] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "causal", "sm_scale", "block_q", "block_k", "_q_pos_mod"
    ),
)
def flash_attention(
    q: jax.Array,  # [B, QH, S, D]
    k: jax.Array,  # [B, KVH, S, D]
    v: jax.Array,  # [B, KVH, S, D]
    kv_lens: jax.Array | None = None,  # [B] int32 valid lengths
    *,
    causal: bool = True,
    sm_scale: float | None = None,
    block_q: int = 512,
    block_k: int = 512,
    _q_pos_mod: int | None = None,
) -> jax.Array:
    """Multi-head attention with online softmax; returns [B, QH, S, D].

    GQA packing: when the group is wide and sequences are short, the
    (batch, q_head, ...) grid is per-program-overhead-bound (~3 us of
    grid machinery per tiny block — profiled at 350 us/layer on 0.5B
    prefill, 6%% of MXU).  Fold the group's q heads into the sequence
    axis instead — one program per (batch, KV head) with position =
    row %% S for the causal mask — an 8x-fewer-programs schedule at
    identical math (packed parity pinned by tests/ops)."""
    batch, q_heads, q_len, head_dim = q.shape
    _, kv_heads, kv_len, _ = k.shape
    assert q_heads % kv_heads == 0, (q_heads, kv_heads)
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5

    if (
        _q_pos_mod is None
        and group > 1
        and q_len == kv_len
        and q_len <= 1024
        and q_len % 8 == 0
    ):
        qp = q.reshape(batch, kv_heads, group * q_len, head_dim)
        o = flash_attention(
            qp, k, v, kv_lens,
            causal=causal, sm_scale=sm_scale,
            block_q=group * q_len if group * q_len <= 4096 else q_len * max(1, 4096 // q_len),
            block_k=block_k,
            _q_pos_mod=q_len,
        )
        return o.reshape(batch, q_heads, q_len, head_dim)

    if kv_lens is None:
        kv_lens = jnp.full((batch,), kv_len, dtype=jnp.int32)

    # fold the softmax scale into q (D columns) instead of multiplying
    # the [BQ, BK] score tile (BK/D x fewer VPU elements)
    if sm_scale != 1.0:
        q = (q.astype(jnp.float32) * sm_scale).astype(q.dtype)
        sm_scale = 1.0

    block_q = min(block_q, q_len)
    block_k = min(block_k, kv_len)
    grid = (batch, q_heads, cdiv(q_len, block_q), cdiv(kv_len, block_k))

    kernel = functools.partial(
        _flash_kernel,
        causal=causal,
        sm_scale=sm_scale,
        block_q=block_q,
        block_k=block_k,
        q_pos_mod=_q_pos_mod,
        single_k=grid[3] == 1,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, 1, block_q, head_dim),
                lambda b, h, qi, ki, lens: (b, h, qi, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, head_dim),
                lambda b, h, qi, ki, lens, g=group: (b, h // g, ki, 0),
            ),
            pl.BlockSpec(
                (1, 1, block_k, head_dim),
                lambda b, h, qi, ki, lens, g=group: (b, h // g, ki, 0),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, block_q, head_dim),
            lambda b, h, qi, ki, lens: (b, h, qi, 0),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, _LANES), jnp.float32),
            pltpu.VMEM((block_q, head_dim), jnp.float32),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(kv_lens.astype(jnp.int32), q, k, v)


def flash_attention_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    kv_lens: jax.Array | None = None,
    *,
    causal: bool = True,
    sm_scale: float | None = None,
) -> jax.Array:
    """Straight-line jnp reference used by unit tests."""
    batch, q_heads, q_len, head_dim = q.shape
    _, kv_heads, kv_len, _ = k.shape
    group = q_heads // kv_heads
    if sm_scale is None:
        sm_scale = head_dim**-0.5
    k = jnp.repeat(k, group, axis=1)
    v = jnp.repeat(v, group, axis=1)
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q.astype(jnp.float32), k.astype(jnp.float32)
    )
    s = s * sm_scale
    k_pos = jnp.arange(kv_len)[None, None, None, :]
    mask = k_pos < (
        kv_lens[:, None, None, None]
        if kv_lens is not None
        else jnp.full((batch, 1, 1, 1), kv_len)
    )
    if causal:
        q_pos = jnp.arange(q_len)[None, None, :, None]
        mask = jnp.logical_and(mask, q_pos >= k_pos)
    s = jnp.where(mask, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    p = jnp.where(jnp.any(mask, axis=-1, keepdims=True), p, 0.0)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v.astype(jnp.float32)).astype(
        q.dtype
    )
