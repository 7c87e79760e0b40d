"""Fused weight-dequant + matmul Pallas kernels (weight-only INT8/INT4).

TPU-native replacement for vLLM's _custom_ops quant GEMMs (AWQ/GPTQ/INT8
dequant kernels, SURVEY §2.9).  Decode is weight-bandwidth-bound, so
halving/quartering weight bytes is a direct throughput win; the dequant
happens in VMEM right before the MXU dot:

- INT8: per-output-channel symmetric scales [N].
- INT4: two K-rows packed per byte ([K/2, N] uint8), group-wise scales
  [K/group, N] (AWQ-style zero-point-free symmetric layout).

Both kernels tile (M, N, K) with a VMEM fp32 accumulator persisted across
the K grid axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ht_vllm_omni_tpu.utils import cdiv, pallas_interpret_mode


# --------------------------------------------------------------- quantize
def quantize_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """w [K, N] -> (w_q int8 [K, N], scales f32 [N]) per-channel."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scales = jnp.where(amax == 0, 1.0, amax / 127.0)
    w_q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scales), -127, 127
    ).astype(jnp.int8)
    return w_q, scales


def quantize_int4(
    w: jax.Array, group_size: int = 128
) -> tuple[jax.Array, jax.Array]:
    """w [K, N] -> (packed uint8 [K/2, N], scales f32 [K/group, N]).

    Values in [-8, 7]; rows 2k and 2k+1 share byte (low/high nibble).
    """
    k, n = w.shape
    assert k % group_size == 0 and k % 2 == 0
    wf = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    amax = jnp.max(jnp.abs(wf), axis=1)  # [G, N]
    scales = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(
        jnp.round(wf / scales[:, None, :]), -8, 7
    ).astype(jnp.int32).reshape(k, n)
    u = (q + 8).astype(jnp.uint8)  # [0, 15]
    lo = u[0::2]
    hi = u[1::2]
    packed = (lo | (hi << 4)).astype(jnp.uint8)  # [K/2, N]
    return packed, scales


# ------------------------------------------------------------ int8 kernel
def _int8_kernel(
    x_ref,  # [BM, BK] bf16/f32
    w_ref,  # [BK, BN] int8
    s_ref,  # [1, BN] f32
    o_ref,  # [BM, BN]
    acc_ref,  # [BM, BN] f32
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # dequantize to bf16 so the MXU runs at full (bf16) rate; the f32
    # accumulate comes from preferred_element_type
    x = x_ref[...].astype(jnp.bfloat16)
    w = w_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = (acc_ref[...] * s_ref[0, :]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "out_dtype")
)
def matmul_int8(
    x: jax.Array,  # [M, K]
    w_q: jax.Array,  # [K, N] int8
    scales: jax.Array,  # [N] f32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    m, k = x.shape
    _, n = w_q.shape
    out_dtype = out_dtype or x.dtype
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    grid = (cdiv(m, block_m), cdiv(n, block_n), cdiv(k, block_k))
    return pl.pallas_call(
        _int8_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ki: (i, ki)),
            pl.BlockSpec((block_k, block_n), lambda i, j, ki: (ki, j)),
            pl.BlockSpec((1, block_n), lambda i, j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(x, w_q, scales.reshape(1, n).astype(jnp.float32))


# ------------------------------------------------------------ int4 kernel
def _int4_kernel(
    x_ref,  # [BM, BK]
    w_ref,  # [BK//2, BN] uint8 (packed K pairs)
    s_ref,  # [BAND, BN] f32: this K-block's group scales padded to an
    #         8-row band (Mosaic sublane rule; no dynamic_slice on TPU)
    o_ref,  # [BM, BN]
    acc_ref,  # [BM, BN] f32
    *,
    group_size: int,
    block_k: int,
):
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # unpack in int32: Mosaic has no uint8 vector shift (arith.shrui)
    packed = w_ref[...].astype(jnp.int32)
    lo = (packed & 0xF) - 8  # rows 0,2,4,... of the block
    hi = ((packed >> 4) & 0xF) - 8  # rows 1,3,5,...
    bk2, bn = packed.shape
    # interleave back to [BK, BN]: stack on a new minor-of-sublane axis
    w = jnp.stack(
        [lo, hi], axis=1
    ).reshape(block_k, bn).astype(jnp.float32)
    # apply this block's group scales (static rows of the band)
    groups = block_k // group_size
    s_blk = s_ref[:groups, :]
    w = w.reshape(groups, group_size, bn) * s_blk.reshape(groups, 1, bn)
    # bf16 operands keep the MXU at full rate (f32 accumulate below)
    w = w.reshape(block_k, bn).astype(jnp.bfloat16)
    x = x_ref[...].astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "block_m", "block_n", "block_k", "out_dtype",
    ),
)
def matmul_int4(
    x: jax.Array,  # [M, K]
    w_packed: jax.Array,  # [K//2, N] uint8
    scales: jax.Array,  # [K//group, N] f32
    *,
    group_size: int = 128,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    m, k2 = x.shape[0], w_packed.shape[0]
    k = 2 * k2
    n = w_packed.shape[1]
    assert x.shape[1] == k
    out_dtype = out_dtype or x.dtype
    block_m = min(block_m, m)
    block_n = min(block_n, n)
    block_k = min(block_k, k)
    assert block_k % group_size == 0 or block_k == k
    if block_k % group_size != 0:
        block_k = group_size * max(1, block_k // group_size)
    grid = (cdiv(m, block_m), cdiv(n, block_n), cdiv(k, block_k))
    kernel = functools.partial(
        _int4_kernel, group_size=group_size, block_k=block_k
    )
    # re-band scales: one 8-row (sublane-aligned) band per K block
    groups_per_block = block_k // group_size
    band = max(8, groups_per_block)
    nkb = cdiv(k, block_k)
    sc = scales.astype(jnp.float32)
    sc = jnp.pad(sc, ((0, nkb * groups_per_block - sc.shape[0]), (0, 0)))
    sc = sc.reshape(nkb, groups_per_block, n)
    if band != groups_per_block:
        sc = jnp.pad(sc, ((0, 0), (0, band - groups_per_block), (0, 0)))
    banded = sc.reshape(nkb * band, n)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ki: (i, ki)),
            pl.BlockSpec(
                (block_k // 2, block_n), lambda i, j, ki: (ki, j)
            ),
            pl.BlockSpec((band, block_n), lambda i, j, ki: (ki, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(x, w_packed, banded)
