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

    Values in [-8, 7]; within each group, byte row r packs rows r
    (low nibble) and r + group/2 (high nibble) so dequant is a concat.
    """
    k, n = w.shape
    assert k % group_size == 0 and k % 2 == 0
    wf = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    amax = jnp.max(jnp.abs(wf), axis=1)  # [G, N]
    scales = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(
        jnp.round(wf / scales[:, None, :]), -8, 7
    ).astype(jnp.int32)
    u = (q + 8).astype(jnp.uint8)  # [G, gs, N] in [0, 15]
    # per-group HALF-SPLIT packing: byte row r of group g holds
    # (row r, row r + gs/2) — the kernel unpacks with one sublane
    # concat instead of a row interleave (a large VPU shuffle)
    half = group_size // 2
    lo = u[:, :half]
    hi = u[:, half:]
    packed = (lo | (hi << 4)).reshape(k // 2, n).astype(jnp.uint8)
    return packed, scales


FP8_MAX = 448.0  # float8_e4m3fn


def quantize_fp8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """w [K, N] -> (w8 float8_e4m3fn [K, N], scales f32 [N]) per-channel.

    TPU-native fp8 role (reference fp8 configs via
    quantization/factory.py:44-119): storage/bandwidth format — v5e's MXU
    is bf16/int8, so fp8 weights are upcast at use; the win is halved
    HBM traffic on the weight stream, which is what decode is bound by.
    """
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scales = jnp.where(amax == 0, 1.0, amax / FP8_MAX)
    w8 = jnp.clip(
        w.astype(jnp.float32) / scales, -FP8_MAX, FP8_MAX
    ).astype(jnp.float8_e4m3fn)
    return w8, scales


def matmul_fp8(
    x: jax.Array,  # [M, K]
    w8: jax.Array,  # [K, N] float8_e4m3fn
    scales: jax.Array,  # [N] f32
    *,
    out_dtype=None,
) -> jax.Array:
    """XLA-level fp8-weight matmul: the convert fuses into the dot's
    operand stream (no Pallas needed — there is no fp8 MXU path to hand
    schedule on v5e)."""
    out_dtype = out_dtype or x.dtype
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w8.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (y * scales.astype(jnp.float32)).astype(out_dtype)


def quantize_awq_int4(
    w: jax.Array, group_size: int = 128
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Asymmetric (zero-point) group-wise int4 — the AWQ storage layout
    (reference AWQ configs): values in [0, 15], per-group scale and
    integer zero point so the representable range hugs [min, max] instead
    of being symmetric around 0.

    w [K, N] -> (packed uint8 [K/2, N], scales f32 [K/G, N],
    zeros f32 [K/G, N]); dequant = (q - z) * s.
    """
    k, n = w.shape
    assert k % group_size == 0 and k % 2 == 0
    wf = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    wmin = jnp.min(wf, axis=1)  # [G, N]
    wmax = jnp.max(wf, axis=1)
    scales = jnp.where(wmax > wmin, (wmax - wmin) / 15.0, 1.0)
    zeros = jnp.clip(jnp.round(-wmin / scales), 0, 15)
    q = jnp.clip(
        jnp.round(wf / scales[:, None, :]) + zeros[:, None, :], 0, 15
    ).astype(jnp.int32)
    u = q.astype(jnp.uint8)  # [G, gs, N]
    half = group_size // 2
    packed = (
        u[:, :half] | (u[:, half:] << 4)
    ).reshape(k // 2, n).astype(jnp.uint8)
    return packed, scales, zeros


# AWQ checkpoints interleave the 8 nibbles of each int32 in this order
AWQ_PACK_ORDER = (0, 2, 4, 6, 1, 3, 5, 7)


def unpack_awq_checkpoint(
    qweight, qzeros, scales
):
    """AWQ checkpoint tensors -> this module's packed layout.

    qweight int32 [K, N/8] and qzeros int32 [K/G, N/8] hold 8 4-bit
    values per int32 in AWQ's interleaved order {0,2,4,6,1,3,5,7};
    scales f16/f32 [K/G, N].  Returns (packed uint8 [K/2, N],
    scales f32 [K/G, N], zeros f32 [K/G, N]) for matmul_int4_zp.
    """
    import numpy as np

    def unpack(arr):  # int32 [..., N/8] -> uint8 [..., N]
        arr = np.asarray(arr).astype(np.uint32)
        cols = []
        for shift_pos in range(8):
            cols.append((arr >> (4 * shift_pos)) & 0xF)
        # column j*8 + order[i] holds nibble i
        out = np.empty(arr.shape[:-1] + (arr.shape[-1] * 8,), np.uint8)
        for i, o in enumerate(AWQ_PACK_ORDER):
            out[..., o::8] = cols[i]
        return out

    wq = unpack(qweight)  # [K, N] values 0..15
    z = unpack(qzeros).astype(np.float32)  # [K/G, N]
    k = wq.shape[0]
    group = k // z.shape[0]
    half = group // 2
    wg = wq.reshape(k // group, group, -1)
    packed = (
        wg[:, :half] | (wg[:, half:] << 4)
    ).reshape(k // 2, -1).astype(np.uint8)
    return packed, np.asarray(scales, np.float32), z


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


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def matmul_int8(
    x: jax.Array,  # [M, K] (or [..., K])
    w_q: jax.Array,  # [K, N] int8
    scales: jax.Array,  # [N] f32
    *,
    out_dtype=None,
) -> jax.Array:
    """Weight-only int8 matmul via XLA's fused operand dequant.

    Per-output-channel scales fold into the OUTPUT, so the int8->bf16
    convert fuses into the dot's weight stream and HBM sees only int8
    bytes — measured faster than the hand-tiled Pallas version at every
    decode shape (the [896, 152k] LM head most of all: XLA's native
    pipelining beats the fixed 512x512 tiling).  Kept in this module so
    the int4/AWQ group-scale kernels below (which XLA cannot fold) share
    the quantize/dequant conventions."""
    out_dtype = out_dtype or x.dtype
    y = jnp.dot(
        x.astype(jnp.bfloat16),
        w_q.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    return (y * scales.astype(jnp.float32)).astype(out_dtype)


def matmul_int8_pallas(
    x: jax.Array,  # [M, K]
    w_q: jax.Array,  # [K, N] int8
    scales: jax.Array,  # [N] f32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    """Hand-tiled variant (kept for comparison/tests; see matmul_int8)."""
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
def _int4_body(
    x_ref,  # [BM, BK]
    w_ref,  # [BK//2, BN] uint8 (packed K pairs, excess-8 values 0..15)
    s_ref,  # [G_pad, BN] f32: ALL group scales, resident across ki
    z_ref,  # [G_pad, BN] f32 zeros (zp variant) or None
    o_ref,  # [BM, BN]
    acc_ref,  # [BM, BN] f32
    *,
    group_size: int,
    gpb: int,  # groups per K block (static)
    zp: bool,  # asymmetric (AWQ) variant
):
    """Dequant+matmul at the weight-stream roofline.  Three structural
    choices (each measured on v5e):

    - Scales (and zeros) ride ONE resident VMEM block whose index_map
      ignores ki — Pallas skips the re-fetch when the block index is
      unchanged, so HBM sees the [K/G, N] scale array once per (i, j)
      tile instead of an 8-sublane band per K block (the old banding
      cost +50% traffic at group_size=128: 4 bytes of f32 band per
      packed byte pair).
    - Values are stored excess-8 (0..15) and the -8 (or AWQ zero) folds
      into a rank-1 correction on the partial dot:  x_g @ (q - z) s =
      (x_g @ q) s - rowsum(x_g) (z s) — the unpack keeps only the two
      shifts + converts (~4 VPU ops/byte vs ~9 for subtract-and-concat),
      which is what sets the ceiling once DMA is at the roofline.
    - No concat: the half-split packing means byte row r of a group
      holds K rows r and r + gs/2, so the group dot is TWO dots on the
      nibble planes against the matching x column halves.
    """
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = group_size // 2
    acc = acc_ref[...]
    for g in range(gpb):  # static unroll
        b = w_ref[g * h : (g + 1) * h, :].astype(jnp.int32)
        lo = (b & 0xF).astype(jnp.bfloat16)  # K rows [0, gs/2)
        hi = (b >> 4).astype(jnp.bfloat16)  # K rows [gs/2, gs)
        xg = x_ref[:, g * group_size : (g + 1) * group_size].astype(
            jnp.bfloat16
        )
        part = jax.lax.dot_general(
            xg[:, :h], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            xg[:, h:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grow = ki * gpb + g
        s_row = s_ref[grow, :]
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1)  # [BM]
        if zp:
            z_row = z_ref[grow, :]
            acc = acc + part * s_row - xsum[:, None] * (z_row * s_row)
        else:
            acc = acc + (part - 8.0 * xsum[:, None]) * s_row
    acc_ref[...] = acc

    @pl.when(ki == pl.num_programs(2) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _int4_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, **kw):
    _int4_body(x_ref, w_ref, s_ref, None, o_ref, acc_ref, zp=False, **kw)


def _int4_zp_kernel(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, **kw):
    _int4_body(x_ref, w_ref, s_ref, z_ref, o_ref, acc_ref, zp=True, **kw)


def _pad_groups(scales: jax.Array) -> jax.Array:
    """Pad [K/G, N] group rows up to a sublane multiple of 8."""
    g = scales.shape[0]
    pad = (-g) % 8
    sc = scales.astype(jnp.float32)
    if pad:
        sc = jnp.pad(sc, ((0, pad), (0, 0)))
    return sc


def _int4_blocks(m, k, n, group_size, block_m, block_n):
    """Pick (block_m, block_n, block_k): K blocks span as many whole
    groups as divide K/G while the packed block stays under ~2 MB (so
    double buffering fits VMEM beside the resident scales)."""
    block_m = min(block_m, m)
    if block_n == 0:
        block_n = 8192 if n >= 65536 else 2048
    block_n = min(block_n, n)
    ngroups = k // group_size
    budget = max(1, (2 * 1024 * 1024) // (block_n * (group_size // 2)))
    gpb = 1
    for cand in range(min(budget, ngroups), 0, -1):
        if ngroups % cand == 0:
            gpb = cand
            break
    return block_m, block_n, group_size * gpb, gpb


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "block_m", "block_n", "block_k", "out_dtype",
    ),
)
def matmul_int4_zp(
    x: jax.Array,  # [M, K]
    w_packed: jax.Array,  # [K//2, N] uint8, values 0..15
    scales: jax.Array,  # [K/group, N] f32
    zeros: jax.Array,  # [K/group, N] f32
    *,
    group_size: int = 128,
    block_m: int = 256,
    block_n: int = 0,  # 0 = adaptive (see matmul_int4)
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    m = x.shape[0]
    k = 2 * w_packed.shape[0]
    n = w_packed.shape[1]
    assert x.shape[1] == k
    out_dtype = out_dtype or x.dtype
    block_m, block_n, block_k, gpb = _int4_blocks(
        m, k, n, group_size, block_m, block_n
    )
    grid = (cdiv(m, block_m), cdiv(n, block_n), cdiv(k, block_k))
    kernel = functools.partial(
        _int4_zp_kernel, group_size=group_size, gpb=gpb
    )
    sc = _pad_groups(scales)
    zc = _pad_groups(zeros)
    g_pad = sc.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ki: (i, ki)),
            pl.BlockSpec(
                (block_k // 2, block_n), lambda i, j, ki: (ki, j)
            ),
            # resident: same block for every ki -> fetched once per (i, j)
            pl.BlockSpec((g_pad, block_n), lambda i, j, ki: (0, j)),
            pl.BlockSpec((g_pad, block_n), lambda i, j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(x, w_packed, sc, zc)


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
    block_n: int = 0,  # 0 = adaptive (wide blocks cut grid overhead)
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    m, k2 = x.shape[0], w_packed.shape[0]
    k = 2 * k2
    n = w_packed.shape[1]
    assert x.shape[1] == k
    out_dtype = out_dtype or x.dtype
    block_m, block_n, block_k, gpb = _int4_blocks(
        m, k, n, group_size, block_m, block_n
    )
    grid = (cdiv(m, block_m), cdiv(n, block_n), cdiv(k, block_k))
    kernel = functools.partial(
        _int4_kernel, group_size=group_size, gpb=gpb
    )
    sc = _pad_groups(scales)
    g_pad = sc.shape[0]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, ki: (i, ki)),
            pl.BlockSpec(
                (block_k // 2, block_n), lambda i, j, ki: (ki, j)
            ),
            # resident: same block for every ki -> fetched once per (i, j)
            pl.BlockSpec((g_pad, block_n), lambda i, j, ki: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, ki: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(x, w_packed, sc)


def _stacked_int4_call(
    x, w_packed, scales, zeros, layer, *, group_size, block_m, block_n,
    block_k, out_dtype,
):
    """Shared driver for the stacked (layer-indexed) int4 variants."""
    m = x.shape[0]
    num_l, k2, n = w_packed.shape
    k = 2 * k2
    assert x.shape[1] == k
    out_dtype = out_dtype or x.dtype
    block_m, block_n, block_k, gpb = _int4_blocks(
        m, k, n, group_size, block_m, block_n
    )
    grid = (cdiv(m, block_m), cdiv(n, block_n), cdiv(k, block_k))
    zp = zeros is not None
    kernel = functools.partial(
        _int4_zp_kernel if zp else _int4_kernel,
        group_size=group_size, gpb=gpb,
    )
    def _pad_groups_3d(s):
        pad = (-s.shape[1]) % 8
        s = s.astype(jnp.float32)
        return jnp.pad(s, ((0, 0), (0, pad), (0, 0))) if pad else s

    sc = _pad_groups_3d(scales)
    g_pad = sc.shape[1]
    in_specs = [
        pl.BlockSpec(
            (block_m, block_k), lambda i, j, ki, lr: (i, ki)
        ),
        pl.BlockSpec(
            (1, block_k // 2, block_n),
            lambda i, j, ki, lr: (lr[0], ki, j),
        ),
        pl.BlockSpec(
            (1, g_pad, block_n), lambda i, j, ki, lr: (lr[0], 0, j)
        ),
    ]
    operands = [x, w_packed, sc]
    if zp:
        zc = _pad_groups_3d(zeros)
        in_specs.append(
            pl.BlockSpec(
                (1, g_pad, block_n), lambda i, j, ki, lr: (lr[0], 0, j)
            )
        )
        operands.append(zc)

    def body(layer_ref, x_ref, w_ref, s_ref, *rest):
        if zp:
            z_ref, o_ref, acc_ref = rest
            _int4_body(
                x_ref, w_ref.at[0], s_ref.at[0], z_ref.at[0], o_ref,
                acc_ref, group_size=group_size, gpb=gpb, zp=True,
            )
        else:
            o_ref, acc_ref = rest
            _int4_body(
                x_ref, w_ref.at[0], s_ref.at[0], None, o_ref, acc_ref,
                group_size=group_size, gpb=gpb, zp=False,
            )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_m, block_n), lambda i, j, ki, lr: (i, j)
        ),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=pallas_interpret_mode(),
    )(jnp.asarray(layer, jnp.int32).reshape(1), *operands)


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "block_m", "block_n", "block_k", "out_dtype",
    ),
)
def matmul_int4_stacked(
    x: jax.Array,  # [M, K]
    w_packed: jax.Array,  # [L, K//2, N] uint8 — the FULL weight stack
    scales: jax.Array,  # [L, K/group, N] f32
    layer: jax.Array,  # scalar int32
    *,
    group_size: int = 128,
    block_m: int = 256,
    block_n: int = 0,
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    """Layer-indexed twin of matmul_int4 for use INSIDE a lax.scan over
    layers: the kernel reads its blocks straight from the stacked HBM
    array via a scalar-prefetched layer index.  Passing the scan's
    sliced leaf to the 2-D kernel instead makes XLA materialize a copy
    of every layer's packed weights per step (custom-call operands
    cannot alias a slice; measured ~0.3 ms/step on a 0.5B int4 model —
    a third of the decode budget)."""
    return _stacked_int4_call(
        x, w_packed, scales, None, layer,
        group_size=group_size, block_m=block_m, block_n=block_n,
        block_k=block_k, out_dtype=out_dtype,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "group_size", "block_m", "block_n", "block_k", "out_dtype",
    ),
)
def matmul_int4_zp_stacked(
    x: jax.Array,
    w_packed: jax.Array,  # [L, K//2, N] uint8
    scales: jax.Array,  # [L, K/group, N]
    zeros: jax.Array,  # [L, K/group, N]
    layer: jax.Array,
    *,
    group_size: int = 128,
    block_m: int = 256,
    block_n: int = 0,
    block_k: int = 512,
    out_dtype=None,
) -> jax.Array:
    """Stacked AWQ (asymmetric) variant; see matmul_int4_stacked."""
    return _stacked_int4_call(
        x, w_packed, scales, zeros, layer,
        group_size=group_size, block_m=block_m, block_n=block_n,
        block_k=block_k, out_dtype=out_dtype,
    )


# --------------------------------------------------------------- fused MLP
def _fused_mlp_int4_kernel(
    layer_ref,  # [1] int32 scalar prefetch
    x_ref,  # [M, K] resident across chunks
    wg_ref,  # [1, K//2, C] packed gate chunk
    wu_ref,  # [1, K//2, C] packed up chunk
    sg_ref,  # [1, G_in_pad, C] gate scales (K groups x chunk cols)
    su_ref,  # [1, G_in_pad, C] up scales
    wd_ref,  # [1, C//2, N] packed down chunk
    sd_ref,  # [1, G_mid_pad, N] ALL down scales, resident
    o_ref,  # [M, N]
    acc_ref,  # [M, N] f32
    *,
    group_size: int,
    g_in: int,  # K // group_size
    g_mid: int,  # C // group_size (down groups per chunk)
):
    """One launch for the whole SwiGLU MLP: silu(x@Wg) * (x@Wu) @ Wd.

    The split kernels pay a per-launch fixed cost twice and round-trip
    the [M, inter] activation through HBM; here the activation stays in
    VMEM and the three weight streams ride the SAME grid (over
    ``inter`` chunks), with Pallas double-buffering the next chunk's
    gate/up/down blocks behind the current chunk's compute (VERDICT r4
    #4: shrink quantized-decode fixed costs)."""
    c = pl.program_id(0)

    @pl.when(c == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    h = group_size // 2
    x = x_ref[...]

    def dq_dot(w_ref, s_ref):
        """x @ dequant(w_chunk) -> [M, C] f32 (excess-8 correction)."""
        out = None
        for g in range(g_in):
            b = w_ref[0, g * h : (g + 1) * h, :].astype(jnp.int32)
            lo = (b & 0xF).astype(jnp.bfloat16)
            hi = (b >> 4).astype(jnp.bfloat16)
            xg = x[:, g * group_size : (g + 1) * group_size].astype(
                jnp.bfloat16
            )
            part = jax.lax.dot_general(
                xg[:, :h], lo, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                xg[:, h:], hi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s_row = s_ref[0, g, :]
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1)
            term = (part - 8.0 * xsum[:, None]) * s_row
            out = term if out is None else out + term
        return out

    gate = dq_dot(wg_ref, sg_ref)
    up = dq_dot(wu_ref, su_ref)
    act = (jax.nn.silu(gate) * up).astype(jnp.bfloat16)  # [M, C]

    acc = acc_ref[...]
    for g in range(g_mid):
        b = wd_ref[0, g * h : (g + 1) * h, :].astype(jnp.int32)
        lo = (b & 0xF).astype(jnp.bfloat16)
        hi = (b >> 4).astype(jnp.bfloat16)
        ag = act[:, g * group_size : (g + 1) * group_size]
        part = jax.lax.dot_general(
            ag[:, :h], lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + jax.lax.dot_general(
            ag[:, h:], hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        grow = c * g_mid + g
        s_row = sd_ref[0, grow, :]
        asum = jnp.sum(ag.astype(jnp.float32), axis=1)
        acc = acc + (part - 8.0 * asum[:, None]) * s_row
    acc_ref[...] = acc

    @pl.when(c == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("group_size", "out_dtype")
)
def fused_mlp_int4_stacked(
    x: jax.Array,  # [M, K]
    wgu_packed: jax.Array,  # [L, K//2, 2*inter] packed [gate || up]
    gu_scales: jax.Array,  # [L, K/gs, 2*inter] f32
    wd_packed: jax.Array,  # [L, inter//2, N]
    d_scales: jax.Array,  # [L, inter/gs, N] f32
    layer: jax.Array,  # scalar int32
    *,
    group_size: int = 128,
    out_dtype=None,
) -> jax.Array:
    """Whole SwiGLU MLP in ONE kernel launch (decode hot path); falls
    back to None when the shapes don't admit a clean chunking — the
    caller then uses the split matmuls."""
    m, k = x.shape
    num_l, k2, n2 = wgu_packed.shape
    inter = n2 // 2
    n = wd_packed.shape[2]
    assert k == 2 * k2, (k, k2)
    out_dtype = out_dtype or x.dtype
    if k % group_size or inter % group_size:
        return None
    g_in = k // group_size
    # chunk size over inter: whole groups, packed rows 32-aligned
    # (uint8 sublane tiling), blocks within the VMEM budget
    cand = None
    for nc in (4, 2, 8, 1, 19, 38):
        if inter % nc:
            continue
        csz = inter // nc
        if csz % group_size or (csz // 2) % 32:
            continue
        blk = k2 * csz + (csz // 2) * n  # packed bytes per chunk
        if blk > 3 * 1024 * 1024 and nc != 38:
            continue
        cand = (nc, csz)
        break
    if cand is None:
        return None
    n_chunks, csz = cand
    g_mid = csz // group_size

    def padg(s, rows):
        pad = (-rows) % 8
        s = s.astype(jnp.float32)
        return jnp.pad(s, ((0, 0), (0, pad), (0, 0))) if pad else s

    sg = padg(gu_scales, gu_scales.shape[1])
    g_in_pad = sg.shape[1]
    sd = padg(d_scales, d_scales.shape[1])
    g_mid_pad = sd.shape[1]

    kernel = functools.partial(
        _fused_mlp_int4_kernel,
        group_size=group_size, g_in=g_in, g_mid=g_mid,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((m, k), lambda c, lr: (0, 0)),  # x resident
            pl.BlockSpec(
                (1, k2, csz), lambda c, lr: (lr[0], 0, c)
            ),  # gate chunk (first inter columns)
            pl.BlockSpec(
                (1, k2, csz),
                lambda c, lr, _nc=n_chunks: (lr[0], 0, _nc + c),
            ),  # up chunk (second inter columns)
            pl.BlockSpec(
                (1, g_in_pad, csz), lambda c, lr: (lr[0], 0, c)
            ),
            pl.BlockSpec(
                (1, g_in_pad, csz),
                lambda c, lr, _nc=n_chunks: (lr[0], 0, _nc + c),
            ),
            pl.BlockSpec(
                (1, csz // 2, n), lambda c, lr: (lr[0], c, 0)
            ),  # down chunk
            pl.BlockSpec(
                (1, g_mid_pad, n), lambda c, lr: (lr[0], 0, 0)
            ),  # down scales resident
        ],
        out_specs=pl.BlockSpec((m, n), lambda c, lr: (0, 0)),
        scratch_shapes=[pltpu.VMEM((m, n), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=pallas_interpret_mode(),
    )(
        jnp.asarray(layer, jnp.int32).reshape(1),
        x, wgu_packed, wgu_packed, sg, sg, wd_packed, sd,
    )
