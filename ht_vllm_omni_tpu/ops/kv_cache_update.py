"""In-place KV cache flush (Pallas, aliased input/output).

Cache layout: ONE array per stage, [L, NSLOTS, 2F] where F = KVH *
head_dim and a token's row is [K_feat || V_feat] (NSLOTS = num_pages *
page_size).

Why a single deferred flush instead of per-layer writes: XLA only honours
input_output_aliases without copying when the aliased operand is a
top-level donated buffer — an aliased custom call inside lax.scan (or even
mid-program) inserts a whole-cache copy (measured 180-490 ms/step on a
0.5B model).  So the model NEVER writes the cache during compute; each
program accumulates fresh K/V rows in a small buffer and calls
``flush_kv_rows`` exactly once, at top level, on the donated cache.
Decode attention reads the in-chunk rows from that buffer instead (merged
with the paged partials via logsumexp — worker/model_runner.py).

Row DMA shape is [2F/128, 128]: whole (sublane, lane) tiles, the Mosaic
requirement (needs F % 128 == 0; true for every mainstream model).

TPU equivalent of vLLM's reshape_and_cache CUDA kernel (SURVEY §2.9).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ht_vllm_omni_tpu.utils import pallas_interpret_mode

_LANES = 128
_INFLIGHT = 8  # row DMAs kept in flight per layer


def quantize_rows(
    rows: jax.Array, f: int, k_scale: float, v_scale: float,
    dtype=jnp.int8,
) -> jax.Array:
    """Per-tensor quantization of [..., 2F] K||V rows to int8 (symmetric
    round) or float8_e4m3fn (scale + saturate)."""
    kf = rows[..., :f].astype(jnp.float32) / k_scale
    vf = rows[..., f:].astype(jnp.float32) / v_scale
    if dtype == jnp.int8:
        kf = jnp.clip(jnp.round(kf), -127, 127)
        vf = jnp.clip(jnp.round(vf), -127, 127)
    else:  # fp8: clamp to the e4m3fn dynamic range
        kf = jnp.clip(kf, -448.0, 448.0)
        vf = jnp.clip(vf, -448.0, 448.0)
    return jnp.concatenate([kf, vf], axis=-1).astype(dtype)


def _flush_kernel(
    # scalar prefetch
    slot_ref,  # [T] int32 flat slot ids (-1 = skip)
    # inputs (leading-dim sliced only; trailing two dims DMA'd whole)
    cache_hbm,  # [L, NSLOTS, R, 128]   (R = 2F/128)
    fresh_hbm,  # [L, T, R, 128]
    # output (aliased to cache_hbm)
    out_hbm,
    # scratch
    sems,  # [INFLIGHT] DMA semaphores
):
    li = pl.program_id(0)
    t_total = fresh_hbm.shape[1]
    nslots = out_hbm.shape[1]

    def valid(i):
        # -1 padding and out-of-shard slots (dp-sharded cache) are skipped
        return jnp.logical_and(slot_ref[i] >= 0, slot_ref[i] < nslots)

    def mk(i):
        return pltpu.make_async_copy(
            fresh_hbm.at[li, i],  # [R, 128]
            out_hbm.at[li, slot_ref[i]],  # [R, 128]
            sems.at[i % _INFLIGHT],
        )

    def body(i, _):
        @pl.when(jnp.logical_and(i >= _INFLIGHT, valid(i - _INFLIGHT)))
        def _():
            mk(i - _INFLIGHT).wait()

        @pl.when(valid(i))
        def _():
            mk(i).start()

        return 0

    jax.lax.fori_loop(0, t_total, body, 0)

    def drain(i, _):
        @pl.when(valid(i))
        def _():
            mk(i).wait()

        return 0

    jax.lax.fori_loop(max(t_total - _INFLIGHT, 0), t_total, drain, 0)


def flush_kv_rows(
    cache: jax.Array,  # [L, NSLOTS, 2F (+pad)]
    fresh: jax.Array,  # [L, T, 2F] rows to write ([K || V] per token)
    slot_mapping: jax.Array,  # [T] int32, -1 = skip
    *,
    true_f: int | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Write fresh rows into the cache at flat slots, in place.

    MUST be called at top level of a jit whose ``cache`` argument is
    donated — that is the only composition where XLA elides the copy.
    For int8 caches, rows are per-tensor quantized here and the feature
    dim may carry alignment padding (true_f = real KVH*D).
    """
    num_layers, nslots, two_f = cache.shape
    t = fresh.shape[1]
    if cache.dtype in (jnp.int8, jnp.dtype(jnp.float8_e4m3fn)):
        f = true_f if true_f is not None else fresh.shape[-1] // 2
        fresh = quantize_rows(
            fresh, f, k_scale, v_scale, dtype=cache.dtype
        )
    if fresh.shape[-1] < two_f:  # alignment padding
        fresh = jnp.pad(
            fresh,
            ((0, 0), (0, 0), (0, two_f - fresh.shape[-1])),
        )
    itemsize = jnp.dtype(cache.dtype).itemsize
    req_sublanes = {4: 8, 2: 2, 1: 4}.get(itemsize, 8)
    r = two_f // _LANES
    if two_f % _LANES != 0 or r % req_sublanes != 0:
        # rows don't cover whole tiles -> scatter fallback (copies; only
        # hit by exotic head layouts)
        slots = jnp.where(slot_mapping < 0, nslots, slot_mapping)
        # single advanced index stays in place: value shape is [L, T, 2F]
        return cache.at[:, slots, :].set(
            fresh.astype(cache.dtype), mode="drop"
        )

    out = pl.pallas_call(
        _flush_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_layers,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((_INFLIGHT,))],
        ),
        out_shape=jax.ShapeDtypeStruct(
            (num_layers, nslots, r, _LANES), cache.dtype
        ),
        input_output_aliases={1: 0},  # cache (after scalar arg) -> out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=pallas_interpret_mode(),
    )(
        slot_mapping.astype(jnp.int32),
        cache.reshape(num_layers, nslots, r, _LANES),
        fresh.astype(cache.dtype).reshape(num_layers, t, r, _LANES),
    )
    return out.reshape(cache.shape)


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("true_f", "k_scale", "v_scale"),
)
def flush_kv_rows_donated(
    cache, fresh, slot_mapping, *, true_f=None, k_scale=1.0, v_scale=1.0
):
    """Standalone jitted flush (tests / direct use)."""
    return flush_kv_rows(
        cache, fresh, slot_mapping,
        true_f=true_f, k_scale=k_scale, v_scale=v_scale,
    )
