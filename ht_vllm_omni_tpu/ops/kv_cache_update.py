"""In-place KV cache row writes (XLA scatter on the donated cache).

Cache layout: ONE array per stage, [L, NSLOTS, 2F] where F = KVH *
head_dim and a token's row is [K_feat || V_feat] (NSLOTS = num_pages *
page_size).

A single advanced-index ``cache.at[:, slots].set(rows, mode="drop")``
lowers to an in-place XLA scatter when the cache is a donated argument
or a loop carry (~1 us for a decode step's 8 rows, measured on v5e) —
negative slots fall out of bounds and are dropped, which is how padding
and out-of-shard rows (dp-sharded caches) are skipped.  An earlier
revision used a Pallas row-DMA kernel here; its [L, NSLOTS, 2F/128,
128] operand view made XLA re-tile the whole cache (T(8,128) ->
T(2,128), ~6.5 ms per direction per prefill on a 0.5B model), so the
plain scatter is both simpler and faster.

TPU equivalent of vLLM's reshape_and_cache CUDA kernel (SURVEY §2.9).
Decode writes its rows directly inside the step loop
(models/qwen2.decode_direct); this module serves the prefill/page
paths and KV-transfer injection.
"""

import functools

import jax
import jax.numpy as jnp


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


def flush_kv_rows(
    cache: jax.Array,  # [L, NSLOTS, 2F (+pad)]
    fresh: jax.Array,  # [L, T, 2F] rows to write ([K || V] per token)
    slot_mapping: jax.Array,  # [T] int32, -1 = skip
    *,
    true_f: int | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    prequantized: bool = False,
) -> jax.Array:
    """Write fresh rows into the cache at flat slots, in place.

    Call at top level of a jit whose ``cache`` argument is donated (or
    on a loop carry) so the scatter aliases.  For int8/fp8 caches, rows
    are per-tensor quantized here and the feature dim may carry
    alignment padding (true_f = real KVH*D) — unless ``prequantized``:
    rows already carry the cache dtype/scales (scale-matched KV
    transfers inject bit-exact, distributed/kv_transfer.py)."""
    num_layers, nslots, two_f = cache.shape
    if not prequantized and cache.dtype in (
        jnp.int8, jnp.dtype(jnp.float8_e4m3fn)
    ):
        f = true_f if true_f is not None else fresh.shape[-1] // 2
        fresh = quantize_rows(
            fresh, f, k_scale, v_scale, dtype=cache.dtype
        )
    if fresh.shape[-1] < two_f:  # alignment padding
        fresh = jnp.pad(
            fresh,
            ((0, 0), (0, 0), (0, two_f - fresh.shape[-1])),
        )
    # Per-layer scatter on a fori_loop carry.  XLA only elides the
    # whole-array copy when the scatter operand is a loop carry (the
    # decode step loop gets this for free); a top-level scatter on the
    # donated argument — 3-D, flat-bitcast, unique_indices, any form —
    # was measured re-materializing the full cache (~8-10 ms on 0.5B).
    t = fresh.shape[1]
    # padding (-1) slots become DISTINCT out-of-bounds indices so the
    # scatter qualifies as unique_indices (duplicates force a
    # serializing row-at-a-time lowering, ~60x slower)
    slots = jnp.where(
        slot_mapping < 0,
        nslots + jnp.arange(t, dtype=jnp.int32),
        slot_mapping.astype(jnp.int32),
    )
    fresh = fresh.astype(cache.dtype)

    def body(li, c):
        return c.at[li, slots].set(
            fresh[li], mode="drop", unique_indices=True
        )

    return jax.lax.fori_loop(
        0, num_layers, body, cache, unroll=False
    )


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=("true_f", "k_scale", "v_scale", "prequantized"),
)
def flush_kv_rows_donated(
    cache, fresh, slot_mapping, *, true_f=None, k_scale=1.0,
    v_scale=1.0, prequantized=False,
):
    """Standalone jitted flush (tests / KV-transfer injection)."""
    return flush_kv_rows(
        cache, fresh, slot_mapping,
        true_f=true_f, k_scale=k_scale, v_scale=v_scale,
        prequantized=prequantized,
    )


def flush_kv_pages(
    cache: jax.Array,  # [L, NSLOTS, 2F (+pad)]
    fresh: jax.Array,  # [L, T, 2F], T % page_size == 0, PAGE-ALIGNED
    slot_mapping: jax.Array,  # [T] int32, -1 = skip
    *,
    page_size: int,
    true_f: int | None = None,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
) -> jax.Array:
    """Page-granular variant of flush_kv_rows for PAGE-ALIGNED writes
    (whole/batched prefill: each ps-sized window of ``fresh`` lands in
    one page).  Row scatters serialize at ~6 GB/s on TPU (~8 ms for an
    8x512 prefill batch); whole-page dynamic_update_slice runs at copy
    speed.  Rows past the prompt inside an owned page write garbage
    that is masked by seq_len and overwritten by decode's direct
    writes; windows whose first slot is -1 (padding / non-owner dp
    shards) are skipped via a read-modify-write select."""
    num_layers, nslots, two_f = cache.shape
    if cache.dtype in (jnp.int8, jnp.dtype(jnp.float8_e4m3fn)):
        f = true_f if true_f is not None else fresh.shape[-1] // 2
        fresh = quantize_rows(
            fresh, f, k_scale, v_scale, dtype=cache.dtype
        )
    if fresh.shape[-1] < two_f:
        fresh = jnp.pad(
            fresh, ((0, 0), (0, 0), (0, two_f - fresh.shape[-1]))
        )
    fresh = fresh.astype(cache.dtype)
    t = fresh.shape[1]
    assert t % page_size == 0, (t, page_size)
    n_windows = t // page_size
    first = slot_mapping[:: page_size]  # [n_windows]
    page_of = jnp.where(first < 0, -1, first // page_size)

    def body(i, c):
        pid = page_of[i]
        valid = pid >= 0
        start = jnp.clip(pid, 0, nslots // page_size - 1) * page_size
        blk = jax.lax.dynamic_slice(
            fresh, (0, i * page_size, 0),
            (num_layers, page_size, two_f),
        )
        cur = jax.lax.dynamic_slice(
            c, (0, start, 0), (num_layers, page_size, two_f)
        )
        blk = jnp.where(valid, blk, cur)
        return jax.lax.dynamic_update_slice(c, blk, (0, start, 0))

    return jax.lax.fori_loop(0, n_windows, body, cache)
