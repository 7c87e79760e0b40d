"""DBCache-style block-level caching (the reference's cache-dit backend).

TPU-native re-implementation of the cache-dit DBCache algorithm the
reference wraps (reference vllm_omni/diffusion/cache/cache_dit_backend.py
via the cache_dit library's DBCacheConfig): every denoise step always
computes the first ``Fn_compute_blocks`` transformer blocks; the relative
L1 change of that early hidden state against the last fully-computed step
decides whether the (expensive) middle blocks can be skipped — if so the
cached middle-block residual is re-applied; the last
``Bn_compute_blocks`` blocks always compute.  Warmup steps and a cap on
consecutive cached steps bound the drift.

The skip decision is data-dependent, so it runs on device under
``lax.cond`` inside the jitted denoise loop (same integration shape as
cache/teacache.py).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DBCacheConfig:
    enabled: bool = False
    Fn_compute_blocks: int = 1
    Bn_compute_blocks: int = 0
    max_warmup_steps: int = 4
    residual_diff_threshold: float = 0.24
    max_continuous_cached_steps: int = 3


def init_state(hidden_shape: tuple) -> dict:
    return {
        "prev_fn": jnp.zeros(hidden_shape, jnp.float32),
        "mid_residual": jnp.zeros(hidden_shape, jnp.float32),
        "consec": jnp.zeros((), jnp.int32),
        "have_cache": jnp.zeros((), bool),
    }


def cached_mid(
    state: dict,
    step_idx: jax.Array,
    fn_out: jax.Array,  # hidden after the Fn blocks
    compute_mid,  # () -> hidden after the middle blocks
    cfg: DBCacheConfig,
):
    """Return (mid_out, new_state, cached?: bool scalar)."""
    fn32 = fn_out.astype(jnp.float32)
    prev = state["prev_fn"]
    rel = jnp.mean(jnp.abs(fn32 - prev)) / (jnp.mean(jnp.abs(prev)) + 1e-8)
    can = jnp.logical_and(
        jnp.logical_and(
            step_idx >= cfg.max_warmup_steps,
            rel < cfg.residual_diff_threshold,
        ),
        jnp.logical_and(
            state["consec"] < cfg.max_continuous_cached_steps,
            state["have_cache"],
        ),
    )

    def use_cache(_):
        return fn32 + state["mid_residual"]

    def compute(_):
        return compute_mid().astype(jnp.float32)

    out = jax.lax.cond(can, use_cache, compute, None)
    new_state = {
        "prev_fn": fn32,
        "mid_residual": out - fn32,
        "consec": jnp.where(can, state["consec"] + 1, 0),
        "have_cache": jnp.ones((), bool),
    }
    return out, new_state, can
