"""TeaCache-style denoise-step caching.

Counterpart of the reference's TeaCache backend (reference
vllm_omni/diffusion/cache/teacache/backend.py): across denoise steps the
DiT's output changes smoothly; when the accumulated relative change of the
timestep-conditioning signal stays under a threshold, the transformer
call is skipped and the previous step's residual delta is reused.  The
skip decision is data-dependent, so it runs on device via lax.cond inside
the jitted denoise loop.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TeaCacheConfig:
    enabled: bool = False
    # accumulated relative-change threshold below which steps are skipped
    threshold: float = 0.15


def init_state(latent_tokens_shape: tuple) -> dict:
    return {
        "prev_signal": jnp.zeros((), jnp.float32),
        "accum": jnp.asarray(jnp.inf, jnp.float32),  # never skip step 0
        "prev_delta": jnp.zeros(latent_tokens_shape, jnp.float32),
    }


def should_skip(state: dict, signal: jax.Array, threshold: float):
    """signal: scalar summary of the timestep conditioning (e.g. mean |t_vec|
    modulation).  Returns (skip: bool, new_state_fields)."""
    rel = jnp.abs(signal - state["prev_signal"]) / (
        jnp.abs(state["prev_signal"]) + 1e-8
    )
    accum = state["accum"] + rel
    skip = accum < threshold
    new_accum = jnp.where(skip, accum, 0.0)
    return skip, new_accum


def cached_velocity(
    state: dict,
    signal: jax.Array,
    compute_fn,
    threshold: float,
):
    """Run compute_fn() or reuse the cached delta, updating state."""
    skip, new_accum = should_skip(state, signal, threshold)

    def use_cache(_):
        return state["prev_delta"]

    def compute(_):
        return compute_fn().astype(jnp.float32)

    delta = jax.lax.cond(skip, use_cache, compute, None)
    new_state = {
        "prev_signal": jnp.asarray(signal, jnp.float32),
        "accum": new_accum,
        "prev_delta": delta,
    }
    return delta, new_state
