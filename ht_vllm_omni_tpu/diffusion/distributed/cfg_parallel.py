"""Classifier-free-guidance parallelism over a mesh axis.

Counterpart of the reference's CFGParallelMixin (reference
vllm_omni/diffusion/distributed/cfg_parallel.py:35-109): shard 0 runs the
positive (conditioned) branch, shard 1 the negative branch, and the
guidance combine happens once via a psum-style exchange — deterministic
on every shard (the reference all_gathers then combines locally for the
same reason).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cfg_combine(
    velocity: jax.Array,  # this shard's branch output
    guidance_scale: jax.Array,
    *,
    axis: str,
) -> jax.Array:
    """Inside shard_map over ``axis`` (size 2): returns the guided
    velocity, identical on both shards."""
    idx = jax.lax.axis_index(axis)
    # gather both branches: [2, ...]
    both = jax.lax.all_gather(velocity, axis, axis=0, tiled=False)
    v_cond = both[0]
    v_uncond = both[1]
    del idx
    return v_uncond + guidance_scale * (v_cond - v_uncond)


def cfg_combine_rescale(
    velocity: jax.Array,  # this shard's branch output (shard0=cond)
    guidance_scale: jax.Array,
    *,
    axis: str,
) -> jax.Array:
    """cfg_combine + the norm-preserving rescale the qwen-image family
    applies after guidance (reference distributed/cfg_parallel.py:132-146
    apply_normalized_cfg): comb is rescaled per token so its norm matches
    the conditional branch's.  guidance_scale == 1 degenerates to the
    plain conditional output (used when CFG is off but the mesh still
    carries a cfg axis)."""
    both = jax.lax.all_gather(velocity, axis, axis=0, tiled=False)
    v_cond = both[0]
    v_uncond = both[1]
    comb = v_uncond + guidance_scale * (v_cond - v_uncond)
    cn = jnp.linalg.norm(v_cond, axis=-1, keepdims=True)
    nn = jnp.linalg.norm(comb, axis=-1, keepdims=True)
    return comb * (cn / jnp.maximum(nn, 1e-12))


def cfg_combine_local(
    v_cond: jax.Array, v_uncond: jax.Array, guidance_scale
) -> jax.Array:
    return v_uncond + guidance_scale * (v_cond - v_uncond)


def is_negative_shard(axis: str) -> jax.Array:
    return jax.lax.axis_index(axis) == 1


def guided_or_plain(velocity, guidance_scale, axis: str | None):
    if axis is None:
        return velocity
    return cfg_combine(velocity, guidance_scale, axis=axis)


def select_branch_tokens(cond, uncond, axis: str | None):
    """Pick this shard's conditioning tokens (positive on shard 0)."""
    if axis is None:
        return cond
    return jnp.where(
        jax.lax.axis_index(axis) == 0, cond, uncond
    )
