"""Shared transformer building blocks (jnp-level; XLA fuses these).

RoPE follows the HF rotate-half convention exactly so checkpoints load
bit-compatibly (the reference inherits this via upstream vLLM's
MRotaryEmbedding; M-RoPE multimodal sections live in models/mrope.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    dtype = x.dtype
    x = x.astype(jnp.float32)
    var = jnp.mean(x * x, axis=-1, keepdims=True)
    x = x * jax.lax.rsqrt(var + eps)
    return (x * weight.astype(jnp.float32)).astype(dtype)


def rope_cos_sin(
    positions: jax.Array,  # [...]
    head_dim: int,
    theta: float,
) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for the given positions: [..., head_dim]."""
    half = head_dim // 2
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    x: jax.Array,  # [..., heads, head_dim] or [..., head_dim]
    cos: jax.Array,  # [..., head_dim] broadcastable
    sin: jax.Array,
) -> jax.Array:
    orig = x.dtype
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(orig)


def apply_rope_gptj(
    x: jax.Array,  # [..., head_dim]
    cos: jax.Array,  # [..., head_dim] (standard [f || f] concat tables)
    sin: jax.Array,
) -> jax.Array:
    """Interleaved (GPT-J / is_neox_style=False) rotation: frequency i
    rotates the (2i, 2i+1) pair.  Fish-Speech trains with this style
    (reference fish_speech_slow_ar.py:_fix_rope_style)."""
    orig = x.dtype
    half = x.shape[-1] // 2
    xf = x.astype(jnp.float32)
    c = cos[..., :half]
    s = sin[..., :half]
    x_even = xf[..., 0::2]
    x_odd = xf[..., 1::2]
    out_even = x_even * c - x_odd * s
    out_odd = x_odd * c + x_even * s
    return jnp.stack([out_even, out_odd], axis=-1).reshape(
        xf.shape
    ).astype(orig)


def swiglu_mlp(
    x: jax.Array,  # [..., H]
    gate_w: jax.Array,  # [H, I]
    up_w: jax.Array,  # [H, I]
    down_w: jax.Array,  # [I, H]
) -> jax.Array:
    g = jnp.dot(x, gate_w, preferred_element_type=jnp.float32)
    u = jnp.dot(x, up_w, preferred_element_type=jnp.float32)
    h = (jax.nn.silu(g) * u).astype(x.dtype)
    return jnp.dot(h, down_w, preferred_element_type=jnp.float32).astype(
        x.dtype
    )
