"""Ring attention: blockwise sequence parallelism via ppermute.

Counterpart of the reference's ring flash-attention stack (reference
vllm_omni/diffusion/attention/backends/ring/ring_flash_attn.py:13,233 and
the P2P GroupCoordinator): K/V blocks rotate around the "ring" mesh axis
while each device accumulates online-softmax partials (out and fp32 LSE,
the reference's update_out_and_lse, ring_kernels.py:108-111) for its local
queries.  On TPU the rotation is jax.lax.ppermute over ICI, which XLA
overlaps with the attention compute of the resident block.

Composes with Ulysses (hybrid SP, reference parallel_state.py:601-673):
apply ulysses_attention's head reshard first, ring over the remaining
sequence shards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.ops.flash_attention import flash_attention

NEG_INF = float("-inf")


def _block_attention(q, k, v):
    """Partial attention of local q against one K/V block.

    Returns (out_unnormalized [H, S, D] f32, m [H, S], l [H, S]).
    """
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    d = q.shape[-1]
    s = jnp.einsum("hqd,hkd->hqk", qf, kf) * (d**-0.5)
    m = jnp.max(s, axis=-1)  # [H, S]
    p = jnp.exp(s - m[..., None])
    el = jnp.sum(p, axis=-1)
    o = jnp.einsum("hqk,hkd->hqd", p, vf)
    return o, m, el


def ring_attention(
    q: jax.Array,  # [H, S_local, D]
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    text_kv: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Full-sequence attention with seq-sharded Q/K/V; returns the local
    queries' output [H, S_local, D].

    ``text_kv`` = replicated joint text-prefix K/V ([H, T_txt, D]):
    every shard's queries attend it once, folded into the same online
    softmax before the ring rotation starts (the reference's
    joint_strategy front handling, ring/ulysses.py:219-360)."""
    size = jax.lax.axis_size(axis)
    if size == 1:
        if text_kv is not None:
            k = jnp.concatenate([text_kv[0], k], axis=1)
            v = jnp.concatenate([text_kv[1], v], axis=1)
        return flash_attention(q[None], k[None], v[None], causal=False)[0]

    perm = [(i, (i + 1) % size) for i in range(size)]

    def body(i, carry):
        k_blk, v_blk, o_acc, m_acc, l_acc = carry
        o_b, m_b, l_b = _block_attention(q, k_blk, v_blk)
        m_new = jnp.maximum(m_acc, m_b)
        a_old = jnp.where(m_acc == NEG_INF, 0.0, jnp.exp(m_acc - m_new))
        a_new = jnp.exp(m_b - m_new)
        o_acc = o_acc * a_old[..., None] + o_b * a_new[..., None]
        l_acc = l_acc * a_old + l_b * a_new
        # rotate K/V to the next device (skipped after the last block)
        k_blk = jax.lax.ppermute(k_blk, axis, perm)
        v_blk = jax.lax.ppermute(v_blk, axis, perm)
        return k_blk, v_blk, o_acc, m_new, l_acc

    h, s_loc, d = q.shape
    o0 = jnp.zeros((h, s_loc, d), jnp.float32)
    m0 = jnp.full((h, s_loc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((h, s_loc), jnp.float32)
    if text_kv is not None:
        # fold the replicated text prefix into the accumulators once
        o0, m0, l0 = _block_attention(q, text_kv[0], text_kv[1])
    init = (k, v, o0, m0, l0)
    _, _, o, m, l = jax.lax.fori_loop(0, size, body, init)
    denom = jnp.where(l == 0.0, 1.0, l)
    return (o / denom[..., None]).astype(q.dtype)
