"""Ulysses sequence parallelism: all_to_all head<->seq reshard.

Counterpart of the reference's UlyssesParallelAttention (reference
vllm_omni/diffusion/attention/parallel/ulysses.py:167 and SeqAllToAll4D,
distributed/comm.py:103), expressed with jax collectives: tokens arrive
sharded over the "sp" mesh axis; all_to_all converts seq-sharding to
head-sharding so each device runs full-sequence attention on its head
slice, then the reverse all_to_all restores seq-sharding.
Requires heads % sp == 0 (the reference's UAA padding mode maps to
padding heads before entry).
"""

from __future__ import annotations

import jax

from ht_vllm_omni_tpu.ops.flash_attention import flash_attention


def ulysses_attention(
    q: jax.Array,  # [heads, S_local, D] (full heads, local sequence)
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    sp_size: int,
) -> jax.Array:
    """Returns [heads, S_local, D] attention output, seq-sharded again."""
    if sp_size == 1:
        return flash_attention(q[None], k[None], v[None], causal=False)[0]

    def reshard_to_heads(x):
        # [H, S_loc, D] -> all_to_all over heads: each device keeps H/sp
        # heads but gathers the full sequence
        return jax.lax.all_to_all(
            x, axis, split_axis=0, concat_axis=1, tiled=True
        )  # [H/sp, S_full, D]

    qh, kh, vh = (reshard_to_heads(t) for t in (q, k, v))
    o = flash_attention(qh[None], kh[None], vh[None], causal=False)[0]
    # reverse: heads back to full, sequence back to local
    return jax.lax.all_to_all(
        o, axis, split_axis=1, concat_axis=0, tiled=True
    )
