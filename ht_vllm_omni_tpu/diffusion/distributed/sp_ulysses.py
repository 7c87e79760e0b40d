"""Ulysses sequence parallelism: all_to_all head<->seq reshard.

Counterpart of the reference's UlyssesParallelAttention (reference
vllm_omni/diffusion/attention/parallel/ulysses.py:167 and SeqAllToAll4D,
distributed/comm.py:103), expressed with jax collectives: tokens arrive
sharded over the "sp" mesh axis; all_to_all converts seq-sharding to
head-sharding so each device runs full-sequence attention on its head
slice, then the reverse all_to_all restores seq-sharding.

``ulysses_attention`` is the fast path (heads % sp == 0, even seq).
``ulysses_attention_uneven`` is the Ulysses-Anything equivalent
(reference ulysses.py:52-104 head padding, :219-287 joint text prefix):
heads are zero-padded to the sp multiple, padded tail KV rows are
masked out via the flash kernel's kv_lens, and an optional replicated
text-prefix stream joins the gathered sequence as extra context — so
odd resolutions / head counts shard without caller gymnastics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.ops.flash_attention import flash_attention
from ht_vllm_omni_tpu.utils import round_up


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


def ulysses_attention_uneven(
    q: jax.Array,  # [heads, S_local, D] (caller pads S to sp multiple)
    k: jax.Array,
    v: jax.Array,
    *,
    axis: str,
    sp_size: int,
    valid_len: jax.Array | int | None = None,  # global valid tokens
    text_kv: tuple[jax.Array, jax.Array] | None = None,  # replicated
) -> jax.Array:
    """Ulysses-Anything: uneven heads/sequence + joint text prefix.

    - heads % sp != 0: zero-pad the head axis to the sp multiple before
      the all_to_all, slice the pad back off after the reverse (the
      reference's UAA head-padding mode, ulysses.py:70-75).
    - global seq % sp != 0: the CALLER zero-pads tokens to an sp
      multiple (static shapes — XLA requirement) and passes
      ``valid_len``; padded tail KV rows are masked out of the softmax
      via the flash kernel's kv_lens, so results are exact, not
      approximate.  Padded query rows produce garbage the caller drops.
    - ``text_kv`` = ([H, T_txt, D], [H, T_txt, D]) replicated text
      k/v: every shard attends its head slice of the text prefix ahead
      of the gathered image sequence (reference joint-stream handling,
      ulysses.py:219-287).

    Returns [heads, S_local, D], seq-sharded again."""
    heads, s_local, d = q.shape
    hp = round_up(heads, sp_size)

    def padh(x):
        if hp == heads:
            return x
        return jnp.pad(x, ((0, hp - heads), (0, 0), (0, 0)))

    def to_heads(x):
        return jax.lax.all_to_all(
            x, axis, split_axis=0, concat_axis=1, tiled=True
        )

    qh, kh, vh = (to_heads(padh(t)) for t in (q, k, v))
    s_full = s_local * sp_size
    if valid_len is None:
        valid_len = s_full
    kv_lens = jnp.asarray(valid_len, jnp.int32).reshape(1)
    if text_kv is not None:
        tk, tv = text_kv
        t_txt = tk.shape[1]
        idx = jax.lax.axis_index(axis)
        h_shard = hp // sp_size
        tk, tv = (
            jax.lax.dynamic_slice_in_dim(padh(t), idx * h_shard, h_shard, 0)
            for t in (tk, tv)
        )
        kh = jnp.concatenate([tk, kh], axis=1)
        vh = jnp.concatenate([tv, vh], axis=1)
        kv_lens = kv_lens + t_txt
    o = flash_attention(
        qh[None], kh[None], vh[None], kv_lens, causal=False
    )[0]
    o = jax.lax.all_to_all(
        o, axis, split_axis=1, concat_axis=0, tiled=True
    )
    return o[:heads]
