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


def ulysses_joint_attention(
    iq: jax.Array,  # [H, S_loc, D] image queries (seq-sharded)
    ik: jax.Array,
    iv: jax.Array,
    tq: jax.Array,  # [H, S_txt, D] text queries (replicated over axis)
    tk: jax.Array,
    tv: jax.Array,
    *,
    axis: str,
    sp_size: int,
    txt_len: jax.Array | int | None = None,  # valid text tokens
) -> tuple[jax.Array, jax.Array]:
    """Joint dual-stream (MMDiT) attention under Ulysses SP.

    The qwen-image-class transformers run ONE attention over the joint
    [img || txt] sequence with both streams producing queries (reference
    qwen_image_transformer.py:854 joint attention; the reference's
    Ulysses layer handles the joint stream at
    attention/parallel/ulysses.py:219-287).  Under SP the image tokens
    arrive seq-sharded while text is short and replicated:

    - img q/k/v all_to_all to head-sharding (each device: H/sp heads,
      full image sequence);
    - this device's HEAD SLICE of the replicated text q/k/v joins:
      kv = [img_full || txt_slice], one flash call computes BOTH query
      streams ([img_full_q || txt_q] vs kv);
    - image output reverse-all_to_alls back to seq-sharding; text output
      all_gathers over heads so every shard carries the full text stream
      (it is recomputed redundantly across sp — it's short).

    Text tail padding is masked via kv_lens (= S_img_full + txt_len);
    the image segment must be fully valid (qwen-image's packed latents
    always are).  heads % sp != 0 is handled by UAA head padding.

    Returns (img_out [H, S_loc, D] seq-sharded,
             txt_out [H, S_txt, D] replicated).
    """
    heads, s_loc, d = iq.shape
    s_txt = tq.shape[1]
    hp = round_up(heads, sp_size)
    hs = hp // sp_size

    def padh(x):
        if hp == x.shape[0]:
            return x
        return jnp.pad(x, ((0, hp - x.shape[0]), (0, 0), (0, 0)))

    def to_heads(x):
        return jax.lax.all_to_all(
            x, axis, split_axis=0, concat_axis=1, tiled=True
        )

    iqh, ikh, ivh = (to_heads(padh(t)) for t in (iq, ik, iv))
    idx = jax.lax.axis_index(axis)
    tqh, tkh, tvh = (
        jax.lax.dynamic_slice_in_dim(padh(t), idx * hs, hs, 0)
        for t in (tq, tk, tv)
    )
    s_full = s_loc * sp_size
    if txt_len is None:
        txt_len = s_txt
    kv_lens = (
        jnp.asarray(s_full + txt_len, jnp.int32).reshape(1)
    )
    q_all = jnp.concatenate([iqh, tqh], axis=1)
    k_all = jnp.concatenate([ikh, tkh], axis=1)
    v_all = jnp.concatenate([ivh, tvh], axis=1)
    o = flash_attention(
        q_all[None], k_all[None], v_all[None], kv_lens, causal=False
    )[0]
    o_img = jax.lax.all_to_all(
        o[:, :s_full], axis, split_axis=1, concat_axis=0, tiled=True
    )[:heads]
    o_txt = jax.lax.all_gather(
        o[:, s_full:], axis, axis=0, tiled=True
    )[:heads]
    return o_img, o_txt


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
