"""Chunked prefill attention: context pages + causal self part must equal
dense full-sequence attention."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.ops.flash_attention import flash_attention_reference
from ht_vllm_omni_tpu.ops.kv_cache_update import flush_kv_rows_donated
from ht_vllm_omni_tpu.ops.paged_prefill import (
    chunk_self_partial,
    merge_partials,
    paged_context_partial,
)


def test_chunked_equals_dense():
    kvh, qh, d, ps = 2, 4, 64, 16
    ctx, chunk = 40, 24
    total = ctx + chunk
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q_all = jax.random.normal(ks[0], (total, qh, d), jnp.float32)
    k_all = jax.random.normal(ks[1], (total, kvh, d), jnp.float32)
    v_all = jax.random.normal(ks[2], (total, kvh, d), jnp.float32)

    # dense reference over the whole sequence; take the chunk's rows
    ref = flash_attention_reference(
        q_all.transpose(1, 0, 2)[None],
        k_all.transpose(1, 0, 2)[None],
        v_all.transpose(1, 0, 2)[None],
        causal=True,
    )[0].transpose(1, 0, 2)[ctx:]

    # put the context KV into pages (non-contiguous)
    f = kvh * d
    nslots = 16 * ps
    cache = jnp.zeros((1, nslots, 2 * f), jnp.float32)
    pages = [5, 9, 2]  # ceil(40/16) = 3 pages
    slots = np.array(
        [pages[i // ps] * ps + i % ps for i in range(ctx)], np.int32
    )
    rows = jnp.concatenate(
        [k_all[:ctx].reshape(ctx, f), v_all[:ctx].reshape(ctx, f)], axis=-1
    )
    cache = flush_kv_rows_donated(cache, rows[None], jnp.asarray(slots))

    q_c = q_all[ctx:]
    acc_c, m_c, l_c = paged_context_partial(
        q_c, cache, jnp.int32(0),
        jnp.asarray(pages + [0], jnp.int32), jnp.int32(ctx),
        page_size=ps, kv_heads=kvh, block_q=16,
    )
    group = qh // kvh
    acc_s, m_s, l_s = chunk_self_partial(
        q_c, k_all[ctx:], v_all[ctx:], jnp.int32(chunk), kv_heads=kvh
    )
    out = merge_partials(
        [(acc_c[:, :, :group], m_c[:, :, :group], l_c[:, :, :group]),
         (acc_s, m_s, l_s)]
    )
    out = out.reshape(chunk, qh, d)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)


def test_zero_context_chunk():
    """First chunk: no pages yet — pure causal self attention."""
    kvh, qh, d, ps = 2, 4, 32, 16
    chunk = 16
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(ks[0], (chunk, qh, d), jnp.float32)
    k = jax.random.normal(ks[1], (chunk, kvh, d), jnp.float32)
    v = jax.random.normal(ks[2], (chunk, kvh, d), jnp.float32)
    ref = flash_attention_reference(
        q.transpose(1, 0, 2)[None], k.transpose(1, 0, 2)[None],
        v.transpose(1, 0, 2)[None], causal=True,
    )[0].transpose(1, 0, 2)

    f = kvh * d
    cache = jnp.zeros((1, 8 * ps, 2 * f), jnp.float32)
    acc_c, m_c, l_c = paged_context_partial(
        q, cache, jnp.int32(0), jnp.zeros(2, jnp.int32), jnp.int32(0),
        page_size=ps, kv_heads=kvh, block_q=16,
    )
    group = qh // kvh
    acc_s, m_s, l_s = chunk_self_partial(
        q, k, v, jnp.int32(chunk), kv_heads=kvh
    )
    out = merge_partials(
        [(acc_c[:, :, :group], m_c[:, :, :group], l_c[:, :, :group]),
         (acc_s, m_s, l_s)]
    ).reshape(chunk, qh, d)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)
