import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht_vllm_omni_tpu.ops.paged_attention import (
    paged_attention,
    paged_attention_reference,
    write_kv_pages,
)


def _make_cache(key, kv_heads, num_pages, page_size, dim, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    shape = (kv_heads, num_pages, page_size, dim)
    return (
        jax.random.normal(k1, shape, dtype),
        jax.random.normal(k2, shape, dtype),
    )


@pytest.mark.parametrize(
    "q_heads,kv_heads,page_size",
    [(4, 4, 16), (14, 2, 16), (8, 1, 32)],  # MHA, GQA w/ group 7, MQA
)
def test_paged_matches_reference(q_heads, kv_heads, page_size):
    batch, dim, num_pages, max_pages = 3, 64, 32, 4
    key = jax.random.PRNGKey(0)
    kq, kc, kt = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, q_heads, dim), jnp.float32)
    k_pages, v_pages = _make_cache(kc, kv_heads, num_pages, page_size, dim)
    block_tables = jax.random.randint(
        kt, (batch, max_pages), 0, num_pages, jnp.int32
    )
    seq_lens = jnp.array([1, 17, page_size * max_pages], dtype=jnp.int32)

    out = paged_attention(q, k_pages, v_pages, block_tables, seq_lens)
    ref = paged_attention_reference(q, k_pages, v_pages, block_tables, seq_lens)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_write_kv_pages_roundtrip():
    kv_heads, num_pages, page_size, dim = 2, 8, 16, 64
    k_pages = jnp.zeros((kv_heads, num_pages, page_size, dim))
    v_pages = jnp.zeros_like(k_pages)
    t = 5
    new_k = jnp.arange(t * kv_heads * dim, dtype=jnp.float32).reshape(
        t, kv_heads, dim
    )
    new_v = -new_k
    # Last row is padding (slot -1) and must be dropped.
    slots = jnp.array([3, 16, 17, 100, -1], dtype=jnp.int32)

    k_out, v_out = write_kv_pages(k_pages, v_pages, new_k, new_v, slots)
    flat_k = np.asarray(k_out).reshape(kv_heads, -1, dim)
    flat_v = np.asarray(v_out).reshape(kv_heads, -1, dim)
    for i, s in enumerate([3, 16, 17, 100]):
        np.testing.assert_array_equal(flat_k[:, s, :], new_k[i])
        np.testing.assert_array_equal(flat_v[:, s, :], new_v[i])
    # Everything else (incl. where slot -1 would wrap) stays zero.
    mask = np.ones(flat_k.shape[1], dtype=bool)
    mask[[3, 16, 17, 100]] = False
    assert np.all(flat_k[:, mask, :] == 0)
    assert np.all(flat_v[:, mask, :] == 0)


def test_paged_attention_after_write():
    """End-to-end: write tokens then attend — matches dense attention."""
    kv_heads, q_heads, page_size, dim = 2, 4, 16, 64
    num_pages, seq_len, batch = 16, 40, 1
    key = jax.random.PRNGKey(3)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (batch, q_heads, dim), jnp.float32)
    keys = jax.random.normal(kk, (seq_len, kv_heads, dim), jnp.float32)
    vals = jax.random.normal(kv, (seq_len, kv_heads, dim), jnp.float32)

    k_pages = jnp.zeros((kv_heads, num_pages, page_size, dim))
    v_pages = jnp.zeros_like(k_pages)
    pages = [5, 9, 2]  # non-contiguous physical pages
    slots = jnp.array(
        [pages[i // page_size] * page_size + i % page_size
         for i in range(seq_len)],
        dtype=jnp.int32,
    )
    k_pages, v_pages = write_kv_pages(k_pages, v_pages, keys, vals, slots)

    block_tables = jnp.array([pages + [0]], dtype=jnp.int32)
    seq_lens = jnp.array([seq_len], dtype=jnp.int32)
    out = paged_attention(q, k_pages, v_pages, block_tables, seq_lens)

    # dense reference
    group = q_heads // kv_heads
    kd = jnp.repeat(keys.transpose(1, 0, 2), group, axis=0)  # [QH, S, D]
    vd = jnp.repeat(vals.transpose(1, 0, 2), group, axis=0)
    s = jnp.einsum("hd,hsd->hs", q[0], kd) * dim**-0.5
    p = jax.nn.softmax(s, axis=-1)
    ref = jnp.einsum("hs,hsd->hd", p, vd)[None]
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_fresh_kernel_matches_dense_reference():
    """The fused paged+fresh decode kernel == the XLA gather-then-attend
    twin (ops/paged_attention.paged_attention_fresh_dense) including
    fresh-row visibility limits and per-sequence live lengths."""
    import jax
    import jax.numpy as jnp

    from ht_vllm_omni_tpu.ops.paged_attention import (
        paged_attention_fresh,
        paged_attention_fresh_dense,
    )

    s, k_steps = 4, 8
    nq, nkv, d = 8, 2, 64
    f = nkv * d
    page_size = 16
    rng = jax.random.PRNGKey(0)
    kv_cache = jax.random.normal(rng, (2, 64 * page_size, 2 * f),
                                 jnp.float32) * 0.3
    fresh = jax.random.normal(
        jax.random.fold_in(rng, 1), (s, k_steps, 2 * f), jnp.float32
    ) * 0.3
    q = jax.random.normal(jax.random.fold_in(rng, 2), (s, nq, d),
                          jnp.float32)
    tables = jnp.asarray(
        np.random.default_rng(0).integers(0, 64, size=(s, 3)), jnp.int32
    )
    lens = jnp.asarray([5, 33, 0, 48], jnp.int32)
    step = jnp.int32(3)

    a = paged_attention_fresh(
        q, kv_cache, jnp.int32(1), fresh, step, tables, lens,
        page_size=page_size, kv_heads=nkv,
    )
    b = paged_attention_fresh_dense(
        q, kv_cache, jnp.int32(1), fresh, step, tables, lens,
        page_size=page_size, kv_heads=nkv,
    )
    np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), rtol=2e-2, atol=2e-2
    )


def test_decode_attention_big_batch_fallback_matches():
    """The one-grid decode kernel falls back to the per-sequence grid
    when batch x nbuf page buffers would blow the VMEM budget; both
    dispatch paths must agree."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ht_vllm_omni_tpu.ops import paged_attention as pa

    B, QH, KVH, D, PAGE, L = 40, 4, 2, 64, 128, 2
    NP_ = 128
    rng = np.random.default_rng(7)
    kv = jnp.asarray(
        rng.standard_normal((L, NP_ * PAGE, 2 * KVH * D)), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((B, QH, D)), jnp.float32)
    tables = jnp.asarray(
        rng.permutation(NP_)[: B * 2].reshape(B, 2).astype(np.int32)
    )
    lens = jnp.asarray(rng.integers(1, 2 * PAGE, size=B).astype(np.int32))
    # B=40, nbuf=2, page 128 x 2F 256 x 4B = 10 MB > budget -> fallback
    big = pa.paged_decode_attention(
        q, kv, 1, tables, lens, page_size=PAGE, kv_heads=KVH
    )
    # one-grid path at a subset size that fits
    small = pa.paged_decode_attention(
        q[:8], kv, 1, tables[:8], lens[:8], page_size=PAGE, kv_heads=KVH
    )
    np.testing.assert_allclose(
        np.asarray(big[:8]), np.asarray(small), rtol=2e-5, atol=2e-5
    )
