import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht_vllm_omni_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_reference,
)


@pytest.mark.parametrize("causal", [True, False])
@pytest.mark.parametrize(
    "batch,q_heads,kv_heads,seq,dim",
    [
        (2, 4, 4, 128, 64),
        (1, 8, 2, 256, 64),  # GQA
        (2, 4, 1, 96, 128),  # MQA, ragged block
    ],
)
def test_flash_matches_reference(batch, q_heads, kv_heads, seq, dim, causal):
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(keys[0], (batch, q_heads, seq, dim), jnp.float32)
    k = jax.random.normal(keys[1], (batch, kv_heads, seq, dim), jnp.float32)
    v = jax.random.normal(keys[2], (batch, kv_heads, seq, dim), jnp.float32)

    out = flash_attention(q, k, v, causal=causal, block_q=64, block_k=64)
    ref = flash_attention_reference(q, k, v, causal=causal)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_respects_kv_lens():
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    batch, heads, seq, dim = 2, 4, 128, 64
    q = jax.random.normal(keys[0], (batch, heads, seq, dim), jnp.float32)
    k = jax.random.normal(keys[1], (batch, heads, seq, dim), jnp.float32)
    v = jax.random.normal(keys[2], (batch, heads, seq, dim), jnp.float32)
    kv_lens = jnp.array([37, 128], dtype=jnp.int32)

    out = flash_attention(q, k, v, kv_lens, causal=True, block_q=64, block_k=64)
    ref = flash_attention_reference(q, k, v, kv_lens, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_gqa_packed_with_kv_lens():
    # exercises the GQA-packed schedule (group heads folded into the q
    # axis, position = row % S) together with ragged valid lengths
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    batch, qh, kvh, seq, dim = 2, 14, 2, 512, 64
    q = jax.random.normal(keys[0], (batch, qh, seq, dim), jnp.float32)
    k = jax.random.normal(keys[1], (batch, kvh, seq, dim), jnp.float32)
    v = jax.random.normal(keys[2], (batch, kvh, seq, dim), jnp.float32)
    kv_lens = jnp.array([313, 512], dtype=jnp.int32)

    out = flash_attention(q, k, v, kv_lens, causal=True)
    ref = flash_attention_reference(q, k, v, kv_lens, causal=True)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_flash_bfloat16():
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(keys[0], (1, 2, 128, 64), jnp.bfloat16)
    k = jax.random.normal(keys[1], (1, 2, 128, 64), jnp.bfloat16)
    v = jax.random.normal(keys[2], (1, 2, 128, 64), jnp.bfloat16)
    out = flash_attention(q, k, v, causal=True, block_q=64, block_k=64)
    ref = flash_attention_reference(q, k, v, causal=True)
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref.astype(jnp.float32), atol=3e-2, rtol=3e-2
    )
