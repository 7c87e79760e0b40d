import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht_vllm_omni_tpu.ops.quant_matmul import (
    matmul_int4,
    matmul_int8,
    quantize_int4,
    quantize_int8,
)


def _mats(m, k, n, seed=0):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    x = jax.random.normal(k1, (m, k), jnp.float32)
    w = jax.random.normal(k2, (k, n), jnp.float32) * 0.05
    return x, w


@pytest.mark.parametrize("m,k,n", [(8, 256, 512), (130, 512, 384)])
def test_int8_matmul_close_to_fp(m, k, n):
    x, w = _mats(m, k, n)
    w_q, s = quantize_int8(w)
    got = matmul_int8(x, w_q, s, block_m=128, block_n=256, block_k=256)
    want = x @ w
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel  # int8 + bf16-MXU rounding


def test_int8_quantize_roundtrip():
    _, w = _mats(1, 128, 256)
    w_q, s = quantize_int8(w)
    deq = w_q.astype(jnp.float32) * s
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01
    assert w_q.dtype == jnp.int8 and int(jnp.abs(w_q).max()) <= 127


@pytest.mark.parametrize("m,k,n", [(8, 256, 512), (64, 512, 256)])
def test_int4_matmul_matches_dequant_reference(m, k, n):
    x, w = _mats(m, k, n, seed=1)
    packed, s = quantize_int4(w, group_size=128)
    got = matmul_int4(
        x, packed, s, group_size=128, block_m=128, block_n=256, block_k=256
    )
    # exact reference: dequantize then matmul (the intrinsic ~10% int4
    # noise vs fp belongs to the quantizer, not the kernel)
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32) - 8
    unpacked = jnp.stack([lo, hi], axis=1).reshape(k, n).astype(jnp.float32)
    deq = (
        unpacked.reshape(k // 128, 128, n) * s[:, None, :]
    ).reshape(k, n)
    want = x @ deq
    # kernel runs the MXU in bf16 (full rate); allow bf16 rounding
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)
    # and the fp gap stays in the expected 4-bit noise band
    rel = np.linalg.norm(got - x @ w) / np.linalg.norm(x @ w)
    assert rel < 0.2, rel


def test_int4_pack_unpack_exact():
    w = (
        jnp.arange(-8, 8, dtype=jnp.float32)
        .repeat(16)
        .reshape(16, 16)
        .T
    ) / 7.0
    w = jnp.tile(w, (8, 8))  # [128, 128]
    packed, s = quantize_int4(w, group_size=128)
    lo = (packed & 0xF).astype(jnp.int32) - 8
    hi = (packed >> 4).astype(jnp.int32) - 8
    unpacked = jnp.stack([lo, hi], axis=1).reshape(128, 128)
    deq = unpacked.astype(jnp.float32).reshape(1, 128, 128) * s[:, None, :]
    np.testing.assert_allclose(
        np.asarray(deq[0]), np.asarray(w), atol=float(s.max()) / 2 + 1e-6
    )
