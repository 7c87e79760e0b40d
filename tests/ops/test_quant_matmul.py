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
    got = matmul_int8(x, w_q, s)
    want = x @ w
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel  # int8 + bf16-MXU rounding
    # the hand-tiled Pallas variant stays numerically equivalent
    from ht_vllm_omni_tpu.ops.quant_matmul import matmul_int8_pallas

    got_pl = matmul_int8_pallas(
        x, w_q, s, block_m=128, block_n=256, block_k=256
    )
    rel_pl = np.linalg.norm(got_pl - want) / np.linalg.norm(want)
    assert rel_pl < 0.02, rel_pl


def test_int8_quantize_roundtrip():
    _, w = _mats(1, 128, 256)
    w_q, s = quantize_int8(w)
    deq = w_q.astype(jnp.float32) * s
    rel = np.abs(deq - w).max() / np.abs(w).max()
    assert rel < 0.01
    assert w_q.dtype == jnp.int8 and int(jnp.abs(w_q).max()) <= 127


def _unpack_halfsplit(packed, k, n, group_size, signed=True):
    """Undo the per-group half-split packing (quant_matmul.quantize_*):
    byte row r of group g holds rows (r, r + gs/2)."""
    lo = (packed & 0xF).astype(jnp.int32)
    hi = ((packed >> 4) & 0xF).astype(jnp.int32)
    if signed:
        lo, hi = lo - 8, hi - 8
    half = group_size // 2
    lo = lo.reshape(k // group_size, half, n)
    hi = hi.reshape(k // group_size, half, n)
    return jnp.concatenate([lo, hi], axis=1).reshape(k, n).astype(
        jnp.float32
    )


@pytest.mark.parametrize("m,k,n", [(8, 256, 512), (64, 512, 256)])
def test_int4_matmul_matches_dequant_reference(m, k, n):
    x, w = _mats(m, k, n, seed=1)
    packed, s = quantize_int4(w, group_size=128)
    got = matmul_int4(
        x, packed, s, group_size=128, block_m=128, block_n=256, block_k=256
    )
    # exact reference: dequantize then matmul (the intrinsic ~10% int4
    # noise vs fp belongs to the quantizer, not the kernel)
    unpacked = _unpack_halfsplit(packed, k, n, 128)
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
    unpacked = _unpack_halfsplit(packed, 128, 128, 128)
    deq = unpacked.reshape(1, 128, 128) * s[:, None, :]
    np.testing.assert_allclose(
        np.asarray(deq[0]), np.asarray(w), atol=float(s.max()) / 2 + 1e-6
    )


# ------------------------------------------------------------- fp8 + awq
def test_fp8_matmul_close_to_fp():
    from ht_vllm_omni_tpu.ops.quant_matmul import matmul_fp8, quantize_fp8

    x, w = _mats(16, 256, 512)
    w8, s = quantize_fp8(w)
    assert w8.dtype == jnp.float8_e4m3fn
    got = matmul_fp8(x, w8, s, out_dtype=jnp.float32)
    want = x @ w
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    # e4m3 has a 3-bit mantissa: noisier than int8's per-channel 1/127
    # grid but far tighter than int4
    assert rel < 0.04, rel


def test_awq_beats_symmetric_int4_on_asymmetric_weights():
    from ht_vllm_omni_tpu.ops.quant_matmul import (
        matmul_int4_zp,
        quantize_awq_int4,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    x = jax.random.normal(k1, (16, 256), jnp.float32)
    # strongly asymmetric weights: symmetric grids waste half their range
    w = jnp.abs(jax.random.normal(k2, (256, 256), jnp.float32)) + 0.5
    want = x @ w

    packed, s, z = quantize_awq_int4(w, group_size=128)
    got = matmul_int4_zp(
        x, packed, s, z, group_size=128,
        block_m=128, block_n=256, block_k=256,
    )
    rel_awq = np.linalg.norm(got - want) / np.linalg.norm(want)

    p4, s4 = quantize_int4(w, group_size=128)
    got4 = matmul_int4(
        x, p4, s4, group_size=128, block_m=128, block_n=256, block_k=256
    )
    rel_sym = np.linalg.norm(got4 - want) / np.linalg.norm(want)
    assert rel_awq < rel_sym * 0.7, (rel_awq, rel_sym)
    assert rel_awq < 0.07, rel_awq


def test_awq_kernel_matches_dequant_reference():
    from ht_vllm_omni_tpu.ops.quant_matmul import (
        matmul_int4_zp,
        quantize_awq_int4,
    )

    x, w = _mats(8, 256, 256, seed=2)
    packed, s, z = quantize_awq_int4(w, group_size=128)
    got = matmul_int4_zp(
        x, packed, s, z, group_size=128,
        block_m=128, block_n=256, block_k=256,
    )
    q = _unpack_halfsplit(packed, 256, 256, 128, signed=False)
    deq = (
        (q.reshape(2, 128, 256) - z[:, None, :]) * s[:, None, :]
    ).reshape(256, 256)
    want = x @ deq
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


def test_awq_checkpoint_unpack_order():
    from ht_vllm_omni_tpu.ops.quant_matmul import (
        AWQ_PACK_ORDER,
        unpack_awq_checkpoint,
    )

    rng = np.random.default_rng(0)
    k, n, g = 16, 16, 8
    wq = rng.integers(0, 16, size=(k, n), dtype=np.uint8)
    zq = rng.integers(0, 16, size=(k // g, n), dtype=np.uint8)
    scales = rng.random((k // g, n), dtype=np.float32)

    def pack(arr):  # logical uint4 [..., N] -> AWQ int32 [..., N/8]
        out = np.zeros(arr.shape[:-1] + (arr.shape[-1] // 8,), np.uint32)
        for i, o in enumerate(AWQ_PACK_ORDER):
            out |= arr[..., o::8].astype(np.uint32) << (4 * i)
        return out.astype(np.int32)

    packed, s_out, z_out = unpack_awq_checkpoint(
        pack(wq), pack(zq), scales
    )
    # half-split layout: byte row r of group g = rows (r, r + g/2)
    wg = wq.reshape(k // g, g, n)
    np.testing.assert_array_equal(
        packed & 0xF, wg[:, : g // 2].reshape(k // 2, n)
    )
    np.testing.assert_array_equal(
        packed >> 4, wg[:, g // 2 :].reshape(k // 2, n)
    )
    np.testing.assert_array_equal(z_out, zq.astype(np.float32))
    np.testing.assert_array_equal(s_out, scales)


def test_fp8_kv_rows_roundtrip():
    from ht_vllm_omni_tpu.ops.kv_cache_update import quantize_rows

    rows = jax.random.normal(
        jax.random.PRNGKey(0), (2, 8, 64), jnp.float32
    ) * 0.3
    q = quantize_rows(rows, 32, 0.01, 0.01, dtype=jnp.float8_e4m3fn)
    assert q.dtype == jnp.float8_e4m3fn
    deq = q.astype(jnp.float32) * 0.01
    rel = np.linalg.norm(deq - rows) / np.linalg.norm(rows)
    assert rel < 0.05, rel


def test_fused_mlp_int4_stacked_matches_split():
    """Whole-SwiGLU fused kernel (ops/quant_matmul.fused_mlp_int4_stacked,
    one launch, activation stays in VMEM) must match the split stacked
    matmuls bit-for-bit up to f32 accumulation order."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ht_vllm_omni_tpu.ops.quant_matmul import (
        fused_mlp_int4_stacked,
        matmul_int4_stacked,
        quantize_int4,
    )

    L, K, I, M = 2, 256, 1280, 8
    rng = np.random.default_rng(3)
    wgu = jnp.asarray(
        rng.standard_normal((L, K, 2 * I)).astype(np.float32) * 0.05
    )
    wd = jnp.asarray(
        rng.standard_normal((L, I, K)).astype(np.float32) * 0.05
    )
    qgu, sgu = jax.vmap(lambda m: quantize_int4(m, 128))(wgu)
    qd, sd = jax.vmap(lambda m: quantize_int4(m, 128))(wd)
    x = jnp.asarray(rng.standard_normal((M, K)).astype(np.float32))
    for layer in (0, 1):
        out = fused_mlp_int4_stacked(
            x, qgu, sgu, qd, sd, layer, out_dtype=jnp.float32
        )
        assert out is not None
        gu = matmul_int4_stacked(x, qgu, sgu, layer, out_dtype=jnp.float32)
        g, u = jnp.split(gu, 2, axis=-1)
        act = (jax.nn.silu(g) * u).astype(x.dtype)
        ref = matmul_int4_stacked(act, qd, sd, layer, out_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
        )
