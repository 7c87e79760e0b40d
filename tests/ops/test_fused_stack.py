"""Parity of the whole-stack fused decode kernel vs the scanned
decode_direct path (which is itself HF-golden-pinned in tests/models)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.models.layers import rope_cos_sin
from ht_vllm_omni_tpu.ops.fused_stack import (
    build_stack_weights,
    fused_decode_stack,
)

PAGE = 16
NUM_PAGES = 32


def _cfg(**kw):
    base = dict(
        model_type="qwen2",
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=32,
        dtype="bfloat16",
        attention_bias=True,
        qk_norm=False,
        tie_word_embeddings=True,
    )
    base.update(kw)
    return ModelArchConfig(**base)


def _setup(cfg, s=4, seed=0):
    key = jax.random.PRNGKey(seed)
    params = qwen2.fuse_params(qwen2.init_params(cfg, key))
    f = cfg.num_key_value_heads * cfg.head_dim
    nl = cfg.num_hidden_layers
    kv = jax.random.normal(
        jax.random.PRNGKey(seed + 1),
        (nl, NUM_PAGES * PAGE, 2 * f),
        jnp.float32,
    ).astype(jnp.bfloat16)
    # per-slot contiguous-ish block tables (distinct pages)
    max_p = 4
    bt = (
        jnp.arange(s * max_p, dtype=jnp.int32).reshape(s, max_p) + 2
    ) % NUM_PAGES
    positions = jnp.array([0, 5, PAGE, 3 * PAGE + 2][:s], jnp.int32)
    active = jnp.array([True] * s)
    x = jax.random.normal(
        jax.random.PRNGKey(seed + 2), (s, cfg.hidden_size), jnp.float32
    ).astype(jnp.bfloat16)
    return params, kv, bt, positions, active, x


def _assert_kv_parity(out_kv, ref_kv, kv0, positions, bt, active):
    """Written rows match within bf16 tolerance (hidden-state drift from
    differing flash accumulation order carries ~1 ulp into later layers'
    K/V projections); every untouched row is bit-exact vs the input."""
    out = np.asarray(out_kv, np.float32)
    ref = np.asarray(ref_kv, np.float32)
    orig = np.asarray(kv0, np.float32)
    pos = np.asarray(positions)
    btn = np.asarray(bt)
    act = np.asarray(active)
    page = np.take_along_axis(
        btn, np.clip(pos // PAGE, 0, btn.shape[1] - 1)[:, None], axis=1
    )[:, 0]
    rows = (page * PAGE + pos % PAGE)[act]
    np.testing.assert_allclose(
        out[:, rows], ref[:, rows], atol=3e-2, rtol=3e-2
    )
    untouched = np.setdiff1d(np.arange(out.shape[1]), rows)
    np.testing.assert_array_equal(out[:, untouched], orig[:, untouched])
    np.testing.assert_array_equal(ref[:, untouched], orig[:, untouched])


def _run_both(cfg, params, kv, bt, positions, active, x):
    ref_h, ref_kv = qwen2.decode_direct(
        cfg, params, kv, x, positions, active, bt, page_size=PAGE
    )

    kw = build_stack_weights(cfg, params)
    assert kw is not None
    page_col = jnp.clip(positions // PAGE, 0, bt.shape[1] - 1)
    page = jnp.take_along_axis(bt, page_col[:, None], axis=1)[:, 0]
    rows_w = jnp.where(active, page * PAGE + positions % PAGE, -1)
    past = jnp.where(active, positions, 0)
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)
    out_h, out_kv = fused_decode_stack(
        kw, kv, x, cos, sin, rows_w, past, bt,
        page_size=PAGE,
        eps=cfg.rms_norm_eps,
        sm_scale=cfg.head_dim**-0.5,
        qh=cfg.num_attention_heads,
        kvh=cfg.num_key_value_heads,
        d=cfg.head_dim,
        inter=cfg.intermediate_size,
        has_bias="bqkv" in kw,
        has_qknorm="q_norm" in kw,
    )
    return (ref_h, ref_kv), (out_h, out_kv)


@pytest.mark.parametrize("qknorm", [False, True])
def test_fused_stack_matches_decode_direct(qknorm):
    cfg = _cfg(qk_norm=qknorm, attention_bias=not qknorm)
    params, kv, bt, positions, active, x = _setup(cfg)
    kv0 = kv.copy()
    (ref_h, ref_kv), (out_h, out_kv) = _run_both(
        cfg, params, kv, bt, positions, active, x
    )
    np.testing.assert_allclose(
        np.asarray(out_h, np.float32),
        np.asarray(ref_h, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    _assert_kv_parity(out_kv, ref_kv, kv0, positions, bt, active)


def test_fused_stack_inactive_slots():
    cfg = _cfg()
    params, kv, bt, positions, active, x = _setup(cfg)
    active = jnp.array([True, False, True, False])
    kv0 = kv.copy()
    (ref_h, ref_kv), (out_h, out_kv) = _run_both(
        cfg, params, kv, bt, positions, active, x
    )
    # inactive slots write nothing
    _assert_kv_parity(out_kv, ref_kv, kv0, positions, bt, active)
    act = np.asarray(active)
    np.testing.assert_allclose(
        np.asarray(out_h, np.float32)[act],
        np.asarray(ref_h, np.float32)[act],
        atol=3e-2, rtol=3e-2,
    )


def test_fused_stack_multi_qkv_tiles():
    # wider head dims force multi-tile qkv / gu / down schedules
    cfg = _cfg(
        hidden_size=256,
        intermediate_size=2816,  # not a multiple of the tile split
        num_attention_heads=8,
        num_key_value_heads=4,
        head_dim=32,
    )
    params, kv, bt, positions, active, x = _setup(cfg)
    kv0 = kv.copy()
    (ref_h, ref_kv), (out_h, out_kv) = _run_both(
        cfg, params, kv, bt, positions, active, x
    )
    np.testing.assert_allclose(
        np.asarray(out_h, np.float32),
        np.asarray(ref_h, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    _assert_kv_parity(out_kv, ref_kv, kv0, positions, bt, active)


def test_fused_stack_int8():
    from ht_vllm_omni_tpu.quantization import quantize_params

    cfg = _cfg()
    params, kv, bt, positions, active, x = _setup(cfg)
    qparams = quantize_params(params, "int8")
    kv0 = kv.copy()

    ref_h, ref_kv = qwen2.decode_direct(
        cfg, qparams, kv, x, positions, active, bt, page_size=PAGE
    )
    kw = build_stack_weights(cfg, qparams)
    assert kw is not None and kw["int8"]
    page_col = jnp.clip(positions // PAGE, 0, bt.shape[1] - 1)
    page = jnp.take_along_axis(bt, page_col[:, None], axis=1)[:, 0]
    rows_w = jnp.where(active, page * PAGE + positions % PAGE, -1)
    cos, sin = rope_cos_sin(positions, cfg.rotary_dim, cfg.rope_theta)
    out_h, out_kv = fused_decode_stack(
        kw, kv, x, cos, sin, rows_w, positions, bt,
        page_size=PAGE,
        eps=cfg.rms_norm_eps,
        sm_scale=cfg.head_dim**-0.5,
        qh=cfg.num_attention_heads,
        kvh=cfg.num_key_value_heads,
        d=cfg.head_dim,
        inter=cfg.intermediate_size,
        has_bias="bqkv" in kw,
        has_qknorm="q_norm" in kw,
        int8=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_h, np.float32),
        np.asarray(ref_h, np.float32),
        atol=3e-2, rtol=3e-2,
    )
    _assert_kv_parity(out_kv, ref_kv, kv0, positions, bt, active)


def test_build_stack_weights_gates():
    cfg = _cfg()
    params = qwen2.fuse_params(qwen2.init_params(cfg, jax.random.PRNGKey(0)))
    assert build_stack_weights(cfg, params) is not None
    assert build_stack_weights(cfg, {**params, "lora_scale": 1.0}) is None
    assert (
        build_stack_weights(cfg, {**params, "router": params["ln1"]}) is None
    )
