"""Grouped-GEMM top-k MoE: exact-match vs a dense all-experts reference.

The production path (models/qwen2._mlp) routes T*k assignments through
lax.ragged_dot grouped matmuls; the reference here evaluates every
expert densely and masks by gate — identical math, different summation
order, so fp32 allclose.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.models import qwen2


def _dense_reference(cfg, lp, x):
    logits = jnp.dot(x, lp["router"], preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    top_w, top_i = jax.lax.top_k(probs, cfg.num_experts_per_tok)
    if cfg.norm_topk_prob:
        top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    acc = jnp.zeros((x.shape[0], x.shape[1]), jnp.float32)
    for e in range(cfg.num_experts):
        g = jnp.dot(x, lp["egate"][e], preferred_element_type=jnp.float32)
        u = jnp.dot(x, lp["eup"][e], preferred_element_type=jnp.float32)
        a = (jax.nn.silu(g) * u).astype(x.dtype)
        o = jnp.dot(a, lp["edown"][e], preferred_element_type=jnp.float32)
        gate = jnp.sum(jnp.where(top_i == e, top_w, 0.0), axis=-1)
        acc = acc + o * gate[:, None]
    return acc


def _make(cfg, seed=0):
    params = qwen2.init_params(cfg, jax.random.PRNGKey(seed))
    lp = {
        k: v[0]
        for k, v in params.items()
        if k in ("router", "egate", "eup", "edown")
    }
    return lp


def test_grouped_moe_matches_dense_sweep():
    cfg = ModelArchConfig(
        hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, intermediate_size=64, vocab_size=128,
        num_experts=8, num_experts_per_tok=2, moe_intermediate_size=16,
        dtype="float32",
    )
    lp = _make(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (13, 32), jnp.float32)
    got = qwen2._mlp(cfg, lp, x)
    ref = _dense_reference(cfg, lp, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )


def test_grouped_moe_unnormalised_topk_and_single_token():
    cfg = ModelArchConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        num_key_value_heads=2, intermediate_size=32, vocab_size=128,
        num_experts=4, num_experts_per_tok=3, moe_intermediate_size=8,
        norm_topk_prob=False, dtype="float32",
    )
    lp = _make(cfg, seed=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16), jnp.float32)
    got = qwen2._mlp(cfg, lp, x)
    ref = _dense_reference(cfg, lp, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
    )
