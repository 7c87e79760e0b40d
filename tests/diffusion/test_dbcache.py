"""DBCache (cache-dit) block-level caching for the DiT pipelines."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.cache.dbcache import (
    DBCacheConfig,
    init_state,
)
from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models import dit
from ht_vllm_omni_tpu.diffusion.models.pipeline_flow import FlowPipeline


def _arch(layers=4):
    return DiTArchConfig(
        hidden_size=64, num_layers=layers, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )


def _sp(steps=8):
    return DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=steps,
        guidance_scale=3.0, seed=4,
    )


def test_forward_cached_never_cache_matches_forward():
    """threshold < 0 forces every step to compute: forward_cached must
    reproduce forward() bit-for-bit through the Fn/mid/Bn partition."""
    cfg = _arch(layers=4)
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.normal(
        jax.random.PRNGKey(1),
        (64, cfg.in_channels * cfg.patch_size**2), jnp.float32,
    )
    cond = jax.random.normal(
        jax.random.PRNGKey(2), (8, cfg.cond_dim), jnp.float32
    )
    t = jnp.float32(500.0)
    want = dit.forward(cfg, params, tokens, cond, t)
    for fn_b, bn_b in [(1, 0), (2, 1), (1, 2)]:
        db = DBCacheConfig(
            enabled=True, Fn_compute_blocks=fn_b, Bn_compute_blocks=bn_b,
            residual_diff_threshold=-1.0, max_warmup_steps=0,
        )
        st = init_state((8 + 64, cfg.hidden_size))
        got, _, cached = dit.forward_cached(
            cfg, params, tokens, cond, t, st, db, jnp.int32(5)
        )
        assert not bool(cached)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_dbcache_skips_and_stays_close():
    # random toy weights drift ~0.5-0.8 rel per step (trained DiTs sit
    # far lower, hence the reference's 0.24 default); the threshold here
    # is tuned to exercise the cache path on the toy
    base = FlowPipeline(_arch(), seed=0)
    exact, state = base.generate([5, 6], _sp(steps=16))
    assert state.get("skipped_steps", 0) == 0

    cached = FlowPipeline(
        _arch(), seed=0,
        dbcache=DBCacheConfig(
            enabled=True, Fn_compute_blocks=1, max_warmup_steps=2,
            residual_diff_threshold=0.8, max_continuous_cached_steps=1,
        ),
    )
    approx, st = cached.generate([5, 6], _sp(steps=16))
    assert st["skipped_steps"] > 0
    diff = np.abs(
        approx.astype(np.float32) - exact.astype(np.float32)
    ).mean()
    assert diff < 60.0, diff


def test_dbcache_warmup_and_consecutive_cap():
    """No caching during warmup; consecutive cached steps never exceed
    the cap even with an always-pass threshold."""
    cfg = _arch(layers=3)
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.normal(
        jax.random.PRNGKey(1),
        (16, cfg.in_channels * cfg.patch_size**2), jnp.float32,
    )
    cond = jnp.zeros((4, cfg.cond_dim), jnp.float32)
    db = DBCacheConfig(
        enabled=True, Fn_compute_blocks=1, max_warmup_steps=3,
        residual_diff_threshold=1e9, max_continuous_cached_steps=2,
    )
    st = init_state((4 + 16, cfg.hidden_size))
    hits = []
    for i in range(10):
        _, st, cached = dit.forward_cached(
            cfg, params, tokens, cond, jnp.float32(100.0 + i), st, db,
            jnp.int32(i),
        )
        hits.append(bool(cached))
    assert hits[:3] == [False, False, False]  # warmup
    assert any(hits[3:])
    # never more than 2 consecutive cache hits
    run = 0
    for hentry in hits:
        run = run + 1 if hentry else 0
        assert run <= 2
