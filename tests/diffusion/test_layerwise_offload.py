"""Layerwise CPU-offload with prefetch (reference layerwise_backend.py)."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models import dit
from ht_vllm_omni_tpu.diffusion.models.pipeline_flow import FlowPipeline
from ht_vllm_omni_tpu.diffusion.offloader import LayerwiseOffloadRunner


def _arch():
    return DiTArchConfig(
        hidden_size=64, num_layers=3, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )


def test_offload_forward_matches_scan_forward():
    cfg = _arch()
    params = dit.init_params(cfg, jax.random.PRNGKey(0))
    tokens = jax.random.normal(
        jax.random.PRNGKey(1),
        (16, cfg.in_channels * cfg.patch_size**2), jnp.float32,
    )
    cond = jax.random.normal(
        jax.random.PRNGKey(2), (4, cfg.cond_dim), jnp.float32
    )
    t = jnp.float32(321.0)
    want = dit.forward(cfg, params, tokens, cond, t)
    runner = LayerwiseOffloadRunner(cfg, params)
    # block weights live on host as numpy
    assert all(
        isinstance(v, np.ndarray)
        for blk in runner.host_blocks for v in blk.values()
    )
    got = runner.forward(tokens, cond, t)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5
    )


def test_offload_pipeline_matches_fused():
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=4, guidance_scale=3.0,
        seed=4,
    )
    base, _ = FlowPipeline(_arch(), seed=0).generate([5, 6], sp)
    off, _ = FlowPipeline(_arch(), seed=0, offload="layerwise").generate(
        [5, 6], sp
    )
    np.testing.assert_allclose(
        base.astype(np.float32), off.astype(np.float32), atol=1.0
    )
