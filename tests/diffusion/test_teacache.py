import numpy as np

from ht_vllm_omni_tpu.diffusion.cache.teacache import TeaCacheConfig
from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
)
from ht_vllm_omni_tpu.diffusion.models.pipeline_flow import FlowPipeline


def _arch():
    return DiTArchConfig(
        hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )


def _sp():
    return DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=8, guidance_scale=3.0,
        seed=4,
    )


def test_teacache_skips_steps_and_stays_close():
    base = FlowPipeline(_arch(), seed=0)
    exact, state = base.generate([5, 6], _sp())
    assert state.get("skipped_steps", 0) == 0

    cached = FlowPipeline(
        _arch(), seed=0,
        teacache=TeaCacheConfig(enabled=True, threshold=0.35),
    )
    approx, state = cached.generate([5, 6], _sp())
    assert state["skipped_steps"] > 0
    # cached result approximates the exact one
    diff = np.abs(
        approx.astype(np.float32) - exact.astype(np.float32)
    ).mean()
    assert diff < 40.0, diff  # uint8 scale; gross divergence would be ~80+


def test_teacache_zero_threshold_is_exact():
    base = FlowPipeline(_arch(), seed=0)
    exact, _ = base.generate([9], _sp())
    cached = FlowPipeline(
        _arch(), seed=0, teacache=TeaCacheConfig(enabled=True, threshold=0.0)
    )
    same, state = cached.generate([9], _sp())
    assert state["skipped_steps"] == 0
    np.testing.assert_array_equal(same, exact)
