"""Helios: multi-term memory conditioning, guidance cross-attention
locality, chunked pipeline generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.helios import (
    HeliosPipeline,
    transformer as helios,
)
from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def test_history_conditions_current_chunk():
    cfg = WanVideoArchConfig.tiny()
    params = helios.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    cur = rng.normal(size=(1, cfg.in_channels, 2, 4, 4)).astype(np.float32)
    hist = rng.normal(size=(1, cfg.in_channels, 2, 4, 4)).astype(np.float32)
    txt = rng.normal(size=(1, 6, cfg.text_dim)).astype(np.float32)
    lens = np.asarray([6], np.int32)
    t = np.asarray([500.0], np.float32)

    out_nohist = helios.forward(
        cfg, params, jnp.asarray(cur), jnp.asarray(t), jnp.asarray(txt),
        jnp.asarray(lens), None, chunk_frame_offset=2,
    )
    assert out_nohist.shape == cur.shape
    out_h1 = helios.forward(
        cfg, params, jnp.asarray(cur), jnp.asarray(t), jnp.asarray(txt),
        jnp.asarray(lens),
        {"short": jnp.asarray(hist)},
        history_offsets=(("short", 0),),
        chunk_frame_offset=2,
    )
    out_h2 = helios.forward(
        cfg, params, jnp.asarray(cur), jnp.asarray(t), jnp.asarray(txt),
        jnp.asarray(lens),
        {"short": jnp.asarray(hist + 1.0)},
        history_offsets=(("short", 0),),
        chunk_frame_offset=2,
    )
    assert not np.allclose(np.asarray(out_h1), np.asarray(out_h2))
    assert not np.allclose(np.asarray(out_nohist), np.asarray(out_h1))


def test_memory_strides_downsample_history_tokens():
    cfg = WanVideoArchConfig.tiny()
    params = helios.init_params(cfg, jax.random.PRNGKey(0))
    lat = jnp.ones((1, cfg.in_channels, 4, 8, 8))
    toks, grid = helios._patch_tokens(
        lat, helios.MEMORY_STRIDES["long"],
        params["mem_long_w"], params["mem_long_b"],
    )
    assert grid == (1, 1, 1) and toks.shape[1] == 1
    toks, grid = helios._patch_tokens(
        lat, helios.MEMORY_STRIDES["short"],
        params["mem_short_w"], params["mem_short_b"],
    )
    assert grid == (4, 4, 4) and toks.shape[1] == 64


def test_chunked_pipeline_generates_video():
    pipe = HeliosPipeline(seed=0, chunk_frames=2)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=2.0,
        seed=7,
    )
    p = OmniPrompt(
        text="a drifting cloud",
        additional_information={"num_chunks": 2},
    )
    out, st = pipe.generate_prompt(p, sp)
    assert out is None and st["chunk_idx"] == 1  # first chunk queued
    out, st = pipe.generate_prompt(p, sp, stepwise_state=st)
    assert out is not None and out.ndim == 4 and out.shape[-1] == 3
    # 2 chunks x 2 latent frames x temporal_ratio upsample
    assert out.shape[0] >= 4


def test_registry_has_helios():
    from ht_vllm_omni_tpu.diffusion.registry import PIPELINE_FAMILIES

    assert "helios" in PIPELINE_FAMILIES
    assert "helios-pyramid" in PIPELINE_FAMILIES
