"""LTX2: joint audio-video blocks (a2v/v2a coupling with shared-clock
rope), t2v and i2v pipelines."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.ltx2 import (
    LTX2ImageToVideoPipeline,
    LTX2Pipeline,
)
from ht_vllm_omni_tpu.diffusion.models.ltx2 import transformer as ltx
from ht_vllm_omni_tpu.diffusion.models.ltx2.config import LTX2ArchConfig
from ht_vllm_omni_tpu.inputs import OmniPrompt


def test_av_coupling():
    cfg = LTX2ArchConfig.tiny()
    params = ltx.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    grid = (2, 2, 2)
    vid = rng.normal(size=(1, 8, cfg.in_channels)).astype(np.float32)
    aud = rng.normal(
        size=(1, 6, cfg.audio_in_channels)
    ).astype(np.float32)
    cap = rng.normal(size=(1, 4, cfg.caption_dim)).astype(np.float32)
    mask = np.ones((1, 4), np.int32)
    t = np.asarray([0.5], np.float32)
    v1, a1 = ltx.forward(
        cfg, params, *map(jnp.asarray, (vid, aud, cap, mask, t)), grid
    )
    assert v1.shape == vid.shape and a1.shape == aud.shape
    v2, a2 = ltx.forward(
        cfg, params, jnp.asarray(vid), jnp.asarray(aud + 1.0),
        jnp.asarray(cap), jnp.asarray(mask), jnp.asarray(t), grid,
    )
    # audio perturbation reaches the video through a2v attention
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
    v3, a3 = ltx.forward(
        cfg, params, jnp.asarray(vid + 1.0), jnp.asarray(aud),
        jnp.asarray(cap), jnp.asarray(mask), jnp.asarray(t), grid,
    )
    assert not np.allclose(np.asarray(a1), np.asarray(a3))


def test_t2v_pipeline_generates_video_and_audio():
    pipe = LTX2Pipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=2.0,
        seed=7,
    )
    p = OmniPrompt(
        text="waves crashing", additional_information={"num_frames": 3},
    )
    out, _ = pipe.generate_prompt(p, sp)
    assert out is not None
    assert out["video"].ndim == 4 and out["video"].shape[-1] == 3
    assert len(out["audio"]) > 0
    out2, _ = pipe.generate_prompt(p, sp)
    np.testing.assert_array_equal(out["video"], out2["video"])


def test_i2v_keeps_first_frame_conditioning():
    pipe = LTX2ImageToVideoPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=1.0,
        seed=7,
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    p = OmniPrompt(
        text="animate",
        multi_modal_data={"image": img},
        additional_information={"num_frames": 3},
    )
    state = pipe._prepare(p, sp)
    assert state["cond_frame"] is not None
    out, st = pipe.generate_prompt(p, sp)
    # the conditioning frame stays clean in the final latents
    hh_ww = state["grid"][1] * state["grid"][2]
    np.testing.assert_allclose(
        np.asarray(st["v_lat"][:, :hh_ww]),
        np.asarray(state["cond_frame"]), rtol=1e-5, atol=1e-6,
    )
    base, _ = pipe.generate_prompt(
        OmniPrompt(text="animate",
                   additional_information={"num_frames": 3}),
        sp,
    )
    assert not np.array_equal(out["video"], base["video"])


def test_registry_has_ltx2():
    from ht_vllm_omni_tpu.diffusion.registry import PIPELINE_FAMILIES

    assert "ltx2" in PIPELINE_FAMILIES and "ltx2-i2v" in PIPELINE_FAMILIES
