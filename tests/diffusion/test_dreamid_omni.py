"""DreamID-Omni: fused audio-video trunks — bidirectional fusion
attention semantics and joint generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.dreamid_omni import (
    DreamIDOmniPipeline,
    fusion,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def test_fusion_couples_the_modalities():
    """Perturbing the audio latents must change the VIDEO prediction
    (and vice versa) — the injected k/v_fusion paths carry it."""
    pipe = DreamIDOmniPipeline(seed=0)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(1, pipe.vcfg.in_channels, 2, 4, 4)).astype(
        np.float32
    )
    a = rng.normal(size=(1, pipe.acfg.in_channels, 6, 1, 1)).astype(
        np.float32
    )
    txt = rng.normal(size=(1, 8, pipe.vcfg.text_dim)).astype(np.float32)
    lens = np.asarray([8], np.int32)
    t = np.asarray([500.0], np.float32)

    args = lambda vv, aa: (
        pipe.params, jnp.asarray(vv), jnp.asarray(aa), jnp.asarray(t),
        jnp.asarray(txt), jnp.asarray(lens),
        jnp.asarray(txt), jnp.asarray(lens),
    )
    v1, a1 = fusion.forward(pipe.vcfg, pipe.acfg, *args(v, a))
    v2, a2 = fusion.forward(pipe.vcfg, pipe.acfg, *args(v, a + 1.0))
    assert v1.shape == v.shape and a1.shape == a.shape
    assert not np.allclose(np.asarray(v1), np.asarray(v2))
    v3, a3 = fusion.forward(pipe.vcfg, pipe.acfg, *args(v + 1.0, a))
    assert not np.allclose(np.asarray(a1), np.asarray(a3))

    # zeroing the video-side fusion projections decouples video from
    # audio perturbations
    p2 = dict(pipe.params)
    p2["video_fusion"] = dict(pipe.params["video_fusion"])
    p2["video_fusion"]["vf_w"] = (
        pipe.params["video_fusion"]["vf_w"] * 0.0
    )
    v4, _ = fusion.forward(
        pipe.vcfg, pipe.acfg, p2, *args(v, a)[1:]
    )
    v5, _ = fusion.forward(
        pipe.vcfg, pipe.acfg, p2, *args(v, a + 1.0)[1:]
    )
    np.testing.assert_allclose(
        np.asarray(v4), np.asarray(v5), rtol=2e-4, atol=2e-4
    )


def test_pipeline_generates_video_and_audio():
    pipe = DreamIDOmniPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=2.0,
        seed=7,
    )
    p = OmniPrompt(
        text="a person speaking",
        additional_information={"num_frames": 3},
    )
    out, _ = pipe.generate_prompt(p, sp)
    assert out is not None
    assert out["video"].ndim == 4 and out["video"].shape[-1] == 3
    assert len(out["audio"]) > 0
    assert np.isfinite(np.asarray(out["audio"], np.float32)).all()
    out2, _ = pipe.generate_prompt(p, sp)
    np.testing.assert_array_equal(out["video"], out2["video"])


def test_registry_has_dreamid():
    from ht_vllm_omni_tpu.diffusion.registry import PIPELINE_FAMILIES

    assert "dreamid-omni" in PIPELINE_FAMILIES
