"""HunyuanVideo 1.5: transformer invariants (rope video-only, cond-type
tags, key-mask equivalence), t2v/i2v pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.hunyuan_video import (
    HunyuanVideoI2VPipeline,
    HunyuanVideoPipeline,
)
from ht_vllm_omni_tpu.diffusion.models.hunyuan_video import transformer
from ht_vllm_omni_tpu.diffusion.models.hunyuan_video.config import (
    HunyuanVideoArchConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _inputs(cfg, rng, s_t=5, s_b=3, f=2, h=4, w=4):
    lat = rng.normal(size=(1, cfg.in_channels, f, h, w)).astype(np.float32)
    txt = rng.normal(size=(1, s_t, cfg.text_embed_dim)).astype(np.float32)
    tm = np.ones((1, s_t), np.int32)
    t2 = rng.normal(size=(1, s_b, cfg.text_embed_2_dim)).astype(np.float32)
    t2m = np.ones((1, s_b), np.int32)
    ie = np.zeros((1, 2, cfg.image_embed_dim), np.float32)
    t = np.asarray([500.0], np.float32)
    return lat, txt, tm, t2, t2m, ie, t


def test_forward_shapes_and_mask_semantics():
    cfg = HunyuanVideoArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    lat, txt, tm, t2, t2m, ie, t = _inputs(cfg, rng)
    out = transformer.forward(
        cfg, params, *map(jnp.asarray, (lat, txt, tm, t2, t2m, ie, t))
    )
    assert out.shape == (1, cfg.out_channels, 2, 4, 4)
    assert np.isfinite(np.asarray(out)).all()

    # masked-out text rows must not influence the output: grow the text
    # with garbage rows under a zero mask
    txt_g = np.concatenate(
        [txt, 1e3 * rng.normal(size=(1, 3, cfg.text_embed_dim))], axis=1
    ).astype(np.float32)
    tm_g = np.concatenate([tm, np.zeros((1, 3), np.int32)], axis=1)
    out2 = transformer.forward(
        cfg, params,
        *map(jnp.asarray, (lat, txt_g, tm_g, t2, t2m, ie, t)),
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out2), rtol=2e-4, atol=2e-4
    )


def test_zero_image_embeds_are_inert():
    """t2v: all-zero image embeds must be masked out of attention, so
    their projection weights cannot leak into the output."""
    cfg = HunyuanVideoArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    lat, txt, tm, t2, t2m, ie, t = _inputs(cfg, rng)
    out = transformer.forward(
        cfg, params, *map(jnp.asarray, (lat, txt, tm, t2, t2m, ie, t))
    )
    p2 = dict(params)
    p2["i_w1"] = params["i_w1"] * 7.0  # only touches image projection
    out2 = transformer.forward(
        cfg, p2, *map(jnp.asarray, (lat, txt, tm, t2, t2m, ie, t))
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_t2v_pipeline_generates_video():
    pipe = HunyuanVideoPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=3.0,
        seed=7,
    )
    p = OmniPrompt(
        text="a fish swimming",
        additional_information={"num_frames": 3},
    )
    vid, state = pipe.generate_prompt(p, sp)
    assert vid is not None and vid.ndim == 4 and vid.shape[-1] == 3
    assert vid.dtype == np.uint8
    vid2, _ = pipe.generate_prompt(p, sp)
    np.testing.assert_array_equal(vid, vid2)


def test_i2v_pipeline_conditions_on_image():
    pipe = HunyuanVideoI2VPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=1.0,
        seed=7,
    )
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    p = OmniPrompt(
        text="animate this",
        multi_modal_data={"image": img},
        additional_information={"num_frames": 3},
    )
    state = pipe._prepare(p, sp)
    assert float(jnp.sum(state["mask"])) > 0
    vid, _ = pipe.generate_prompt(p, sp)
    base, _ = pipe.generate_prompt(
        OmniPrompt(
            text="animate this",
            additional_information={"num_frames": 3},
        ),
        sp,
    )
    assert not np.array_equal(vid, base)


def test_registry_has_hunyuan_video():
    from ht_vllm_omni_tpu.diffusion.registry import PIPELINE_FAMILIES

    assert "hunyuan-video-1.5" in PIPELINE_FAMILIES
    assert "hunyuan-video-1.5-i2v" in PIPELINE_FAMILIES
