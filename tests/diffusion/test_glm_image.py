"""GLM-Image: prior-token conditioning semantics, CFG prior-drop,
pipeline generation, and the 2-stage AR -> DiT pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.glm_image import (
    GlmImagePipeline,
    transformer,
)
from ht_vllm_omni_tpu.diffusion.models.glm_image.config import (
    GlmImageArchConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _inputs(cfg, rng, hh=8, ww=8, s_t=5):
    ps = cfg.patch_size
    lat = rng.normal(size=(1, cfg.in_channels, hh, ww)).astype(np.float32)
    txt = rng.normal(size=(1, s_t, cfg.text_embed_dim)).astype(np.float32)
    prior = rng.integers(
        0, cfg.prior_vq_quantizer_codebook_size,
        size=(1, (hh // ps) * (ww // ps)),
    )
    t = np.asarray([400.0], np.float32)
    size = np.asarray([[64.0, 64.0]], np.float32)
    crop = np.zeros((1, 2), np.float32)
    return lat, txt, prior, t, size, crop


def test_prior_tokens_condition_the_output():
    cfg = GlmImageArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    lat, txt, prior, t, size, crop = _inputs(cfg, rng)
    no_drop = jnp.asarray([False])
    out = transformer.forward(
        cfg, params, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(prior), no_drop, jnp.asarray(t),
        jnp.asarray(size), jnp.asarray(crop),
    )
    assert out.shape == lat.shape
    prior2 = (prior + 7) % cfg.prior_vq_quantizer_codebook_size
    out2 = transformer.forward(
        cfg, params, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(prior2), no_drop, jnp.asarray(t),
        jnp.asarray(size), jnp.asarray(crop),
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    # dropping the prior (CFG uncond branch) erases its influence
    drop = jnp.asarray([True])
    d1 = transformer.forward(
        cfg, params, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(prior), drop, jnp.asarray(t),
        jnp.asarray(size), jnp.asarray(crop),
    )
    d2 = transformer.forward(
        cfg, params, jnp.asarray(lat), jnp.asarray(txt),
        jnp.asarray(prior2), drop, jnp.asarray(t),
        jnp.asarray(size), jnp.asarray(crop),
    )
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_pipeline_generates_with_prior():
    pipe = GlmImagePipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=2, guidance_scale=3.0,
        seed=7,
    )
    rng = np.random.default_rng(0)
    n_patches = (32 // pipe.vae_cfg.spatial_ratio // 2) ** 2
    prior = rng.integers(
        0, pipe.arch.prior_vq_quantizer_codebook_size, size=n_patches
    )
    p = OmniPrompt(
        text="a cat", additional_information={"prior_tokens": prior}
    )
    img, _ = pipe.generate_prompt(p, sp)
    assert img is not None and img.shape == (32, 32, 3)
    # different priors -> different images
    p2 = OmniPrompt(
        text="a cat",
        additional_information={"prior_tokens": (prior + 3) % 64},
    )
    img2, _ = pipe.generate_prompt(p2, sp)
    assert not np.array_equal(img, img2)


def test_two_stage_pipeline_e2e():
    from ht_vllm_omni_tpu.config.stage_config import (
        builtin_pipeline_path,
        load_pipeline_config,
    )
    from ht_vllm_omni_tpu.engine.stage_factory import build_stages
    from ht_vllm_omni_tpu.entrypoints.omni import Omni
    from ht_vllm_omni_tpu.sampling_params import SamplingParams

    cfg = load_pipeline_config(builtin_pipeline_path("glm_image"))
    st0 = cfg.stage(0)
    st0.engine_args["model_arch_config"] = dict(
        model_type="glm4", vocab_size=192, hidden_size=32,
        intermediate_size=48, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=8,
        partial_rotary_factor=0.5, use_post_norms=True,
        rope_interleaved=True, attention_bias=True, dtype="float32",
        tie_word_embeddings=True, eos_token_id=2,
    )
    st0.engine_args["num_pages"] = 64
    st0.engine_args["image_code_begin_id"] = 96
    st0.engine_args["image_code_size"] = 64
    st0.default_sampling_params.update(
        allowed_token_range=[96, 160], stop_token_ids=[2], max_tokens=16,
    )
    cfg.stage(1).engine_args["family_options"] = {}
    cfg.stage(1).default_sampling_params.update(
        height=32, width=32, num_inference_steps=2, guidance_scale=3.0,
    )
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    sp = SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True,
        allowed_token_range=(96, 160),
    )
    outs = omni.generate([[3, 7, 11]], sp)
    img = outs[0].consolidated_multimodal("image")
    assert img is not None
    assert np.asarray(img).shape[-1] == 3
