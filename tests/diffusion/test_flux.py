"""Flux family: dual+single-stream transformer, guidance embeddings,
pipeline e2e, engine integration."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.flux import (
    FluxArchConfig,
    FluxPipeline,
)
from ht_vllm_omni_tpu.diffusion.models.flux import transformer
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _fwd(cfg, params, guidance, seed=1):
    img = jax.random.normal(
        jax.random.PRNGKey(seed), (1, 16, cfg.in_channels), jnp.float32
    )
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, cfg.joint_attention_dim), jnp.float32
    )
    lens = jnp.asarray([8], jnp.int32)
    pooled = jax.random.normal(
        jax.random.PRNGKey(3), (1, cfg.pooled_projection_dim), jnp.float32
    )
    t = jnp.asarray([0.5], jnp.float32)
    g = (
        jnp.asarray([guidance], jnp.float32)
        if guidance is not None
        else None
    )
    return transformer.forward(
        cfg, params, img, txt, lens, pooled, t, g, (1, 4, 4)
    )


def test_transformer_shapes_and_guidance_conditioning():
    cfg = FluxArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    a = _fwd(cfg, params, 1.0)
    assert a.shape == (1, 16, cfg.out_channels)
    # deterministic
    np.testing.assert_array_equal(
        np.asarray(a), np.asarray(_fwd(cfg, params, 1.0))
    )
    # guidance embedding conditions the distilled model
    b = _fwd(cfg, params, 7.5)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_pipeline_distilled_single_branch():
    pipe = FluxPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=4, guidance_scale=3.5,
        seed=9,
    )
    prompt = OmniPrompt(text="a glass orb")
    state = pipe._prepare(prompt, sp)
    assert not state["do_cfg"]  # distilled: guidance embed, no CFG
    assert state["txt"].shape[0] == 1
    img, st = pipe.generate_prompt(prompt, sp)
    assert img is not None and img.shape[2] == 3
    assert img.dtype == np.uint8
    # stepwise == one-shot
    sp2 = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=4, guidance_scale=3.5,
        seed=9, stream_every=1,
    )
    img2, st2 = None, None
    for _ in range(4):
        img2, st2 = pipe.generate_prompt(prompt, sp2, stepwise_state=st2)
    np.testing.assert_array_equal(img, img2)


def test_pipeline_non_distilled_runs_cfg():
    import dataclasses

    arch = dataclasses.replace(
        FluxArchConfig.tiny(), guidance_embeds=False
    )
    pipe = FluxPipeline(arch=arch, seed=0)
    sp = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=2, guidance_scale=3.0,
        seed=9,
    )
    prompt = OmniPrompt(text="x", negative_text="y")
    state = pipe._prepare(prompt, sp)
    assert state["do_cfg"] and state["txt"].shape[0] == 2
    img, _ = pipe.generate_prompt(prompt, sp)
    assert img is not None


def test_engine_runs_flux_family():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="flux"))
    eng.add_request(
        OmniPrompt(
            text="chrome sphere",
            additional_information={
                "size": "16x16", "num_inference_steps": 2, "seed": 1,
            },
        ),
        request_id="f0",
    )
    image = None
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                assert out.error is None, out.error
                image = out.multimodal_output.get("image")
    assert image is not None and np.asarray(image).ndim == 3
