"""Wan2.2 video family: 3D transformer, causal-3D VAE, dual-expert
denoising, t2v/i2v pipeline, engine integration."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.wan_video import (
    WanVideoArchConfig,
    WanVideoPipeline,
    WanVideoVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.wan_video import transformer, vae3d
from ht_vllm_omni_tpu.inputs import OmniPrompt


def test_transformer_shapes_and_determinism():
    cfg = WanVideoArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (2, cfg.in_channels, 2, 8, 8), jnp.float32
    )
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (2, 16, cfg.text_dim), jnp.float32
    )
    lens = jnp.asarray([10, 16], jnp.int32)
    out = transformer.forward(cfg, params, lat, t, txt, lens)
    assert out.shape == (2, cfg.out_channels, 2, 8, 8)
    out2 = transformer.forward(cfg, params, lat, t, txt, lens)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_transformer_per_token_timesteps():
    """TI2V mode: per-token timesteps change only what they should —
    tokens at t=0 (conditioned frame) vs uniform t produce different
    outputs, and the path runs with a [B, S] timestep."""
    cfg = WanVideoArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    lat = jax.random.normal(
        jax.random.PRNGKey(1), (1, cfg.in_channels, 2, 8, 8), jnp.float32
    )
    pt, ph, pw = cfg.patch_size
    s = (2 // pt) * (8 // ph) * (8 // pw)
    txt = jax.random.normal(
        jax.random.PRNGKey(2), (1, 8, cfg.text_dim), jnp.float32
    )
    lens = jnp.asarray([8], jnp.int32)
    t_uniform = jnp.full((1, s), 400.0, jnp.float32)
    t_masked = t_uniform.at[:, : s // 2].set(0.0)
    a = transformer.forward(cfg, params, lat, t_uniform, txt, lens)
    b = transformer.forward(cfg, params, lat, t_masked, txt, lens)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_vae3d_temporal_causality():
    """Causal convs: changing frame t of the latents must not change any
    decoded output frame earlier than t * temporal_ratio."""
    cfg = WanVideoVAEConfig.tiny()
    params = vae3d.init_params(cfg, jax.random.PRNGKey(3))
    z = jax.random.normal(
        jax.random.PRNGKey(4), (1, 4, 4, 4, cfg.z_dim), jnp.float32
    )
    base = np.asarray(vae3d.decode(cfg, params, z))
    z2 = z.at[:, 2:].add(10.0)  # perturb latent frames 2..3
    pert = np.asarray(vae3d.decode(cfg, params, z2))
    r = cfg.temporal_ratio
    # frames decoded purely from latent frames 0..1 are untouched
    np.testing.assert_array_equal(base[:, : 2 * r], pert[:, : 2 * r])
    assert not np.array_equal(base[:, 2 * r :], pert[:, 2 * r :])


def test_vae3d_encode_decode_ratios():
    cfg = WanVideoVAEConfig.tiny()
    params = vae3d.init_params(cfg, jax.random.PRNGKey(5))
    x = jax.random.normal(
        jax.random.PRNGKey(6), (1, 4, 8, 8, 3), jnp.float32
    )
    z = vae3d.encode(cfg, params, x)
    # temporal 2x, spatial 2x for the tiny config
    assert z.shape == (1, 2, 4, 4, cfg.z_dim)
    y = vae3d.decode(cfg, params, z)
    assert y.shape == (1, 4, 8, 8, 3)


def _sp(steps=4, frames=4, guidance=3.0):
    return DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=steps,
        guidance_scale=guidance, seed=11,
    )


def test_t2v_pipeline_and_stepwise_determinism():
    pipe = WanVideoPipeline(seed=0, boundary_ratio=0.5)
    prompt = OmniPrompt(
        text="a drifting cloud",
        additional_information={"num_frames": 4},
    )
    video, state = pipe.generate_prompt(prompt, _sp())
    assert video is not None
    assert video.ndim == 4 and video.shape[3] == 3
    assert video.dtype == np.uint8
    assert state["step"] == 4

    sp2 = DiffusionSamplingParams(
        height=16, width=16, num_inference_steps=4, guidance_scale=3.0,
        seed=11, stream_every=1,
    )
    v2, st = None, None
    for _ in range(4):
        v2, st = pipe.generate_prompt(prompt, sp2, stepwise_state=st)
    np.testing.assert_array_equal(video, v2)


def test_boundary_experts_switch():
    """The high/low-noise experts are different random inits: moving the
    boundary changes which expert handles which steps, so results must
    differ between boundary settings (reference pipeline_wan2_2.py:574)."""
    prompt = OmniPrompt(
        text="x", additional_information={"num_frames": 4}
    )
    a, _ = WanVideoPipeline(seed=0, boundary_ratio=None).generate_prompt(
        prompt, _sp()
    )
    b, _ = WanVideoPipeline(seed=0, boundary_ratio=0.5).generate_prompt(
        prompt, _sp()
    )
    c, _ = WanVideoPipeline(seed=0, boundary_ratio=1.0).generate_prompt(
        prompt, _sp()
    )
    z, _ = WanVideoPipeline(seed=0, boundary_ratio=0.0).generate_prompt(
        prompt, _sp()
    )
    assert not np.array_equal(a, b)  # mixed experts != high-only
    assert not np.array_equal(b, c)  # mixed != low-only
    assert not np.array_equal(a, c)  # high-only != low-only
    # boundary 0.0 degenerates to the high-noise expert everywhere, same
    # as no boundary (reference: t < 0 never selects transformer_2)
    np.testing.assert_array_equal(a, z)


def test_i2v_first_frame_conditioning():
    pipe = WanVideoPipeline(seed=0, boundary_ratio=0.5)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(16, 16, 3)).astype(np.uint8)
    t2v = OmniPrompt(
        text="wave", additional_information={"num_frames": 4}
    )
    i2v = OmniPrompt(
        text="wave",
        multi_modal_data={"image": img},
        additional_information={"num_frames": 4},
    )
    va, _ = pipe.generate_prompt(t2v, _sp())
    vb, _ = pipe.generate_prompt(i2v, _sp())
    assert va.shape == vb.shape
    assert not np.array_equal(va, vb)
    # deterministic under the same conditioning
    vb2, _ = pipe.generate_prompt(i2v, _sp())
    np.testing.assert_array_equal(vb, vb2)


def test_engine_runs_wan_video_family():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="wan2.2"))
    eng.add_request(
        OmniPrompt(
            text="ripples",
            additional_information={
                "size": "16x16", "num_inference_steps": 2, "seed": 1,
                "num_frames": 4,
            },
        ),
        request_id="v0",
    )
    video = None
    while eng.has_unfinished_requests():
        for out in eng.step():
            if out.finished:
                assert out.error is None, out.error
                video = out.multimodal_output.get("video")
    assert video is not None and np.asarray(video).ndim == 4
