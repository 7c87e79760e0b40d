"""Stable Audio: partial-rotary semantics, global-token plumbing,
Oobleck decode shapes, pipeline e2e through the engine."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.stable_audio import (
    StableAudioPipeline,
    oobleck,
    transformer,
)
from ht_vllm_omni_tpu.diffusion.models.stable_audio.config import (
    OobleckConfig,
    StableAudioArchConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt

torch = pytest.importorskip("torch")


def test_partial_rope_matches_reference_semantics():
    """First rotary_dim dims rotate NeoX-style, the rest pass through
    (reference apply_rotary_emb_stable_audio, :24-56)."""
    cfg = StableAudioArchConfig.tiny()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, 5, 2, cfg.attention_head_dim)).astype(
        np.float32
    )
    cos, sin = transformer.rope_tables(cfg, 5)
    out = np.asarray(
        transformer._partial_rope(jnp.asarray(x), cos, sin)
    )
    rd = cfg.rotary_dim
    # pass-through half untouched
    np.testing.assert_array_equal(out[..., rd:], x[..., rd:])

    # torch replica of the reference function
    xt = torch.from_numpy(x.copy())
    c = torch.from_numpy(np.asarray(cos))[None, :, None, :]
    s = torch.from_numpy(np.asarray(sin))[None, :, None, :]
    xr = xt[..., :rd]
    half = rd // 2
    re, im = xr[..., :half], xr[..., half:]
    rot = torch.cat([-im, re], -1)
    ref = (xr * c + rot * s).numpy()
    np.testing.assert_allclose(out[..., :rd], ref, rtol=1e-5, atol=1e-6)


def test_transformer_shapes_and_global_token():
    cfg = StableAudioArchConfig.tiny()
    params = transformer.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    lat = rng.normal(size=(1, cfg.in_channels, 12)).astype(np.float32)
    txt = rng.normal(
        size=(1, 6, cfg.cross_attention_input_dim)
    ).astype(np.float32)
    glob = rng.normal(
        size=(1, cfg.global_states_input_dim)
    ).astype(np.float32)
    t = np.asarray([0.4], np.float32)
    out = transformer.forward(
        cfg, params, *map(jnp.asarray, (lat, txt, glob, t))
    )
    assert out.shape == (1, cfg.out_channels, 12)
    # the duration conditioning must reach the output
    out2 = transformer.forward(
        cfg, params,
        jnp.asarray(lat), jnp.asarray(txt), jnp.asarray(glob + 1.0),
        jnp.asarray(t),
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_oobleck_decode_shapes():
    cfg = OobleckConfig.tiny()
    params = oobleck.init_params(cfg, jax.random.PRNGKey(0))
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 10, cfg.latent_dim))
    wav = oobleck.decode(cfg, params, z)
    assert wav.shape == (1, 10 * cfg.hop_length, cfg.audio_channels)
    w = np.asarray(wav)
    assert np.isfinite(w).all() and np.abs(w).max() <= 1.0


def test_pipeline_generates_audio():
    pipe = StableAudioPipeline(seed=0)
    sp = DiffusionSamplingParams(
        num_inference_steps=2, guidance_scale=3.0, seed=5,
    )
    p = OmniPrompt(
        text="rain on a tin roof",
        additional_information={"audio_end_in_s": 1.0},
    )
    out, _ = pipe.generate_prompt(p, sp)
    assert out is not None and "audio" in out
    assert len(out["audio"]) > 0
    assert np.isfinite(np.asarray(out["audio"], np.float32)).all()
    out2, _ = pipe.generate_prompt(p, sp)
    np.testing.assert_array_equal(out["audio"], out2["audio"])


def test_engine_runs_stable_audio():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="stable-audio"))
    eng.add_request(
        OmniPrompt(
            text="birdsong",
            additional_information={
                "num_inference_steps": 2, "seed": 1, "audio_end_in_s": 1.0,
            },
        ),
        request_id="r0",
    )
    outs = []
    for _ in range(10):
        outs.extend(eng.step())
        if outs and outs[-1].finished:
            break
    assert outs and outs[-1].finished and outs[-1].error is None
    assert "audio" in outs[-1].multimodal_output
