"""OmniGen2: refiner stages + ref-image conditioning + pipeline e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.omnigen2 import OmniGen2Pipeline
from ht_vllm_omni_tpu.diffusion.models.omnigen2 import transformer as og2
from ht_vllm_omni_tpu.diffusion.models.omnigen2.transformer import (
    OmniGen2ArchConfig,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def test_position_ids_follow_reference_scheme():
    cfg = OmniGen2ArchConfig.tiny()
    cap, refs, img = og2.position_ids(cfg, 5, ((2, 3),), (4, 4))
    # text tokens at (t, t, t)
    np.testing.assert_array_equal(cap[:, 0], np.arange(5))
    np.testing.assert_array_equal(cap[:, 1], np.arange(5))
    # ref image axis-0 offset = cap_len; noise offset advances by
    # max(H_tokens, W_tokens)
    assert refs[0][:, 0].min() == refs[0][:, 0].max() == 5
    assert img[:, 0].min() == img[:, 0].max() == 5 + 3


def test_forward_shapes_and_ref_conditioning():
    cfg = OmniGen2ArchConfig.tiny()
    params = og2.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    pin = cfg.patch_size**2 * cfg.in_channels
    img = rng.normal(size=(1, 16, pin)).astype(np.float32)
    cap = rng.normal(size=(1, 6, cfg.text_feat_dim)).astype(np.float32)
    ref = rng.normal(size=(1, 6, pin)).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    out = og2.forward(
        cfg, params, jnp.asarray(img), jnp.asarray(cap),
        jnp.asarray(ref), jnp.asarray(t), (4, 4), ((2, 3),),
    )
    assert out.shape == (1, 16, pin)
    out2 = og2.forward(
        cfg, params, jnp.asarray(img), jnp.asarray(cap),
        jnp.asarray(ref + 1.0), jnp.asarray(t), (4, 4), ((2, 3),),
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))
    # no-ref path works too
    out3 = og2.forward(
        cfg, params, jnp.asarray(img), jnp.asarray(cap), None,
        jnp.asarray(t), (4, 4), (),
    )
    assert out3.shape == out.shape


def test_pipeline_generates_and_edits():
    pipe = OmniGen2Pipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=2, guidance_scale=2.0,
        seed=7,
    )
    img, _ = pipe.generate_prompt(OmniPrompt(text="a cat"), sp)
    assert img is not None and img.shape == (32, 32, 3)

    rng = np.random.default_rng(0)
    ref = rng.integers(0, 255, size=(32, 32, 3)).astype(np.uint8)
    p = OmniPrompt(text="a cat", multi_modal_data={"image": ref})
    state = pipe._prepare(p, sp)
    assert state["ref_tokens"] is not None and state["ref_grids"]
    img2, _ = pipe.generate_prompt(p, sp)
    assert not np.array_equal(img, img2)


def test_engine_runs_omnigen2():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="omnigen2"))
    eng.add_request(
        OmniPrompt(
            text="blue circle",
            additional_information={
                "size": "32x32", "num_inference_steps": 2, "seed": 1,
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
    assert "image" in outs[-1].multimodal_output
