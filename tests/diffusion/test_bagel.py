"""Bagel: MoT routing semantics (gen vs und experts), in-context flow
generation, CFG, engine e2e."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.bagel import BagelPipeline, mot
from ht_vllm_omni_tpu.diffusion.models.bagel.config import BagelArchConfig
from ht_vllm_omni_tpu.inputs import OmniPrompt


def test_mot_routes_tokens_to_their_experts():
    """gen-expert weights must only influence gen tokens' compute path;
    und tokens must be unaffected by perturbing gen weights — and the
    prompt rows must be invisible to causal-future prompt rows."""
    cfg = BagelArchConfig.tiny()
    params = mot.init_params(cfg, jax.random.PRNGKey(0))
    s, pl = 10, 6
    x = jax.random.normal(jax.random.PRNGKey(1), (s, cfg.hidden_size))
    pos = jnp.arange(s)
    gen_mask = jnp.zeros((s,), jnp.int32).at[pl:].set(1)
    out = mot.forward(cfg, params, x, pos, gen_mask, pl)
    assert out.shape == (s, cfg.hidden_size)

    p2 = dict(params)
    p2["wg_gen"] = params["wg_gen"] * 5.0
    out2 = mot.forward(cfg, p2, x, pos, gen_mask, pl)
    # und (prompt) rows attend causally among themselves only, so they
    # never see gen rows and never touch gen weights
    np.testing.assert_allclose(
        np.asarray(out[:pl]), np.asarray(out2[:pl]), rtol=1e-5, atol=1e-6
    )
    assert not np.allclose(np.asarray(out[pl:]), np.asarray(out2[pl:]))

    p3 = dict(params)
    p3["wg_und"] = params["wg_und"] * 5.0
    out3 = mot.forward(cfg, p3, x, pos, gen_mask, pl)
    # und weights feed the prompt rows, whose K/V the gen rows read:
    # everything moves
    assert not np.allclose(np.asarray(out[:pl]), np.asarray(out3[:pl]))


def test_pipeline_generates_and_prompt_conditions():
    pipe = BagelPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=3, guidance_scale=2.0,
        seed=7,
    )
    p = OmniPrompt(text="a red cube")
    img, state = pipe.generate_prompt(p, sp)
    assert img is not None and img.shape == (32, 32, 3)
    assert state["do_cfg"]
    img2, _ = pipe.generate_prompt(p, sp)
    np.testing.assert_array_equal(img, img2)
    img3, _ = pipe.generate_prompt(OmniPrompt(text="a blue sphere"), sp)
    assert not np.array_equal(img, img3)


def test_timestep_shift_warp():
    pipe = BagelPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=5, guidance_scale=1.0,
        seed=1,
    )
    st = pipe._prepare(OmniPrompt(text="x"), sp)
    ts = st["ts"]
    # shift-warped grid: monotone decreasing from 1, warped by s=3
    assert ts[0] == pytest.approx(1.0)
    assert np.all(np.diff(ts) < 0)
    s = pipe.arch.timestep_shift
    lin = np.linspace(1.0, 0.0, 5)[:-1]
    np.testing.assert_allclose(ts, s * lin / (1 + (s - 1) * lin), rtol=1e-6)


def test_engine_runs_bagel():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="bagel"))
    eng.add_request(
        OmniPrompt(
            text="blue circle",
            additional_information={
                "size": "32x32", "num_inference_steps": 3, "seed": 1,
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
