"""Diffusion engine on CPU: denoise loop, determinism, streaming, CFG."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
from ht_vllm_omni_tpu.diffusion.models import dit
from ht_vllm_omni_tpu.diffusion.models.pipeline_flow import FlowPipeline
from ht_vllm_omni_tpu.diffusion.schedulers.flow_match import (
    FlowMatchEulerScheduler,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _arch():
    return DiTArchConfig(
        hidden_size=64, num_layers=2, num_heads=4, patch_size=2,
        in_channels=4, cond_dim=64, vocab_size=64, dtype="float32",
    )


def _sp(**kw):
    base = dict(
        height=32, width=32, num_inference_steps=4, guidance_scale=3.0,
        seed=7,
    )
    base.update(kw)
    return DiffusionSamplingParams(**base)


def test_scheduler_sigmas_monotonic():
    s = FlowMatchEulerScheduler(10)
    sig = np.asarray(s.sigmas)
    assert sig[0] <= 1.0 and sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)


def test_dit_patchify_roundtrip():
    cfg = _arch()
    lat = jnp.arange(8 * 8 * 4, dtype=jnp.float32).reshape(8, 8, 4)
    tokens = dit.patchify(cfg, lat)
    assert tokens.shape == (16, 16)
    back = dit.unpatchify(cfg, tokens, 8, 8)
    np.testing.assert_array_equal(back, lat)


def test_pipeline_deterministic_and_seed_sensitive():
    pipe = FlowPipeline(_arch(), seed=0)
    img1, _ = pipe.generate([5, 6, 7], _sp())
    img2, _ = pipe.generate([5, 6, 7], _sp())
    img3, _ = pipe.generate([5, 6, 7], _sp(seed=8))
    assert img1.shape == (32, 32, 3) and img1.dtype == np.uint8
    np.testing.assert_array_equal(img1, img2)
    assert np.any(img1 != img3)


def test_guidance_scale_changes_output():
    pipe = FlowPipeline(_arch(), seed=0)
    a, _ = pipe.generate([5], _sp(guidance_scale=0.0))
    b, _ = pipe.generate([5], _sp(guidance_scale=9.0))
    assert np.any(a != b)


def test_engine_full_and_streaming():
    eng = DiffusionEngine(OmniDiffusionConfig(arch=_arch()))
    eng.add_request(
        OmniPrompt(
            text="a cat",
            additional_information={"size": "32x32",
                                    "num_inference_steps": 4, "seed": 1},
        ),
        request_id="r0",
    )
    outs = eng.step()
    assert outs[0].finished and "image" in outs[0].multimodal_output
    assert not eng.has_unfinished_requests()

    # streaming: emits progress then the final image
    eng.add_request(
        OmniPrompt(
            text="a dog",
            additional_information={
                "size": "32x32", "num_inference_steps": 4, "seed": 1,
                "stream_every": 2,
            },
        ),
        request_id="r1",
    )
    first = eng.step()[0]
    assert not first.finished and first.metrics["denoise_step"] == 2
    second = eng.step()[0]
    assert second.finished and "image" in second.multimodal_output


def test_stepwise_matches_full_run():
    pipe = FlowPipeline(_arch(), seed=0)
    full, _ = pipe.generate([9, 9], _sp(num_inference_steps=4))
    state: dict = {}
    out = None
    sp = _sp(num_inference_steps=4, stream_every=1)
    for _ in range(4):
        out, state = pipe.generate([9, 9], sp, stepwise_state=state)
    np.testing.assert_array_equal(out, full)
