"""Edit-family pipelines: Qwen-Image Edit / Edit-Plus / Layered and
Flux Kontext — conditioning-segment concat, multi-segment RoPE, layered
per-frame decode, registry wiring."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.qwen_image.edit import (
    QwenImageEditPipeline,
    QwenImageEditPlusPipeline,
    QwenImageLayeredPipeline,
    calculate_dimensions,
)
from ht_vllm_omni_tpu.inputs import OmniPrompt


def _img(seed, h=32, w=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3)).astype(np.uint8)


def test_calculate_dimensions_snaps_to_32():
    w, h = calculate_dimensions(1024 * 1024, 1.0)
    assert w == h == 1024
    w, h = calculate_dimensions(384 * 384, 2.0)
    assert w % 32 == 0 and h % 32 == 0
    assert abs((w / h) - 2.0) < 0.3


def test_multiseg_rope_concatenates_segment_grids():
    from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
        QwenImageArchConfig,
    )
    from ht_vllm_omni_tpu.diffusion.models.qwen_image.transformer import (
        rope_cos_sin_3d,
    )

    cfg = QwenImageArchConfig.tiny()
    c1, s1, _, _ = rope_cos_sin_3d(cfg, (1, 4, 4), 8)
    c2, s2, _, _ = rope_cos_sin_3d(cfg, ((1, 4, 4), (1, 2, 2)), 8)
    assert c2.shape[0] == 16 + 4
    # the target segment's grid is unchanged by appending a cond segment
    np.testing.assert_array_equal(np.asarray(c2[:16]), np.asarray(c1))
    # the cond segment differs from a plain (1,2,2) grid (frame offset 1)
    c3, _, _, _ = rope_cos_sin_3d(cfg, (1, 2, 2), 8)
    assert not np.allclose(np.asarray(c2[16:]), np.asarray(c3))


def test_qwen_image_edit_conditions_on_image():
    pipe = QwenImageEditPipeline(seed=0, cond_area=32 * 32)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=3, guidance_scale=1.0,
        seed=5,
    )
    p_edit = OmniPrompt(
        text="make it green", multi_modal_data={"image": _img(0)}
    )
    state = pipe._prepare(p_edit, sp)
    assert "cond_latents" in state and len(state["img_shapes"]) == 2
    img, _ = pipe.generate_prompt(p_edit, sp)
    assert img is not None and img.shape == (32, 32, 3)

    # a different conditioning image changes the result
    p2 = OmniPrompt(
        text="make it green", multi_modal_data={"image": _img(9)}
    )
    img2, _ = pipe.generate_prompt(p2, sp)
    assert not np.array_equal(img, img2)

    # deterministic
    img3, _ = pipe.generate_prompt(p_edit, sp)
    np.testing.assert_array_equal(img, img3)


def test_qwen_image_edit_plus_multiple_images():
    pipe = QwenImageEditPlusPipeline(seed=0, cond_area=32 * 32)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
        seed=5,
    )
    p = OmniPrompt(
        text="merge them",
        multi_modal_data={"image": [_img(1), _img(2, 16, 48)]},
    )
    state = pipe._prepare(p, sp)
    assert len(state["img_shapes"]) == 3
    img, _ = pipe.generate_prompt(p, sp)
    assert img is not None and img.shape == (32, 32, 3)


def test_qwen_image_layered_decodes_each_layer():
    pipe = QwenImageLayeredPipeline(seed=0)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
        seed=5,
    )
    p = OmniPrompt(
        text="a sticker", additional_information={"layers": 2}
    )
    state = pipe._prepare(p, sp)
    assert state["frames"] == 3
    assert state["img_shapes"][0][0] == 3
    imgs, _ = pipe.generate_prompt(p, sp)
    assert imgs.shape == (3, 32, 32, 3)
    # frames are distinct layers, not copies
    assert not np.array_equal(imgs[0], imgs[1])


def test_flux_kontext_conditions_on_image():
    from ht_vllm_omni_tpu.diffusion.models.flux.kontext import (
        FluxKontextPipeline,
    )

    pipe = FluxKontextPipeline(seed=0, cond_area=32 * 32)
    sp = DiffusionSamplingParams(
        height=32, width=32, num_inference_steps=2, guidance_scale=1.0,
        seed=3,
    )
    p = OmniPrompt(
        text="add a hat", multi_modal_data={"image": _img(4)}
    )
    state = pipe._prepare(p, sp)
    assert "cond_latents" in state and len(state["img_shapes"]) == 2
    img, _ = pipe.generate_prompt(p, sp)
    assert img is not None and img.shape == (32, 32, 3)
    base, _ = pipe.generate_prompt(OmniPrompt(text="add a hat"), sp)
    assert not np.array_equal(img, base)


def test_registry_has_edit_families():
    from ht_vllm_omni_tpu.diffusion.registry import PIPELINE_FAMILIES

    for fam in (
        "qwen-image-edit", "qwen-image-edit-plus", "qwen-image-layered",
        "flux-kontext",
    ):
        assert fam in PIPELINE_FAMILIES


def test_engine_runs_edit_family():
    from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig
    from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine

    eng = DiffusionEngine(OmniDiffusionConfig(family="qwen-image-edit", family_options={"cond_area": 32 * 32}))
    eng.add_request(
        OmniPrompt(
            text="bluer",
            multi_modal_data={"image": _img(3)},
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
