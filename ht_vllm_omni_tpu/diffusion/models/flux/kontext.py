"""Flux Kontext image-editing pipeline.

Variant of FluxPipeline matching the reference FluxKontextPipeline
(reference vllm_omni/diffusion/models/flux/pipeline_flux_kontext.py):
the input image is VAE-encoded, packed and appended to the model input
as a conditioning segment whose RoPE ids carry frame coordinate 1
(image_ids[..., 0] = 1, :421); only the target tokens are denoised.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.flux.pipeline import FluxPipeline
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.edit import (
    VAE_IMAGE_AREA,
    _resize,
    calculate_dimensions,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    pack_latents,
)


class FluxKontextPipeline(FluxPipeline):
    def __init__(self, *args, cond_area: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.cond_area = cond_area or VAE_IMAGE_AREA

    def _cond_image(self, prompt) -> np.ndarray | None:
        mm = getattr(prompt, "multi_modal_data", None) or {}
        info = getattr(prompt, "additional_information", None) or {}
        img = mm.get("image")
        if img is None:
            img = info.get("init_image")
        if img is None:
            return None
        if isinstance(img, (list, tuple)):
            img = img[0]
        img = np.asarray(img, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        return img

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        image = self._cond_image(prompt)
        if image is not None and (not sp.height or not sp.width):
            w, h = calculate_dimensions(
                VAE_IMAGE_AREA, image.shape[1] / image.shape[0]
            )
            sp.height, sp.width = h, w
        state = super()._prepare(prompt, sp)
        lat_h, lat_w = state["lat_hw"]
        shapes = [(1, lat_h // 2, lat_w // 2)]
        if image is not None:
            ratio = image.shape[1] / max(image.shape[0], 1)
            w, h = calculate_dimensions(self.cond_area, ratio)
            sr = self.vae_cfg.spatial_ratio
            clh = max(2 * (h // (sr * 2)), 2)
            clw = max(2 * (w // (sr * 2)), 2)
            img = _resize(image, h, w) * 2.0 - 1.0
            fn = self._fns.get("encode_cond")
            if fn is None:
                cfg = self.vae_cfg

                def run(params, x):
                    z = vae.encode(cfg, params, x)
                    return vae.normalize_latents(cfg, z)

                fn = jax.jit(run)
                self._fns["encode_cond"] = fn
            z = fn(self.params["vae"], jnp.asarray(img)[None])
            z = jnp.transpose(z, (0, 3, 1, 2))[:, :, :clh, :clw]
            state["cond_latents"] = pack_latents(z)
            shapes.append((1, clh // 2, clw // 2))
        state["img_shapes"] = tuple(shapes)
        return state
