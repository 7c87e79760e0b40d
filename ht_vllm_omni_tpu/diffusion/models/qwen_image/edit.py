"""Qwen-Image edit-family pipelines.

Three variants of the base QwenImagePipeline that match the reference
registry rows (reference vllm_omni/diffusion/registry.py:25-39):

- QwenImageEditPipeline (pipeline_qwen_image_edit.py): the input image
  is VAE-encoded at a ~1 MPix grid, packed, and appended to the model
  input every step as a conditioning segment (RoPE frame offset 1);
  only the target tokens are denoised.
- QwenImageEditPlusPipeline (pipeline_qwen_image_edit_plus.py): same,
  but accepts several conditioning images, each encoded at a ~384^2
  grid (CONDITION_IMAGE_SIZE) with segment offsets 1..N; the target
  size defaults to the first image's aspect at ~1 MPix.
- QwenImageLayeredPipeline (pipeline_qwen_image_layered.py): denoises
  layers+1 frames in one latent (frame axis on RoPE) and decodes each
  frame separately — output is [layers+1, H, W, 3] (composite first).

Text encoding is text-only here (the reference conditions the Qwen2.5-VL
encoder on the image as well; the latent conditioning path is the
dominant signal and is implemented exactly).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ht_vllm_omni_tpu.diffusion.data import DiffusionSamplingParams
from ht_vllm_omni_tpu.diffusion.models.qwen_image import vae
from ht_vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    QwenImagePipeline,
    pack_latents,
    unpack_latents,
)

VAE_IMAGE_AREA = 1024 * 1024
CONDITION_IMAGE_AREA = 384 * 384


def calculate_dimensions(
    target_area: float, ratio: float
) -> tuple[int, int]:
    """(width, height) of the given area/aspect snapped to 32
    (reference pipeline_qwen_image_edit.py:152)."""
    width = math.sqrt(target_area * ratio)
    height = width / ratio
    return round(width / 32) * 32, round(height / 32) * 32


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbour resize to (h, w); img [H, W, 3] float [0,1]."""
    if img.shape[:2] == (h, w):
        return img
    ri = (np.arange(h) * img.shape[0] // h).clip(0, img.shape[0] - 1)
    ci = (np.arange(w) * img.shape[1] // w).clip(0, img.shape[1] - 1)
    return img[ri][:, ci]


class QwenImageEditPipeline(QwenImagePipeline):
    """Single-image edit: image -> conditioning latent segment."""

    default_cond_area = VAE_IMAGE_AREA

    def __init__(self, *args, cond_area: int | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.cond_area = cond_area or self.default_cond_area

    @staticmethod
    def _init_image(prompt):
        # the input image is conditioning, not an SDEdit init: disable
        # the base pipeline's strength-blend path
        return None

    def _cond_images(self, prompt) -> list[np.ndarray]:
        mm = getattr(prompt, "multi_modal_data", None) or {}
        info = getattr(prompt, "additional_information", None) or {}
        imgs = mm.get("image")
        if imgs is None:
            imgs = info.get("init_image")
        if imgs is None:
            return []
        if not isinstance(imgs, (list, tuple)):
            imgs = [imgs]
        out = []
        for im in imgs:
            im = np.asarray(im, np.float32)
            if im.max() > 1.5:
                im = im / 255.0
            out.append(im)
        return out

    def _encode_cond(
        self, img: np.ndarray
    ) -> tuple[jax.Array, tuple[int, int, int]]:
        """Image -> (packed latents [1, S, C*4], rope shape)."""
        ratio = img.shape[1] / max(img.shape[0], 1)
        w, h = calculate_dimensions(self.cond_area, ratio)
        sr = self.vae_cfg.spatial_ratio
        lat_h = max(2 * (h // (sr * 2)), 2)
        lat_w = max(2 * (w // (sr * 2)), 2)
        img = _resize(img, h, w) * 2.0 - 1.0
        fn = self._fns.get("encode_cond")
        if fn is None:
            cfg = self.vae_cfg

            def run(params, x):
                z = vae.encode(cfg, params, x)
                return vae.normalize_latents(cfg, z)

            fn = jax.jit(run)
            self._fns["encode_cond"] = fn
        z = fn(self.params["vae"], jnp.asarray(img)[None])
        z = jnp.transpose(z, (0, 3, 1, 2))[:, :, :lat_h, :lat_w]
        return pack_latents(z), (1, lat_h // 2, lat_w // 2)

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        images = self._cond_images(prompt)
        if images and (not sp.height or not sp.width):
            w, h = calculate_dimensions(
                VAE_IMAGE_AREA, images[0].shape[1] / images[0].shape[0]
            )
            sp.height, sp.width = h, w
        state = super()._prepare(prompt, sp)
        lat_h, lat_w = state["lat_hw"]
        shapes = [(1, lat_h // 2, lat_w // 2)]
        if images:
            segs = []
            for im in images:
                z, shape = self._encode_cond(im)
                segs.append(z)
                shapes.append(shape)
            state["cond_latents"] = jnp.concatenate(segs, axis=1)
        state["img_shapes"] = tuple(shapes)
        return state


class QwenImageEditPlusPipeline(QwenImageEditPipeline):
    """Multi-image edit: each conditioning image encoded at ~384^2
    (reference pipeline_qwen_image_edit_plus.py:51)."""

    default_cond_area = CONDITION_IMAGE_AREA


class QwenImageLayeredPipeline(QwenImagePipeline):
    """Layered generation: layers+1 frames denoised jointly, decoded
    per frame (reference pipeline_qwen_image_layered.py:464-560)."""

    def _prepare(self, prompt, sp: DiffusionSamplingParams) -> dict:
        info = getattr(prompt, "additional_information", None) or {}
        layers = int(info.get("layers", 4))
        frames = layers + 1
        state = super()._prepare(prompt, sp)
        lat_h, lat_w = state["lat_hw"]
        # re-draw noise with the layer/frame axis and re-pack
        key = jax.random.PRNGKey(sp.seed if sp.seed is not None else 0)
        noise = jax.random.normal(
            key,
            (1, self.vae_cfg.z_dim, frames, lat_h, lat_w),
            jnp.float32,
        )
        b, c, f, h, w = noise.shape
        x = noise.reshape(b, c, f, h // 2, 2, w // 2, 2)
        x = x.transpose(0, 2, 3, 5, 1, 4, 6)
        state["latents"] = x.reshape(b, f * (h // 2) * (w // 2), c * 4)
        state["frames"] = frames
        state["img_shapes"] = ((frames, lat_h // 2, lat_w // 2),)
        return state

    def _finalize(self, state: dict, latents) -> np.ndarray:
        lat_h, lat_w = state["lat_hw"]
        frames = state["frames"]
        seq = latents.shape[1] // frames
        imgs = []
        dec = self._decode_fn()
        for i in range(frames):
            img = dec(
                self.params["vae"],
                latents[:, i * seq : (i + 1) * seq],
                lat_h,
                lat_w,
            )[0]
            imgs.append(
                np.asarray(img * 255.0, np.float32).astype(np.uint8)
            )
        return np.stack(imgs)
