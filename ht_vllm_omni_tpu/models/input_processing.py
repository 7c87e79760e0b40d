"""Multimodal prompt preprocessing.

Counterpart of the reference's OmniInputPreprocessor + per-model
multimodal processors (reference vllm_omni/inputs/preprocess.py and the
upstream HF processors the thinker models use): an image placeholder
token in the prompt is expanded to its patch-grid tokens, M-RoPE [3, S]
positions are computed (models/mrope.py), and a pluggable vision encoder
supplies patch embeddings that the runner overlays onto the text token
embeddings at prefill.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.inputs import OmniPrompt
from ht_vllm_omni_tpu.models.mrope import mrope_position_ids

# image [H, W, C] -> patch embeddings [n_patches, hidden]
VisionEncoder = Callable[[np.ndarray, int], np.ndarray]


@dataclasses.dataclass
class MultiModalConfig:
    image_token_id: int
    patch_size: int = 28
    hidden_size: int = 0  # filled from the model config


def default_vision_encoder(image: np.ndarray, hidden: int) -> np.ndarray:
    """Placeholder encoder: per-patch mean colour tiled into the hidden
    dim (real families plug a ViT here via the registry)."""
    h, w = image.shape[:2]
    ph = max(h // 28, 1)
    pw = max(w // 28, 1)
    patches = image[: ph * 28, : pw * 28].reshape(
        ph, 28, pw, 28, -1
    ).mean(axis=(1, 3))  # [ph, pw, C]
    flat = patches.reshape(ph * pw, -1).astype(np.float32)
    reps = int(np.ceil(hidden / flat.shape[1]))
    return np.tile(flat, (1, reps))[:, :hidden] / 255.0


def process_multimodal_prompt(
    prompt: OmniPrompt,
    cfg: ModelArchConfig,
    encoder: VisionEncoder = default_vision_encoder,
) -> OmniPrompt:
    """Expand image placeholders and attach mrope + embed overlays.

    Each occurrence of cfg.image_token_id in token_ids consumes one image
    from multi_modal_data["image"] (a list of [H, W, C] arrays) and is
    replaced by grid_h * grid_w copies; ``mm_embeds`` segments tell the
    runner where to overlay the encoder outputs.
    """
    images = prompt.multi_modal_data.get("image") or []
    if not isinstance(images, (list, tuple)):
        images = [images]
    token_ids = list(prompt.token_ids or [])
    if cfg.image_token_id is None or not images:
        return prompt

    expanded: list[int] = []
    grids: list[tuple[int, int, int]] = []
    segments: list[tuple[int, np.ndarray]] = []
    img_iter = iter(images)
    for tok in token_ids:
        if tok == cfg.image_token_id:
            image = np.asarray(next(img_iter))
            embeds = encoder(image, cfg.hidden_size)
            n = embeds.shape[0]
            h_guess = max(image.shape[0] // 28, 1)
            w_guess = max(image.shape[1] // 28, 1)
            if h_guess * w_guess != n:
                h_guess, w_guess = 1, n
            grids.append((1, h_guess, w_guess))
            segments.append((len(expanded), embeds))
            expanded.extend([cfg.image_token_id] * n)
        else:
            expanded.append(tok)

    positions, delta = mrope_position_ids(
        expanded, cfg.image_token_id, grids
    )
    info = dict(prompt.additional_information)
    info.update(
        {
            "mm_embeds": segments,
            "mrope_positions": positions,
            "mrope_delta": delta,
        }
    )
    return dataclasses.replace(
        prompt,
        token_ids=expanded,
        multi_modal_data={},
        additional_information=info,
    )
