"""Multimodal prompt preprocessing.

Counterpart of the reference's OmniInputPreprocessor + per-model
multimodal processors (reference vllm_omni/inputs/preprocess.py and the
upstream HF processors the thinker models use): image/audio placeholder
tokens in the prompt are expanded to their patch/frame-grid tokens,
M-RoPE [3, S] positions are computed (models/mrope.py), and a pluggable
perception adapter supplies the embeddings the runner overlays onto the
text token embeddings at prefill.

Adapters expose ``encode_image(image) -> (embeds, (t, gh, gw))`` and/or
``encode_audio(wav, sr) -> embeds`` (e.g.
models/qwen3_omni/adapter.Qwen3OmniPerception); a legacy bare callable
``(image, hidden) -> embeds`` still works for tests.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import numpy as np

from ht_vllm_omni_tpu.config import ModelArchConfig
from ht_vllm_omni_tpu.inputs import OmniPrompt
from ht_vllm_omni_tpu.models.mrope import mrope_position_ids

# legacy interface: image [H, W, C] -> patch embeddings [n_patches, hidden]
VisionEncoder = Callable[[np.ndarray, int], np.ndarray]


def default_vision_encoder(image: np.ndarray, hidden: int) -> np.ndarray:
    """Fallback encoder used only when no adapter is configured (engine
    smoke tests): per-patch mean colour tiled into the hidden dim."""
    h, w = image.shape[:2]
    ph = max(h // 28, 1)
    pw = max(w // 28, 1)
    patches = image[: ph * 28, : pw * 28].reshape(
        ph, 28, pw, 28, -1
    ).mean(axis=(1, 3))  # [ph, pw, C]
    flat = patches.reshape(ph * pw, -1).astype(np.float32)
    reps = int(np.ceil(hidden / flat.shape[1]))
    return np.tile(flat, (1, reps))[:, :hidden] / 255.0


def _encode_image(encoder: Any, image: np.ndarray, hidden: int):
    """Normalise the two encoder interfaces to (embeds, grid|None)."""
    if hasattr(encoder, "encode_image"):
        return encoder.encode_image(image)
    embeds = encoder(image, hidden)
    return embeds, None


def process_multimodal_prompt(
    prompt: OmniPrompt,
    cfg: ModelArchConfig,
    encoder: Any = default_vision_encoder,
) -> OmniPrompt:
    """Expand image/audio placeholders and attach mrope + embed overlays.

    Each occurrence of cfg.image_token_id / cfg.audio_token_id in
    token_ids consumes one item from multi_modal_data["image"] /
    ["audio"] and is replaced by its token-grid copies; ``mm_embeds``
    segments tell the runner where to overlay the encoder outputs.
    Audio entries are waveforms (np arrays) or (waveform, sample_rate)
    tuples; audio tokens take sequential text-like M-RoPE positions.
    """
    images = prompt.multi_modal_data.get("image") or []
    audios = prompt.multi_modal_data.get("audio") or []
    if not isinstance(images, (list, tuple)):
        images = [images]
    if not isinstance(audios, (list, tuple)) or (
        len(audios) == 2
        and isinstance(audios[0], np.ndarray)
        and isinstance(audios[1], (int, float))
    ):
        audios = [audios]
    token_ids = list(prompt.token_ids or [])
    has_img = cfg.image_token_id is not None and images
    has_aud = getattr(cfg, "audio_token_id", None) is not None and audios
    if not has_img and not has_aud:
        return prompt

    expanded: list[int] = []
    grids: list[tuple[int, int, int]] = []
    segments: list[tuple[int, np.ndarray]] = []
    img_iter = iter(images)
    aud_iter = iter(audios)
    for tok in token_ids:
        if has_img and tok == cfg.image_token_id:
            image = np.asarray(next(img_iter))
            embeds, grid = _encode_image(encoder, image, cfg.hidden_size)
            n = embeds.shape[0]
            if grid is None:
                h_guess = max(image.shape[0] // 28, 1)
                w_guess = max(image.shape[1] // 28, 1)
                if h_guess * w_guess != n:
                    h_guess, w_guess = 1, n
                grid = (1, h_guess, w_guess)
            grids.append(tuple(grid))
            segments.append((len(expanded), np.asarray(embeds)))
            expanded.extend([cfg.image_token_id] * n)
        elif has_aud and tok == cfg.audio_token_id:
            item = next(aud_iter)
            if isinstance(item, tuple):
                wav, sr = item
            else:
                wav, sr = item, 16000
            embeds = np.asarray(encoder.encode_audio(np.asarray(wav), sr))
            segments.append((len(expanded), embeds))
            # audio tokens advance positions like text (no grid entry)
            expanded.extend([cfg.audio_token_id] * embeds.shape[0])
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
