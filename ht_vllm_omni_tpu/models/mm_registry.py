"""Multimodal perception adapter registry.

Counterpart of the reference's per-model HF-processor / tower selection
(reference vllm_omni/model_executor/models/registry.py + the thinker
towers): stage configs name an adapter via
``EngineConfig.mm_encoder_spec = {"name": ..., ...kwargs}`` and the
engine builds it here.  Adapters expose encode_image / encode_audio
(models/input_processing.py contract).
"""

from __future__ import annotations

from typing import Any, Callable

_BUILDERS: dict[str, Callable[..., Any]] = {}


def register(name: str):
    def deco(fn):
        _BUILDERS[name] = fn
        return fn

    return deco


def build(spec: dict, arch) -> Any:
    spec = dict(spec)
    name = spec.pop("name")
    builder = _BUILDERS.get(name)
    if builder is None:
        raise ValueError(
            f"unknown mm adapter {name!r}; known: {sorted(_BUILDERS)}"
        )
    return builder(arch, **spec)


@register("qwen3_omni")
def _build_qwen3_omni(arch, vision: dict | None = None,
                      audio: dict | None = None, seed: int = 0):
    """Real Qwen3-Omni towers; tower output dims default to the thinker
    hidden size so overlays line up.  Pass checkpoint state via the
    loader APIs on the returned object for real weights."""
    from ht_vllm_omni_tpu.models.qwen3_omni import adapter as ad
    from ht_vllm_omni_tpu.models.qwen3_omni import audio_encoder as ae
    from ht_vllm_omni_tpu.models.qwen3_omni import vision_encoder as ve

    vcfg = None
    if vision is not None:
        vision = dict(vision)
        vision.setdefault("out_hidden_size", arch.hidden_size)
        if "deepstack_visual_indexes" in vision:
            vision["deepstack_visual_indexes"] = tuple(
                vision["deepstack_visual_indexes"]
            )
        vcfg = ve.VisionEncoderConfig(**vision)
    acfg = None
    if audio is not None:
        audio = dict(audio)
        audio.setdefault("output_dim", arch.hidden_size)
        acfg = ae.AudioEncoderConfig(**audio)
    return ad.Qwen3OmniPerception(vision_cfg=vcfg, audio_cfg=acfg, seed=seed)
