"""Diffusion pipeline registry (family name -> pipeline factory).

Counterpart of the reference's registry of 27 pipeline families
(reference vllm_omni/diffusion/registry.py:18).  Families implemented so
far: the generic flow DiT and Qwen-Image; further families register the
same way.
"""

from __future__ import annotations

from typing import Any, Callable

from ht_vllm_omni_tpu.diffusion.data import OmniDiffusionConfig


def _generic(config: OmniDiffusionConfig, parallel=None) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.pipeline_flow import FlowPipeline

    kwargs: dict[str, Any] = {"parallel": parallel}
    if config.cache_backend == "tea_cache":
        from ht_vllm_omni_tpu.diffusion.cache.teacache import TeaCacheConfig

        kwargs["teacache"] = TeaCacheConfig(
            enabled=True,
            **{
                k: v for k, v in config.cache_config.items()
                if k in ("threshold",)
            },
        )
    elif config.cache_backend == "cache_dit":
        from ht_vllm_omni_tpu.diffusion.cache.dbcache import DBCacheConfig

        known = {
            f.name
            for f in __import__("dataclasses").fields(DBCacheConfig)
        } - {"enabled"}
        kwargs["dbcache"] = DBCacheConfig(
            enabled=True,
            **{
                k: v for k, v in config.cache_config.items() if k in known
            },
        )
    return FlowPipeline(config.arch, seed=config.seed, **kwargs)


def _qwen_image(config: OmniDiffusionConfig, parallel=None) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.qwen_image import (
        QwenImagePipeline,
    )
    from ht_vllm_omni_tpu.diffusion.models.qwen_image import loader

    kwargs: dict[str, Any] = dict(config.family_options)
    kwargs["parallel"] = parallel
    if config.model_path:
        from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
            QwenImageArchConfig,
            QwenImageVAEConfig,
        )
        import os

        arch = kwargs.pop("arch", QwenImageArchConfig())
        vae_cfg = kwargs.pop("vae_cfg", QwenImageVAEConfig())
        params = {
            "transformer": loader.load_transformer(
                arch, os.path.join(config.model_path, "transformer")
            ),
            "vae": loader.load_vae(
                vae_cfg, os.path.join(config.model_path, "vae")
            ),
        }
        return QwenImagePipeline(
            arch=arch, vae_cfg=vae_cfg, params=params,
            seed=config.seed, **kwargs,
        )
    return QwenImagePipeline(seed=config.seed, **kwargs)


# families whose factories accept a parallel context (served multichip
# execution); the rest get a precise error instead of silently running
# single-chip with parallel sizes > 1
_PARALLEL_FAMILIES = {
    "generic", "qwen-image", "wan2.2", "wan2.2-i2v", "flux", "sd3",
    "sd3.5",
}


def _qwen_image_variant(cls_name: str):
    def make(config: OmniDiffusionConfig) -> Any:
        from ht_vllm_omni_tpu.diffusion.models.qwen_image import edit

        kwargs: dict[str, Any] = dict(config.family_options)
        return getattr(edit, cls_name)(seed=config.seed, **kwargs)

    return make


def _flux_kontext(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.flux.kontext import (
        FluxKontextPipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    return FluxKontextPipeline(seed=config.seed, **kwargs)


def _flux2(cls_name: str):
    def make(config: OmniDiffusionConfig) -> Any:
        from ht_vllm_omni_tpu.diffusion.models import flux2

        kwargs: dict[str, Any] = dict(config.family_options)
        return getattr(flux2, cls_name)(seed=config.seed, **kwargs)

    return make


def _flux_like(cls_name: str):
    def make(config: OmniDiffusionConfig) -> Any:
        from ht_vllm_omni_tpu.diffusion.models import flux_like

        kwargs: dict[str, Any] = dict(config.family_options)
        return getattr(flux_like, cls_name)(seed=config.seed, **kwargs)

    return make


def _ltx2(cls_name: str):
    def make(config: OmniDiffusionConfig) -> Any:
        from ht_vllm_omni_tpu.diffusion.models import ltx2

        kwargs: dict[str, Any] = dict(config.family_options)
        return getattr(ltx2, cls_name)(seed=config.seed, **kwargs)

    return make


def _helios(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.helios import HeliosPipeline

    kwargs: dict[str, Any] = dict(config.family_options)
    return HeliosPipeline(seed=config.seed, **kwargs)


def _omnigen2(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.omnigen2 import OmniGen2Pipeline

    kwargs: dict[str, Any] = dict(config.family_options)
    return OmniGen2Pipeline(seed=config.seed, **kwargs)


def _dreamid_omni(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.dreamid_omni import (
        DreamIDOmniPipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    return DreamIDOmniPipeline(seed=config.seed, **kwargs)


def _bagel(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.bagel import BagelPipeline

    kwargs: dict[str, Any] = dict(config.family_options)
    return BagelPipeline(seed=config.seed, **kwargs)


def _glm_image(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.glm_image import (
        GlmImagePipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    return GlmImagePipeline(seed=config.seed, **kwargs)


def _stable_audio(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.stable_audio import (
        StableAudioPipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    return StableAudioPipeline(seed=config.seed, **kwargs)


def _hunyuan_video(cls_name: str):
    def make(config: OmniDiffusionConfig) -> Any:
        from ht_vllm_omni_tpu.diffusion.models import hunyuan_video

        kwargs: dict[str, Any] = dict(config.family_options)
        return getattr(hunyuan_video, cls_name)(
            seed=config.seed, **kwargs
        )

    return make


def _z_image(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.z_image import ZImagePipeline

    kwargs: dict[str, Any] = dict(config.family_options)
    return ZImagePipeline(seed=config.seed, **kwargs)


def _wan_video(config: OmniDiffusionConfig, parallel=None) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.wan_video import (
        WanVideoPipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    kwargs["parallel"] = parallel
    return WanVideoPipeline(seed=config.seed, **kwargs)


def _flux(config: OmniDiffusionConfig, parallel=None) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.flux import FluxPipeline

    kwargs: dict[str, Any] = dict(config.family_options)
    kwargs["parallel"] = parallel
    return FluxPipeline(seed=config.seed, **kwargs)


def _sd3(config: OmniDiffusionConfig, parallel=None) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.sd3 import SD3Pipeline
    from ht_vllm_omni_tpu.diffusion.models.sd3.config import SD3ArchConfig

    kwargs: dict[str, Any] = dict(config.family_options)
    kwargs["parallel"] = parallel
    if config.model_path:
        import os

        from ht_vllm_omni_tpu.diffusion.models.sd3 import transformer

        arch = kwargs.pop("arch", SD3ArchConfig())
        kwargs.setdefault("params", {})["transformer"] = (
            transformer.load_diffusers(
                arch, os.path.join(config.model_path, "transformer")
            )
        )
        kwargs["arch"] = arch
    return SD3Pipeline(seed=config.seed, **kwargs)


def _hunyuan_image3(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3 import (
        HunyuanImage3Pipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    return HunyuanImage3Pipeline(seed=config.seed, **kwargs)


def _mammoth_moda2(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2 import (
        MammothModa2DiTPipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    if "cfg_range" in kwargs:
        kwargs["cfg_range"] = tuple(kwargs["cfg_range"])
    return MammothModa2DiTPipeline(seed=config.seed, **kwargs)


def _nextstep(config: OmniDiffusionConfig) -> Any:
    from ht_vllm_omni_tpu.diffusion.models.nextstep import (
        NextStep11Pipeline,
    )

    kwargs: dict[str, Any] = dict(config.family_options)
    return NextStep11Pipeline(seed=config.seed, **kwargs)


PIPELINE_FAMILIES: dict[str, Callable[[OmniDiffusionConfig], Any]] = {
    "generic": _generic,
    "qwen-image": _qwen_image,
    "qwen-image-edit": _qwen_image_variant("QwenImageEditPipeline"),
    "qwen-image-edit-plus": _qwen_image_variant(
        "QwenImageEditPlusPipeline"
    ),
    "qwen-image-layered": _qwen_image_variant("QwenImageLayeredPipeline"),
    "flux": _flux,
    "flux-kontext": _flux_kontext,
    "flux2": _flux2("Flux2Pipeline"),
    "flux2-klein": _flux2("Flux2KleinPipeline"),
    "z-image": _z_image,
    "wan2.2": _wan_video,
    "wan2.2-i2v": _wan_video,  # same pipeline; i2v when an image rides in
    "hunyuan-video-1.5": _hunyuan_video("HunyuanVideoPipeline"),
    "hunyuan-video-1.5-i2v": _hunyuan_video("HunyuanVideoI2VPipeline"),
    "stable-audio": _stable_audio,
    "glm-image": _glm_image,
    "bagel": _bagel,
    "dreamid-omni": _dreamid_omni,
    "omnigen2": _omnigen2,
    "ltx2": _ltx2("LTX2Pipeline"),
    "ltx2-i2v": _ltx2("LTX2ImageToVideoPipeline"),
    "helios": _helios,
    "helios-pyramid": _helios,  # same class in the reference registry
    "ovis-image": _flux_like("OvisImagePipeline"),
    "longcat-image": _flux_like("LongCatImagePipeline"),
    "longcat-image-edit": _flux_like("LongCatImageEditPipeline"),
    "sd3": _sd3,
    "sd3.5": _sd3,  # dual-attention layers + qk_norm come from arch
    "nextstep-1.1": _nextstep,
    "hunyuan-image-3": _hunyuan_image3,
    "mammoth-moda2": _mammoth_moda2,
}


def create_pipeline(config: OmniDiffusionConfig, parallel=None) -> Any:
    """Build the family's pipeline; ``parallel`` is the
    DiffusionParallelContext built by DiffusionEngine from
    OmniDiffusionConfig.parallel (diffusion/parallel.py) — supporting
    families shard their weights over it and run every denoise step
    in-mesh."""
    family = getattr(config, "family", "generic") or "generic"
    try:
        factory = PIPELINE_FAMILIES[family]
    except KeyError:
        raise ValueError(
            f"unknown diffusion family {family!r}; known: "
            f"{sorted(PIPELINE_FAMILIES)}"
        ) from None
    if parallel is not None:
        if family not in _PARALLEL_FAMILIES:
            raise ValueError(
                f"diffusion family {family!r} does not support parallel "
                f"execution yet (supported: {sorted(_PARALLEL_FAMILIES)});"
                " set parallel sizes to 1"
            )
        return factory(config, parallel=parallel)
    return factory(config)
