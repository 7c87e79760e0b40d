"""Flux-architecture image families that differ in activations and
conditioning plumbing: Ovis-Image and LongCat-Image (reference
vllm_omni/diffusion/models/ovis_image/, longcat_image/)."""

from ht_vllm_omni_tpu.diffusion.models.flux_like.pipeline import (  # noqa
    LongCatImageEditPipeline,
    LongCatImagePipeline,
    OvisImagePipeline,
)
