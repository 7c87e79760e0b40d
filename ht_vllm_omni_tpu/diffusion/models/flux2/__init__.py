"""Flux2 family (global-modulation dual/single-stream DiT), reference
vllm_omni/diffusion/models/flux2/ and flux2_klein/."""

from ht_vllm_omni_tpu.diffusion.models.flux2.pipeline import (  # noqa
    Flux2KleinPipeline,
    Flux2Pipeline,
)
