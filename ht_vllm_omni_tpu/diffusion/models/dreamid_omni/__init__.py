"""DreamID-Omni family (fused audio-video Wan trunks), reference
vllm_omni/diffusion/models/dreamid_omni/."""

from ht_vllm_omni_tpu.diffusion.models.dreamid_omni.pipeline import (  # noqa
    DreamIDOmniPipeline,
)
