"""Z-Image family (Lumina-style single-stream DiT), reference
vllm_omni/diffusion/models/z_image/."""

from ht_vllm_omni_tpu.diffusion.models.z_image.pipeline import (  # noqa
    ZImagePipeline,
)
