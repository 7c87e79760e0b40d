"""GLM-Image family (AR-prior-conditioned DiT), reference
vllm_omni/diffusion/models/glm_image/."""

from ht_vllm_omni_tpu.diffusion.models.glm_image.pipeline import (  # noqa
    GlmImagePipeline,
)
