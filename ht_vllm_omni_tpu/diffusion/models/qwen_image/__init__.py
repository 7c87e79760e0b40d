from ht_vllm_omni_tpu.diffusion.models.qwen_image.config import (
    QwenImageArchConfig,
    QwenImageVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.qwen_image.pipeline import (
    QwenImagePipeline,
)

__all__ = [
    "QwenImageArchConfig",
    "QwenImageVAEConfig",
    "QwenImagePipeline",
]
