from ht_vllm_omni_tpu.diffusion.models.wan_video.config import (
    WanVideoArchConfig,
    WanVideoVAEConfig,
)
from ht_vllm_omni_tpu.diffusion.models.wan_video.pipeline import (
    WanVideoPipeline,
)

__all__ = ["WanVideoArchConfig", "WanVideoVAEConfig", "WanVideoPipeline"]
