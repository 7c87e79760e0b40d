from ht_vllm_omni_tpu.diffusion.models.sd3.config import SD3ArchConfig
from ht_vllm_omni_tpu.diffusion.models.sd3.pipeline import SD3Pipeline

__all__ = ["SD3ArchConfig", "SD3Pipeline"]
