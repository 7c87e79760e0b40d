from ht_vllm_omni_tpu.diffusion.models.flux.config import FluxArchConfig
from ht_vllm_omni_tpu.diffusion.models.flux.pipeline import FluxPipeline

__all__ = ["FluxArchConfig", "FluxPipeline"]
