"""HunyuanVideo 1.5 family (dual-stream video MMDiT), reference
vllm_omni/diffusion/models/hunyuan_video/."""

from ht_vllm_omni_tpu.diffusion.models.hunyuan_video.pipeline import (  # noqa
    HunyuanVideoI2VPipeline,
    HunyuanVideoPipeline,
)
