"""HunyuanImage-3 family (unified AR-MoE text+image trunk),
reference vllm_omni/diffusion/models/hunyuan_image_3/."""

from ht_vllm_omni_tpu.diffusion.models.hunyuan_image3.pipeline import (  # noqa
    HunyuanImage3Pipeline,
)
