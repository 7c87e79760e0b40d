"""LTX2 family (joint audio-video DiT), reference
vllm_omni/diffusion/models/ltx2/."""

from ht_vllm_omni_tpu.diffusion.models.ltx2.pipeline import (  # noqa
    LTX2ImageToVideoPipeline,
    LTX2Pipeline,
)
