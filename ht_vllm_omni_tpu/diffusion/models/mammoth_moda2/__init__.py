"""MammothModa2 family (AR-conditioned Lumina2-style DiT),
reference vllm_omni/diffusion/models/mammoth_moda2/."""

from ht_vllm_omni_tpu.diffusion.models.mammoth_moda2.pipeline import (  # noqa
    MammothModa2DiTPipeline,
)
