"""Helios family (Wan-extended chunked video with multi-term memory),
reference vllm_omni/diffusion/models/helios/."""

from ht_vllm_omni_tpu.diffusion.models.helios.pipeline import (  # noqa
    HeliosPipeline,
)
