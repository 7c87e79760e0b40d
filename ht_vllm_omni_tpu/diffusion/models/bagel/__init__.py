"""Bagel family (Mixture-of-Transformers unified understanding +
generation), reference vllm_omni/diffusion/models/bagel/."""

from ht_vllm_omni_tpu.diffusion.models.bagel.pipeline import (  # noqa
    BagelPipeline,
)
