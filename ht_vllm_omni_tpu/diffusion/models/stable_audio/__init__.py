"""Stable Audio Open family (1-D latent DiT + Oobleck decoder),
reference vllm_omni/diffusion/models/stable_audio/."""

from ht_vllm_omni_tpu.diffusion.models.stable_audio.pipeline import (  # noqa
    StableAudioPipeline,
)
