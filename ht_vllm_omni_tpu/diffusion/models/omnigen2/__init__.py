"""OmniGen2 family (Lumina2-style editing/generation DiT), reference
vllm_omni/diffusion/models/omnigen2/."""

from ht_vllm_omni_tpu.diffusion.models.omnigen2.pipeline import (  # noqa
    OmniGen2Pipeline,
)
