"""NextStep-1.1 family (continuous-token AR image generation),
reference vllm_omni/diffusion/models/nextstep_1_1/."""

from ht_vllm_omni_tpu.diffusion.models.nextstep.pipeline import (  # noqa
    NextStep11Pipeline,
)
