"""Offline image generation with a named diffusion family.

Usage: python examples/offline_image_family.py [family] [prompt]
e.g. families: qwen-image, flux, sd3, z-image, glm-image,
hunyuan-image-3, nextstep-1.1, mammoth-moda2 ... (diffusion/registry.py)

Without checkpoints the family runs its released architecture at
random init (tiny shapes under HT_OMNI_EXAMPLE_TINY=1).
"""

import os
import sys as _sys

_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import sys

import numpy as np

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
from ht_vllm_omni_tpu.inputs import OmniPrompt


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "z-image"
    prompt = sys.argv[2] if len(sys.argv) > 2 else "a harbor at dawn"
    cfg = OmniDiffusionConfig()
    cfg.family = family
    tiny = bool(os.environ.get("HT_OMNI_EXAMPLE_TINY"))
    size = 32 if tiny else 512
    steps = 2 if tiny else 20
    engine = DiffusionEngine(
        cfg,
        default_params=DiffusionSamplingParams(
            height=size, width=size, num_inference_steps=steps,
            guidance_scale=3.0, seed=0,
        ),
    )
    engine.add_request(OmniPrompt(text=prompt))
    outs = []
    while engine.has_unfinished_requests():
        outs.extend(engine.step())
    out = outs[-1]
    if out.error:
        raise SystemExit(f"error: {out.error}")
    image = out.multimodal_output.get("image")
    if image is None:  # audio families (stable-audio)
        audio = out.multimodal_output.get("audio")
        print(f"family {family}: audio {np.asarray(audio).shape}")
        return
    print(
        f"family {family}: image {np.asarray(image).shape}, "
        f"durations {out.metrics.get('stage_durations')}"
    )


if __name__ == "__main__":
    main()
