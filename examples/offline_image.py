"""Offline image generation with the DiT engine (random-init toy DiT)."""

import os
import sys as _sys

_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ht_vllm_omni_tpu.diffusion.data import (
    DiffusionSamplingParams,
    DiTArchConfig,
    OmniDiffusionConfig,
)
from ht_vllm_omni_tpu.diffusion.diffusion_engine import DiffusionEngine
from ht_vllm_omni_tpu.inputs import OmniPrompt


def main():
    engine = DiffusionEngine(
        OmniDiffusionConfig(arch=DiTArchConfig(dtype="float32")),
        default_params=DiffusionSamplingParams(
            height=64, width=64, num_inference_steps=10, seed=0
        ),
    )
    engine.add_request(OmniPrompt(text="a sunset over the sea"))
    out = engine.step()[0]
    image = out.multimodal_output["image"]
    print("image:", image.shape, image.dtype)


if __name__ == "__main__":
    main()
