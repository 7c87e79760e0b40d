"""Offline TTS through the bundled qwen3_tts pipeline (async-chunked
talker -> code2wav), writing a WAV file.

Usage: python examples/offline_tts.py out.wav
"""

import os
import sys as _sys

_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import sys
import wave

import numpy as np

from ht_vllm_omni_tpu.config.stage_config import (
    builtin_pipeline_path,
    load_pipeline_config,
)
from ht_vllm_omni_tpu.engine.stage_factory import build_stages
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "out.wav"
    cfg = load_pipeline_config(builtin_pipeline_path("qwen3_tts"))
    # no checkpoint on this host: shrink the talker to a random-init toy
    cfg.stage(0).engine_args["model_arch_config"] = dict(
        model_type="qwen3", vocab_size=4096, hidden_size=256,
        intermediate_size=512, num_hidden_layers=4, num_attention_heads=8,
        num_key_value_heads=4, head_dim=32, dtype="float32", qk_norm=True,
        attention_bias=False, tie_word_embeddings=True, eos_token_id=1,
    )
    cfg.stage(0).engine_args["num_pages"] = 128
    cfg.stage(0).default_sampling_params["max_tokens"] = 200
    max_tokens = 200
    if os.environ.get("HT_OMNI_EXAMPLE_TINY"):  # example tests / smoke
        cfg.stage(0).engine_args["model_arch_config"].update(
            vocab_size=512, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, head_dim=8,
        )
        max_tokens = 24
    omni = Omni(pipeline=cfg, stages=build_stages(cfg))
    out = omni.generate(
        [[10, 42, 99]],
        SamplingParams(temperature=0.9, top_k=50,
                       max_tokens=max_tokens, ignore_eos=True, seed=0,
                       return_hidden_states=True),
    )[0]
    audio = out.consolidated_multimodal("audio")
    sr = int(out.multimodal_output["sample_rate"])
    with wave.open(out_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(
            (np.clip(audio, -1, 1) * 32767).astype("<i2").tobytes()
        )
    print(f"wrote {out_path}: {len(audio)/sr:.2f}s at {sr} Hz")


if __name__ == "__main__":
    main()
