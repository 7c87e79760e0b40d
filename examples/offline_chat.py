"""Offline text generation with the AR engine.

Usage: python examples/offline_chat.py /path/to/hf-checkpoint "prompt"
(without a checkpoint it runs a random-weight Qwen2.5-0.5B shape).
"""

import os
import sys as _sys

_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import sys

from ht_vllm_omni_tpu.config import EngineConfig, ModelArchConfig
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else None
    prompt = sys.argv[2] if len(sys.argv) > 2 else "Hello!"
    if os.environ.get("HT_OMNI_EXAMPLE_TINY"):  # example tests / smoke
        arch = ModelArchConfig(
            vocab_size=1024, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, dtype="float32",
            tie_word_embeddings=True,
        )
    else:
        arch = ModelArchConfig()
    engine = LLMEngine(EngineConfig(model=arch, model_path=path))
    if engine.tokenizer is None:
        prompt = [ord(c) % 1000 for c in prompt]
    out = engine.generate(
        [prompt], SamplingParams(max_tokens=64, temperature=0.7, seed=0)
    )[0]
    print(out.outputs[0].text or out.outputs[0].token_ids)


if __name__ == "__main__":
    main()
