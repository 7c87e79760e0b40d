"""Image placeholders: expansion, embed overlay, M-RoPE through the engine."""

import numpy as np

import jax

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.inputs import OmniPrompt
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.models.input_processing import (
    process_multimodal_prompt,
)
from ht_vllm_omni_tpu.sampling_params import SamplingParams

IMG = 60


def _cfg():
    return ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1, image_token_id=IMG, mrope_sections=(2, 1, 1),
    )


def test_placeholder_expansion_and_grids():
    image = np.random.default_rng(0).integers(
        0, 255, size=(56, 84, 3)
    ).astype(np.uint8)  # 2x3 patches of 28
    p = OmniPrompt(
        token_ids=[1, 2, IMG, 3],
        multi_modal_data={"image": [image]},
    )
    out = process_multimodal_prompt(p, _cfg())
    assert len(out.token_ids) == 3 + 6  # placeholder -> 6 patch tokens
    info = out.additional_information
    assert info["mrope_positions"].shape == (3, 9)
    (start, emb), = info["mm_embeds"]
    assert start == 2 and emb.shape == (6, 32)


def test_engine_generates_with_image():
    cfg = _cfg()
    params = qwen2.init_params(cfg, jax.random.PRNGKey(47))
    engine = LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=2, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )
    img_a = np.zeros((56, 56, 3), np.uint8)  # black
    img_b = np.full((56, 56, 3), 255, np.uint8)  # white
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)

    out_a = engine.generate(
        [OmniPrompt(token_ids=[1, IMG, 3],
                    multi_modal_data={"image": [img_a]})], sp
    )[0]
    out_b = engine.generate(
        [OmniPrompt(token_ids=[1, IMG, 3],
                    multi_modal_data={"image": [img_b]})], sp
    )[0]
    assert len(out_a.outputs[0].token_ids) == 8
    # the image content flows through the overlay: different image ->
    # different generation
    assert out_a.outputs[0].token_ids != out_b.outputs[0].token_ids
