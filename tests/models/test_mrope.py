"""M-RoPE positions: grid construction, delta, and engine equivalence."""

import numpy as np

import jax
import jax.numpy as jnp

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.inputs import OmniPrompt
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.models.mrope import mrope_cos_sin, mrope_position_ids
from ht_vllm_omni_tpu.models.layers import rope_cos_sin
from ht_vllm_omni_tpu.sampling_params import SamplingParams

IMG = 50


def test_position_ids_text_only():
    pos, delta = mrope_position_ids([1, 2, 3], IMG, [])
    np.testing.assert_array_equal(pos, np.tile(np.arange(3), (3, 1)))
    assert delta == 0


def test_position_ids_with_image_grid():
    # text text [2x2 image = 4 patch tokens] text
    ids = [1, 2, IMG, IMG, IMG, IMG, 3]
    pos, delta = mrope_position_ids(ids, IMG, [(1, 2, 2)])
    # text tokens 0,1; image at temporal pos 2 with h/w walking 2x2
    np.testing.assert_array_equal(pos[0], [0, 1, 2, 2, 2, 2, 4])
    np.testing.assert_array_equal(pos[1], [0, 1, 2, 2, 3, 3, 4])
    np.testing.assert_array_equal(pos[2], [0, 1, 2, 3, 2, 3, 4])
    # next decode position = max+1 => delta = 5 - 7 = -2
    assert delta == -2


def test_mrope_equals_rope_for_uniform_positions():
    pos3 = np.tile(np.arange(8), (3, 1))
    cos_m, sin_m = mrope_cos_sin(
        jnp.asarray(pos3), 16, 10000.0, (2, 3, 3)
    )
    cos_r, sin_r = rope_cos_sin(jnp.arange(8), 16, 10000.0)
    np.testing.assert_allclose(cos_m, cos_r, atol=1e-6)
    np.testing.assert_allclose(sin_m, sin_r, atol=1e-6)


def _engine(mrope):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
        mrope_sections=(2, 1, 1) if mrope else None,  # head_dim 8 -> half 4
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(13))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )


def test_engine_text_only_mrope_matches_standard():
    """Uniform [3,S] positions + delta 0 must reproduce standard RoPE
    generation exactly."""
    prompt = [4, 9, 2, 30]
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    want = _engine(False).generate([prompt], sp)[0].outputs[0].token_ids

    pos, delta = mrope_position_ids(prompt, IMG, [])
    got = _engine(True).generate(
        [OmniPrompt(
            token_ids=prompt,
            additional_information={
                "mrope_positions": pos, "mrope_delta": delta,
            },
        )],
        sp,
    )[0].outputs[0].token_ids
    assert got == want


def test_engine_image_positions_change_output():
    prompt = [1, 2, IMG, IMG, IMG, IMG, 3]
    sp = SamplingParams(temperature=0.0, max_tokens=8, ignore_eos=True)
    pos, delta = mrope_position_ids(prompt, IMG, [(1, 2, 2)])
    with_grid = _engine(True).generate(
        [OmniPrompt(token_ids=prompt, additional_information={
            "mrope_positions": pos, "mrope_delta": delta})],
        sp,
    )[0].outputs[0].token_ids
    flat = _engine(True).generate([prompt], sp)[0].outputs[0].token_ids
    assert with_grid != flat
