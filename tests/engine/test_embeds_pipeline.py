"""Thinker->talker style pipeline: stage 1 consumes stage 0's hidden
states as prompt embeds (the reference's latent handoff,
engine_output_type=latent)."""

import numpy as np

import jax

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.config.stage_config import PipelineConfig, StageConfig
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.inputs import OmniPrompt
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams

HIDDEN = 32


def _ar_engine(seed):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=HIDDEN,
        intermediate_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, dtype="float32", tie_word_embeddings=True,
        eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(seed))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
        decode_horizon=4,
    )


def test_embeds_prompt_direct():
    eng = _ar_engine(0)
    embeds = np.random.default_rng(0).normal(size=(5, HIDDEN)).astype(
        np.float32
    )
    out = eng.generate(
        [OmniPrompt(embeds=embeds)],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
    )[0]
    assert len(out.outputs[0].token_ids) == 6
    # embeds drive the output: different embeds -> different tokens
    out2 = eng.generate(
        [OmniPrompt(embeds=embeds + 3.0)],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True),
    )[0]
    assert out.outputs[0].token_ids != out2.outputs[0].token_ids


def test_thinker_talker_latent_handoff():
    thinker_cfg = StageConfig(
        stage_id=0, model_stage="thinker", worker_type="ar",
        is_comprehension=True,
        default_sampling_params={"temperature": 0.0, "max_tokens": 5},
    )
    talker_cfg = StageConfig(
        stage_id=1, model_stage="talker", worker_type="ar",
        input_sources=[0], final_output=True, final_output_type="text",
        default_sampling_params={"temperature": 0.0, "max_tokens": 7},
    )
    pipeline = PipelineConfig(
        "toy_omni", [thinker_cfg, talker_cfg]
    )
    pipeline.validate()
    handles = [
        StageHandle(thinker_cfg, _ar_engine(1)),
        StageHandle(talker_cfg, _ar_engine(2)),
    ]
    omni = Omni(pipeline=pipeline, stages=handles)
    out = omni.generate([[4, 9, 2]])[0]
    assert out.finished
    assert len(out.outputs[0].token_ids) == 7  # talker output
    # the talker consumed the thinker's hidden states (stage-1 internal
    # request had embeds) — verified by it having produced tokens at all
    # plus the orchestrator stats showing both stages ran
    stats = omni.orchestrator.stats.finished[-1]
    assert set(stats.stages) == {0, 1}
