"""Two-stage pipeline e2e on CPU: tiny AR stage -> generation stage.

Mirrors the reference's thinker->code2wav topology (qwen3_tts
pipeline.yaml) with toy models: stage 0 decodes tokens, stage 1 turns the
token sequence into a deterministic "audio" array.
"""

import numpy as np

import jax

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.config.stage_config import (
    PipelineConfig,
    StageConfig,
    load_pipeline_config,
)
from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _toy_audio_model(token_ids, prompt_embeds, info, state):
    toks = np.asarray(token_ids or [], dtype=np.float32)
    return {
        "audio": np.repeat(toks, 4) / 100.0,
        "sample_rate": np.asarray(24000),
    }


def _mk_ar_engine():
    cfg = ModelArchConfig(
        model_type="qwen2",
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        tie_word_embeddings=True,
        eos_token_id=1,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(3))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=params,
    )


def _mk_pipeline():
    stage0 = StageConfig(
        stage_id=0,
        model_stage="talker",
        worker_type="ar",
        is_comprehension=True,
        default_sampling_params={"temperature": 0.0, "max_tokens": 6},
    )
    stage1 = StageConfig(
        stage_id=1,
        model_stage="toy_audio",
        worker_type="generation",
        input_sources=[0],
        final_output=True,
        final_output_type="audio",
    )
    pipeline = PipelineConfig(model_type="toy_tts", stages=[stage0, stage1])
    pipeline.validate()
    handles = [
        StageHandle(stage0, _mk_ar_engine()),
        StageHandle(stage1, GenerationEngine(_toy_audio_model)),
    ]
    return pipeline, handles


def test_two_stage_pipeline_end_to_end():
    pipeline, handles = _mk_pipeline()
    omni = Omni(pipeline=pipeline, stages=handles)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    outs = omni.generate([[5, 9, 12], [30, 31]], sp)
    assert len(outs) == 2
    for out in outs:
        assert out.finished and out.final_output
        audio = out.consolidated_multimodal("audio")
        assert audio is not None and audio.shape == (24,)  # 6 tokens * 4
        assert out.multimodal_output["sample_rate"] == 24000

    # the audio is a deterministic function of stage-0 tokens; check
    # against running stage 0 alone
    solo_pipeline, solo_handles = _mk_pipeline()
    solo = solo_handles[0].engine.generate(
        [[5, 9, 12]],
        SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True,
                       return_hidden_states=True),
    )[0]
    want = np.repeat(
        np.asarray(solo.outputs[0].token_ids, np.float32), 4
    ) / 100.0
    np.testing.assert_allclose(
        outs[0].consolidated_multimodal("audio"), want
    )


def test_offline_streaming_generator():
    """Omni.generate(py_generator=True) streams final-stage outputs as
    they are produced (reference omni.py:61,144-172) instead of waiting
    for the whole batch."""
    pipeline, handles = _mk_pipeline()
    omni = Omni(pipeline=pipeline, stages=handles)
    sp = SamplingParams(temperature=0.0, max_tokens=6, ignore_eos=True)
    gen = omni.generate([[5, 9, 12], [30, 31]], sp, py_generator=True)
    import types

    assert isinstance(gen, types.GeneratorType)
    finals = {}
    for out in gen:
        assert out.final_output
        if out.finished:
            finals[out.request_id] = out
    assert len(finals) == 2
    for out in finals.values():
        audio = out.consolidated_multimodal("audio")
        assert audio is not None and audio.shape == (24,)


def test_pipeline_error_propagates():
    def broken_model(token_ids, prompt_embeds, info, state):
        raise RuntimeError("vocoder exploded")

    pipeline, handles = _mk_pipeline()
    handles[1] = StageHandle(handles[1].config, GenerationEngine(broken_model))
    omni = Omni(pipeline=pipeline, stages=handles)
    out = omni.generate(
        [[5, 9]], SamplingParams(temperature=0.0, max_tokens=3,
                                 ignore_eos=True)
    )[0]
    assert out.error is not None and "vocoder exploded" in out.error
    assert out.finished


def test_pipeline_yaml_roundtrip(tmp_path):
    yaml_text = """
model_type: toy_tts
async_chunk: true
stages:
  - stage_id: 0
    model_stage: talker
    stage_type: llm
    worker_type: ar
    is_comprehension: true
    input_sources: []
    engine_args:
      max_num_seqs: 4
      max_model_len: 256
    default_sampling_params:
      temperature: 0.9
      top_k: 50
      stop_token_ids: [2150]
    output_connectors:
      to_stage_1: shm
  - stage_id: 1
    model_stage: code2wav
    stage_type: llm
    worker_type: generation
    input_sources: [0]
    final_output: true
    final_output_type: audio
connectors:
  shm:
    name: SharedMemoryConnector
    extra:
      codec_chunk_frames: 25
edges:
  - from: 0
    to: 1
    window_size: 25
    connector: shm
"""
    p = tmp_path / "pipeline.yaml"
    p.write_text(yaml_text)
    cfg = load_pipeline_config(str(p))
    assert cfg.model_type == "toy_tts" and cfg.async_chunk
    assert cfg.stage(1).final_output_type == "audio"
    assert cfg.downstream_of(0) == [1]
    assert cfg.edge(0, 1).window_size == 25
    assert cfg.connectors["shm"].name == "SharedMemoryConnector"
    assert cfg.stage(0).extra == {}
    assert cfg.stage(0).default_sampling_params["stop_token_ids"] == [2150]
