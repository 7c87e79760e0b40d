"""CFG companion requests for AR pipelines.

Semantics under test (reference _enqueue_cfg_companions
async_omni_engine.py:718, CfgCompanionTracker
entrypoints/cfg_companion_tracker.py:24, receive_multi_kv_cache
kv_transfer_manager.py:488):

- stage 0's prompt_expand_func spawns shadow companion requests;
- companions never surface client outputs and never forward;
- the parent's stage-0 -> stage-1 handoff defers until every companion
  finishes, then carries cfg_kv_request_ids + the per-branch KV payloads
  collected by the downstream stage's cfg_kv_collect_func;
- a companion failure (or timeout) fails the parent;
- companion KV pages are released after extraction (no leaks).
"""

import numpy as np

import jax

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.config.stage_config import PipelineConfig, StageConfig
from ht_vllm_omni_tpu.engine.generation_engine import GenerationEngine
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.engine.orchestrator import StageHandle
from ht_vllm_omni_tpu.entrypoints.omni import Omni
from ht_vllm_omni_tpu.inputs import ExpandedPrompt, OmniPrompt
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.models.stage_input_processors import register
from ht_vllm_omni_tpu.sampling_params import SamplingParams

NEG_PROMPT = [7, 8, 9, 10]
GUIDANCE = 0.5
SEEN_INFO: list[dict] = []


@register("test_cfg_expand")
def _expand(prompt: OmniPrompt, params) -> list[ExpandedPrompt]:
    return [
        ExpandedPrompt(
            prompt=OmniPrompt(token_ids=list(NEG_PROMPT)),
            request_id_suffix="_cfg_neg",
            role="negative",
        )
    ]


def _combine_model(token_ids, prompt_embeds, info, state):
    """Deterministic CFG combine: cond + s*(cond - uncond) over the two
    branches' decoded token streams."""
    cond = np.asarray(token_ids or [], np.float32)
    neg = info["cfg_kv"]["negative"]
    uncond = np.asarray(neg.extra["token_ids"], np.float32)
    n = min(len(cond), len(uncond))
    combined = cond[:n] + GUIDANCE * (cond[:n] - uncond[:n])
    SEEN_INFO.append(info)
    return {"audio": combined}


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


def _mk_pipeline(gen_model=_combine_model):
    stage0 = StageConfig(
        stage_id=0,
        model_stage="ar",
        worker_type="ar",
        custom_prompt_expand_func="test_cfg_expand",
        default_sampling_params={
            "temperature": 0.0, "max_tokens": 5, "ignore_eos": True,
        },
    )
    stage1 = StageConfig(
        stage_id=1,
        model_stage="combine",
        worker_type="generation",
        input_sources=[0],
        final_output=True,
        final_output_type="audio",
        custom_cfg_kv_collect_func="default_cfg_kv_collect",
    )
    pipeline = PipelineConfig(
        model_type="toy_cfg", stages=[stage0, stage1]
    )
    pipeline.validate()
    ar = _mk_ar_engine()
    handles = [
        StageHandle(stage0, ar),
        StageHandle(stage1, GenerationEngine(gen_model)),
    ]
    return pipeline, handles


def _solo_decode(prompt, max_tokens=5):
    eng = _mk_ar_engine()
    out = eng.generate(
        [prompt],
        SamplingParams(temperature=0.0, max_tokens=max_tokens,
                       ignore_eos=True),
    )[0]
    return list(out.outputs[0].token_ids)


def test_cfg_companion_pair_and_deterministic_combine():
    pipeline, handles = _mk_pipeline()
    omni = Omni(pipeline=pipeline, stages=handles)
    sp = SamplingParams(temperature=0.0, max_tokens=5, ignore_eos=True,
                        return_hidden_states=True)
    outs = omni.generate([[5, 9, 12]], sp)

    # only the parent surfaces to the client
    assert len(outs) == 1
    assert outs[0].error is None
    assert "_cfg_neg" not in outs[0].request_id

    # deterministic combine against the two branches decoded standalone
    cond = np.asarray(_solo_decode([5, 9, 12]), np.float32)
    uncond = np.asarray(_solo_decode(NEG_PROMPT), np.float32)
    n = min(len(cond), len(uncond))
    want = cond[:n] + GUIDANCE * (cond[:n] - uncond[:n])
    got = outs[0].consolidated_multimodal("audio")
    np.testing.assert_allclose(got, want)

    # the downstream stage saw the branch ids and a real KV payload
    assert SEEN_INFO
    info = SEEN_INFO[-1]
    assert set(info["cfg_kv_request_ids"]) == {"negative"}
    payload = info["cfg_kv"]["negative"]
    # [L, T, 2f]: 2 layers, prompt+decoded tokens computed, kv head dim
    assert payload.kv_rows.ndim == 3 and payload.kv_rows.shape[0] == 2
    assert payload.kv_rows.shape[1] >= len(NEG_PROMPT)
    assert payload.extra["token_ids"] == list(uncond.astype(int))

    # companion pages were released after extraction: pool back to full
    ar = handles[0].engine
    assert ar.scheduler.pool.num_free == 64
    # and no companion bookkeeping leaks
    assert not omni.orchestrator._companion_to_parent


def test_cfg_companion_failure_fails_parent():
    pipeline, handles = _mk_pipeline()
    omni = Omni(pipeline=pipeline, stages=handles)

    def boom(engine, rid):
        raise RuntimeError("extract exploded")

    omni.orchestrator._kv_manager.extract = boom
    outs = omni.generate(
        [[5, 9, 12]],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
    )
    assert outs[0].error is not None
    assert "extract exploded" in outs[0].error
    assert outs[0].finished


def test_cfg_companion_timeout_fails_parent():
    pipeline, handles = _mk_pipeline()
    omni = Omni(pipeline=pipeline, stages=handles)
    orch = omni.orchestrator
    orch._cfg_timeout = -1.0  # any deferred parent times out immediately
    # companion completions are dropped, so the parent stays deferred
    orch._route_companion = lambda *a, **k: None
    outs = omni.generate(
        [[5, 9, 12]],
        SamplingParams(temperature=0.0, max_tokens=4, ignore_eos=True),
    )
    assert outs[0].error is not None and "timed out" in outs[0].error
