"""Pipeline parallelism: layers shard over the pp mesh axis and
activations ride a ring ppermute with a rotating-microbatch decode
schedule (worker/pp_programs.py).  Greedy generation must match the
single-device engine exactly — including across microbatch boundaries,
early stops, and multi-chunk decode."""

import jax
import pytest

from ht_vllm_omni_tpu.config import (
    CacheConfig,
    EngineConfig,
    ModelArchConfig,
    ParallelConfig,
    SchedulerConfig,
)
from ht_vllm_omni_tpu.engine.llm_engine import LLMEngine
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def _cfg(layers=4):
    return ModelArchConfig(
        model_type="qwen2",
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=layers,
        num_attention_heads=4,
        num_key_value_heads=2,
        dtype="float32",
        tie_word_embeddings=True,
        eos_token_id=1,
    )


def _engine(pp=1, tp=1, dp=1, weight_sharding="replicated", seqs=4):
    cfg = _cfg()
    params = qwen2.init_params(cfg, jax.random.PRNGKey(7))
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=16),
            scheduler=SchedulerConfig(max_num_seqs=seqs, max_model_len=128),
            parallel=ParallelConfig(
                pipeline_parallel_size=pp,
                tensor_parallel_size=tp,
                data_parallel_size=dp,
                weight_sharding=weight_sharding,
            ),
        ),
        params=params,
        decode_horizon=6,
    )


PROMPTS = [[2, 3, 4], [9, 8, 7, 6, 5], [5, 4, 3], [7, 7, 8, 9]]


def test_pp_matches_single_device():
    assert len(jax.devices()) >= 2
    sp = SamplingParams(temperature=0.0, max_tokens=14, ignore_eos=True)
    ref = _engine().generate(PROMPTS, sp)
    got = _engine(pp=2).generate(PROMPTS, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids


def test_pp_early_stop_matches():
    """Per-request stop tokens end sequences at different steps across
    microbatches."""
    sp = SamplingParams(temperature=0.0, max_tokens=14)
    ref = _engine().generate(PROMPTS, sp)
    got = _engine(pp=2).generate(PROMPTS, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids
        assert r.outputs[0].finish_reason == g.outputs[0].finish_reason


def test_pp_x_tp_x_dp_matches():
    assert len(jax.devices()) >= 8
    sp = SamplingParams(temperature=0.0, max_tokens=10, ignore_eos=True)
    ref = _engine().generate(PROMPTS, sp)
    got = _engine(pp=2, tp=2, dp=2, weight_sharding="fsdp").generate(
        PROMPTS, sp
    )
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids

    # params are layer-sharded over pp: wq local shard = [L/pp, H/dp, F/tp]
    eng = _engine(pp=2, tp=2, dp=2, weight_sharding="fsdp")
    wq = eng.runner.params["wq"]
    assert wq.sharding.shard_shape(wq.shape) == (
        wq.shape[0] // 2, wq.shape[1] // 2, wq.shape[2] // 2
    )


def test_pp_hidden_states_match():
    """return_hidden_states under pp>1: hidden rows live only on the
    last pp stage and are gathered/broadcast per decode round
    (pp_programs.decode_program_pp) — thinker->talker pipelines depend
    on this path."""
    import numpy as np

    sp = SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True,
        return_hidden_states=True,
    )
    ref = _engine().generate(PROMPTS, sp)
    got = _engine(pp=2).generate(PROMPTS, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids
        assert g.outputs[0].hidden_states is not None
        np.testing.assert_allclose(
            r.outputs[0].hidden_states,
            g.outputs[0].hidden_states,
            rtol=2e-5, atol=2e-5,
        )


def test_pp_logit_bias_and_frequency_match():
    """logit_bias + frequency_penalty under pp>1 (previously fenced):
    extras thread into decode_program_pp and apply on the last stage."""
    sp = SamplingParams(
        temperature=0.0, max_tokens=10, ignore_eos=True,
        logit_bias={17: 40.0}, frequency_penalty=6.0,
    )
    ref = _engine().generate(PROMPTS, sp)
    got = _engine(pp=2).generate(PROMPTS, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids
        assert 17 in g.outputs[0].token_ids  # the bias actually applied


def test_pp_logprobs_match():
    """logprobs under pp>1: the logit stream is collected on the last
    stage and broadcast with the token stream."""
    import numpy as np

    sp = SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True, logprobs=3
    )
    ref = _engine().generate(PROMPTS, sp)
    got = _engine(pp=2).generate(PROMPTS, sp)
    for r, g in zip(ref, got):
        assert r.outputs[0].token_ids == g.outputs[0].token_ids
        rl, gl = r.outputs[0].logprobs, g.outputs[0].logprobs
        assert gl is not None and len(gl) == len(rl)
        for a, b in zip(rl, gl):
            assert abs(a["logprob"] - b["logprob"]) < 1e-4
            assert a["token_id"] == b["token_id"]
            np.testing.assert_allclose(
                a["top_logprobs"], b["top_logprobs"], atol=1e-4
            )


def test_pp_rejects_indivisible_layers():
    cfg = _cfg(layers=3)
    with pytest.raises(ValueError):
        LLMEngine(
            EngineConfig(
                model=cfg,
                cache=CacheConfig(page_size=16, num_pages=16),
                scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=64),
                parallel=ParallelConfig(pipeline_parallel_size=2),
            ),
            params=qwen2.init_params(cfg, jax.random.PRNGKey(0)),
        )
