"""Repetition penalty: HF semantics (prompt AND generated tokens
penalized; positive logits divide, negative multiply) applied inside
the device decode scan — SamplingParams.repetition_penalty was
previously declared but unwired."""

import jax
import jax.numpy as jnp
import numpy as np
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
from ht_vllm_omni_tpu.sample.sampler import apply_repetition_penalty
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def test_apply_matches_hf_rule():
    logits = jnp.asarray([[2.0, -2.0, 1.0, -1.0]])
    seen = jnp.asarray([[True, True, False, False]])
    pen = jnp.asarray([2.0])
    out = np.asarray(apply_repetition_penalty(logits, seen, pen))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0, -1.0])
    # penalty 1.0 is the identity even with stale seen bits
    out = np.asarray(
        apply_repetition_penalty(logits, seen, jnp.asarray([1.0]))
    )
    np.testing.assert_allclose(out[0], np.asarray(logits)[0])


def _cfg():
    return ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, dtype="float32",
        tie_word_embeddings=True, eos_token_id=1,
    )


def _engine(params, parallel=None):
    return LLMEngine(
        EngineConfig(
            model=_cfg(),
            cache=CacheConfig(page_size=16, num_pages=16),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
            parallel=parallel or ParallelConfig(),
        ),
        params=dict(params),
        decode_horizon=5,
    )


def test_penalty_suppresses_repetition_loops():
    """Greedy decode on a tiny random model degenerates into a token
    loop; a strong penalty must break it (more unique tokens), and a
    second unpenalized request in the same batch must be unaffected."""
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp0 = SamplingParams(temperature=0.0, max_tokens=24, ignore_eos=True)
    base = _engine(params).generate([[2, 3, 4], [9, 8, 7]], sp0)

    eng = _engine(params)
    sp_pen = SamplingParams(
        temperature=0.0, max_tokens=24, ignore_eos=True,
        repetition_penalty=1.8,
    )
    rid_a = eng.add_request([2, 3, 4], sp_pen)
    rid_b = eng.add_request([9, 8, 7], sp0)
    outs = {}
    while eng.has_unfinished_requests():
        for o in eng.step():
            if o.finished:
                outs[o.request_id] = o.outputs[0].token_ids
    uniq_base = len(set(base[0].outputs[0].token_ids))
    uniq_pen = len(set(outs[rid_a]))
    assert uniq_pen > uniq_base, (outs[rid_a], base[0].outputs[0].token_ids)
    # slot isolation: the unpenalized neighbor decodes exactly as before
    assert outs[rid_b] == base[1].outputs[0].token_ids


def test_penalty_under_pipeline_parallelism():
    assert len(jax.devices()) >= 2
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    sp = SamplingParams(
        temperature=0.0, max_tokens=16, ignore_eos=True,
        repetition_penalty=1.8,
    )
    ref = _engine(params).generate([[2, 3, 4]], sp)
    got = _engine(
        params, ParallelConfig(pipeline_parallel_size=2)
    ).generate([[2, 3, 4]], sp)
    assert (
        ref[0].outputs[0].token_ids == got[0].outputs[0].token_ids
    )


def test_slot_reuse_clears_penalty():
    """A freed slot's seen mask must not leak into the next request."""
    params = qwen2.init_params(_cfg(), jax.random.PRNGKey(5))
    eng = _engine(params)
    sp_pen = SamplingParams(
        temperature=0.0, max_tokens=12, ignore_eos=True,
        repetition_penalty=1.8,
    )
    sp0 = SamplingParams(temperature=0.0, max_tokens=12, ignore_eos=True)
    eng.generate([[2, 3, 4]], sp_pen)
    after = eng.generate([[2, 3, 4]], sp0)
    fresh = _engine(params).generate([[2, 3, 4]], sp0)
    assert (
        after[0].outputs[0].token_ids == fresh[0].outputs[0].token_ids
    )
