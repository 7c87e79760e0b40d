"""min_p + OpenAI presence/frequency penalties (sample/sampler.py,
decode-scan wiring in worker/model_runner.py)."""

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
from ht_vllm_omni_tpu.models import qwen2
from ht_vllm_omni_tpu.sample.sampler import (
    SamplingTensors,
    sample_tokens,
)
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def test_min_p_filters_tail():
    v = 128
    # token 5 dominant; token 9 has ~0.24x its prob; the rest tiny
    logits = jnp.full((1, v), -20.0)
    logits = logits.at[0, 5].set(5.0).at[0, 9].set(5.0 + np.log(0.24))
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1, dtype=jnp.uint32))
    st = SamplingTensors.from_params(
        [SamplingParams(temperature=1.0, min_p=0.5, seed=0)], 1
    )
    toks = set()
    k = keys
    for i in range(64):
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        toks.add(int(np.asarray(sample_tokens(logits, st, k))[0]))
    assert toks == {5}  # 0.24 < min_p 0.5 relative floor -> filtered

    st2 = SamplingTensors.from_params(
        [SamplingParams(temperature=1.0, min_p=0.1, seed=0)], 1
    )
    toks2 = set()
    for i in range(64):
        k = jax.vmap(lambda kk: jax.random.fold_in(kk, i))(keys)
        toks2.add(int(np.asarray(sample_tokens(logits, st2, k))[0]))
    assert toks2 == {5, 9}  # 0.24 >= 0.1 floor -> both survive


def _engine(params):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=dict(params),
    )


def _params():
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=128, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    return qwen2.init_params(cfg, jax.random.PRNGKey(11))


def test_presence_penalty_forces_variety():
    params = _params()
    eng = _engine(params)
    # +50 bias makes 42 the greedy pick every step; presence 100 bans a
    # token once generated -> 42 appears exactly once up front
    sp = SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        logit_bias={42: 50.0}, presence_penalty=100.0,
    )
    toks = eng.generate([[2, 5, 9]], sp)[0].outputs[0].token_ids
    assert toks[0] == 42
    assert toks.count(42) == 1
    assert len(set(toks)) == len(toks)  # presence bans every repeat


def test_frequency_penalty_counts():
    params = _params()
    eng = _engine(params)
    # +50 bias dominates; frequency 20/occurrence lets 42 repeat twice
    # (50 - 2*20 = 10 still > other logits) but not a fourth time once
    # counts reach 3 -> mixture with early repeats then variety
    sp = SamplingParams(
        temperature=0.0, max_tokens=8, ignore_eos=True,
        logit_bias={42: 50.0}, frequency_penalty=18.0,
    )
    toks = eng.generate([[2, 5, 9]], sp)[0].outputs[0].token_ids
    assert toks[0] == 42
    n42 = toks.count(42)
    assert 1 <= n42 <= 3  # decays with count instead of a hard ban
    assert len(toks) == 8
