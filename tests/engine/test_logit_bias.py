"""OpenAI logit_bias end-to-end: sampler unit behavior + engine-level
forcing/banning under greedy decode (sample/sampler.py apply_logit_bias,
reference parity: vLLM SamplingParams.logit_bias)."""

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
    apply_logit_bias,
    sample_tokens,
)
from ht_vllm_omni_tpu.sampling_params import SamplingParams


def test_apply_logit_bias_scatter():
    logits = jnp.zeros((2, 10), jnp.float32)
    ids = jnp.array([[3, 1 << 30], [7, 2]], jnp.int32)
    vals = jnp.array([[5.0, 99.0], [-4.0, 1.5]], jnp.float32)
    out = np.asarray(apply_logit_bias(logits, ids, vals))
    assert out[0, 3] == 5.0 and out[0].sum() == 5.0  # padding dropped
    assert out[1, 7] == -4.0 and out[1, 2] == 1.5


def test_sample_tokens_respects_bias():
    v = 128
    logits = jnp.zeros((1, v), jnp.float32).at[0, 10].set(3.0)
    keys = jax.vmap(jax.random.PRNGKey)(jnp.arange(1, dtype=jnp.uint32))
    st = SamplingTensors.from_params(
        [SamplingParams(temperature=0.0, logit_bias={33: 100.0})], 1
    )
    assert st.bias_ids is not None
    tok = np.asarray(sample_tokens(logits, st, keys))[0]
    assert tok == 33  # +100 beats the natural argmax at 10
    st2 = SamplingTensors.from_params(
        [SamplingParams(temperature=0.0, logit_bias={10: -100.0})], 1
    )
    tok2 = np.asarray(sample_tokens(logits, st2, keys))[0]
    assert tok2 != 10  # banned


def _mk_engine(params):
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True, eos_token_id=-1,
    )
    return LLMEngine(
        EngineConfig(
            model=cfg,
            cache=CacheConfig(page_size=16, num_pages=64),
            scheduler=SchedulerConfig(max_num_seqs=4, max_model_len=128),
        ),
        params=dict(params),
    )


def test_engine_logit_bias_forces_token():
    cfg = ModelArchConfig(
        model_type="qwen2", vocab_size=64, hidden_size=32,
        intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2,
        dtype="float32", tie_word_embeddings=True,
    )
    params = qwen2.init_params(cfg, jax.random.PRNGKey(11))
    eng = _mk_engine(params)
    sp = SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        logit_bias={42: 100.0},
    )
    out = eng.generate([[2, 5, 9]], sp)[0]
    # +100 dominates every step's logits, including the prefill-sampled
    # first token
    assert out.outputs[0].token_ids == [42] * 6

    # and banning 42 while forcing nothing: 42 must never appear
    sp2 = SamplingParams(
        temperature=0.0, max_tokens=6, ignore_eos=True,
        logit_bias={i: 100.0 for i in (13,)},
    )
    out2 = eng.generate([[2, 5, 9]], sp2)[0]
    assert out2.outputs[0].token_ids == [13] * 6
